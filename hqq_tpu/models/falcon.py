# SPDX-License-Identifier: Apache-2.0
"""Falcon family (7B multi-query / 40B+180B new-decoder GQA / RW ALiBi).

The reference quantizes Falcon through its generic HF patching (every linear
tagged in `/root/reference/hqq/models/hf/`); here it is a first-class
functional family (≙ HF `modeling_falcon.py`). Three block variants, all
covered:

* `new_decoder_architecture` (40B/180B/Falcon2): fused query_key_value in
  GROUPED layout — nkv groups of (nh/nkv queries, 1 key, 1 value) — with
  TWO parallel LayerNorms (ln_attn / ln_mlp) and a parallel residual
  `x + attn + mlp` (≙ `_split_heads`, modeling_falcon.py:240-249).
* `multi_query` legacy (7B): qkv is [nh q heads | 1 k | 1 v], single
  input_layernorm shared by attention AND mlp (parallel_attn).
* non-parallel (falcon-rw): sequential input/post-attention LayerNorms,
  typically with `alibi=True` — ALiBi slopes replace rotary embeddings
  (per-head linear bias on key positions; softmax row-invariance makes the
  absolute-position form equal to the relative one).

LayerNorm (not RMSNorm) throughout; MLP is dense_h_to_4h -> GELU ->
dense_4h_to_h; embeddings tied by default.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from ..nn.linear import Linear
from . import llama
from .llama import KVCache
from .vit import _layer_norm

__all__ = ["FalconConfig", "forward", "init_cache", "init_params",
           "params_from_hf_state_dict", "alibi_slopes"]


@dataclass(frozen=True)
class FalconConfig:
    vocab_size: int = 65024
    hidden_size: int = 4544
    num_hidden_layers: int = 32
    num_attention_heads: int = 71
    num_kv_heads: Optional[int] = None
    new_decoder_architecture: bool = False
    multi_query: bool = True
    parallel_attn: bool = True
    num_ln_in_parallel_attn: Optional[int] = None
    bias: bool = False
    alibi: bool = False
    rope_theta: float = 10000.0
    layer_norm_epsilon: float = 1e-5
    max_position_embeddings: int = 2048
    tie_word_embeddings: bool = True
    # shared-helper compatibility
    sliding_window: Optional[int] = None
    rope_scaling: Optional[tuple] = None

    @property
    def head_dim_(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def n_kv_(self) -> int:
        """Effective KV heads: groups in new arch, 1 for multi-query, nh
        otherwise (≙ FalconAttention.num_kv_heads, modeling_falcon.py:227)."""
        if self.new_decoder_architecture:
            return self.num_kv_heads or self.num_attention_heads
        return 1 if self.multi_query else self.num_attention_heads

    # llama-helper field names
    @property
    def num_key_value_heads(self) -> int:
        return self.n_kv_

    @property
    def two_ln(self) -> bool:
        n = self.num_ln_in_parallel_attn
        if n is None and self.new_decoder_architecture:
            n = 2
        return n == 2

    @classmethod
    def from_hf(cls, hf: dict) -> "FalconConfig":
        return cls(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            num_kv_heads=hf.get("num_kv_heads"),
            new_decoder_architecture=hf.get("new_decoder_architecture", False),
            multi_query=hf.get("multi_query", True),
            parallel_attn=hf.get("parallel_attn", True),
            num_ln_in_parallel_attn=hf.get("num_ln_in_parallel_attn"),
            bias=hf.get("bias", False),
            alibi=hf.get("alibi", False),
            rope_theta=hf.get("rope_theta", 10000.0),
            layer_norm_epsilon=hf.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=hf.get("max_position_embeddings", 2048),
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256, **kw) -> "FalconConfig":
        return cls(vocab_size=vocab_size, hidden_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   max_position_embeddings=128, **kw)


def alibi_slopes(n_heads: int) -> np.ndarray:
    """ALiBi per-head slopes (≙ HF `build_alibi_tensor`): powers of
    2^(-8/n) for the closest power of two, interleaved extras beyond it."""
    closest = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = base ** np.arange(1, closest + 1)
    if closest != n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        extra = extra_base ** np.arange(1, 2 * (n_heads - closest) + 1, 2)
        slopes = np.concatenate([slopes, extra])
    return slopes.astype(np.float32)


def _split_heads(cfg: FalconConfig, qkv: Array) -> Tuple[Array, Array, Array]:
    """Fused qkv [B, T, ...] -> q [B, nh, T, hd], k/v [B, n_kv, T, hd]
    (≙ FalconAttention._split_heads)."""
    b, t, _ = qkv.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim_
    if cfg.new_decoder_architecture:
        nkv = cfg.n_kv_
        g = nh // nkv
        x = qkv.reshape(b, t, nkv, g + 2, hd)
        q = x[:, :, :, :g].reshape(b, t, nh, hd)
        k, v = x[:, :, :, g], x[:, :, :, g + 1]  # [B, T, nkv, hd]
    elif cfg.multi_query:
        x = qkv.reshape(b, t, nh + 2, hd)
        q, k, v = x[:, :, :nh], x[:, :, nh:nh + 1], x[:, :, nh + 1:]
    else:
        x = qkv.reshape(b, t, nh, 3, hd)
        q, k, v = x[..., 0, :], x[..., 1, :], x[..., 2, :]
    to_bhtd = lambda a: a.transpose(0, 2, 1, 3)  # noqa: E731
    return to_bhtd(q), to_bhtd(k), to_bhtd(v)


def init_cache(cfg: FalconConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    shape = (cfg.num_hidden_layers, batch, cfg.n_kv_, max_len, cfg.head_dim_)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def forward(
    params: dict,
    cfg: FalconConfig,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos: "int | Array" = 0,
) -> Tuple[Array, Optional[KVCache]]:
    b, t = tokens.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim_
    eps = cfg.layer_norm_epsilon
    x = jnp.take(params["word_embeddings"], tokens, axis=0)

    _, cos, sin, mask = llama.positions_and_masks(
        cfg, t, start_pos, None if cache is None else cache.max_len
    )
    if cfg.alibi:
        s_len = t if cache is None else cache.max_len
        # HF quirks matched exactly: slopes round-trip through bfloat16
        # (build_alibi_tensor:162), and the eager path applies the bias
        # TWICE — once integrated into the causal mask (alibi/sqrt(hd),
        # _update_causal_mask, modeling_falcon.py:909-915) and once inside
        # the attention ((scores + alibi) * 1/sqrt(hd), :397-398) — hence
        # the factor 2 (verified numerically: maxdiff 1e-5 vs 1.6e-2)
        slopes = jnp.asarray(alibi_slopes(nh)).astype(jnp.bfloat16).astype(jnp.float32)
        bias = (2.0 * slopes[:, None, None] * jnp.arange(s_len)[None, None, :]
                / math.sqrt(hd))  # [nh, 1, S]
        mask = mask + bias[None]

    k_all = v_all = None
    if cache is not None:
        k_all, v_all = cache.k, cache.v

    for i, layer in enumerate(params["layers"]):
        if cfg.parallel_attn and cfg.two_ln:
            attn_in = _layer_norm(x, layer["ln_attn"], eps)
            mlp_in = _layer_norm(x, layer["ln_mlp"], eps)
        else:
            attn_in = _layer_norm(x, layer["input_layernorm"], eps)
            mlp_in = attn_in  # parallel single-LN (7B); overwritten below

        q, k, v = _split_heads(cfg, layer["self_attn"]["query_key_value"](attn_in))
        if not cfg.alibi:
            q = llama._apply_rope(q, cos, sin)
            k = llama._apply_rope(k, cos, sin)

        if cache is not None:
            k_all, v_all = llama._update_stacked_cache(
                k_all, v_all, i, k, v, start_pos
            )
            keys, vals = k_all[i], v_all[i]
        else:
            keys, vals = k, v
        rep = nh // cfg.n_kv_
        if rep > 1:
            keys = jnp.repeat(keys, rep, axis=1)
            vals = jnp.repeat(vals, rep, axis=1)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, keys,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        probs = jax.nn.softmax((scores + mask).astype(jnp.float32), -1).astype(q.dtype)
        att = jnp.einsum("bhts,bhsd->bhtd", probs, vals)
        attn_out = layer["self_attn"]["dense"](
            att.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
        )

        if cfg.parallel_attn:
            mlp_out = layer["mlp"]["dense_4h_to_h"](
                jax.nn.gelu(layer["mlp"]["dense_h_to_4h"](mlp_in))
            )
            x = x + attn_out + mlp_out
        else:
            x = x + attn_out
            h = _layer_norm(x, layer["post_attention_layernorm"], eps)
            x = x + layer["mlp"]["dense_4h_to_h"](
                jax.nn.gelu(layer["mlp"]["dense_h_to_4h"](h))
            )

    x = _layer_norm(x, params["ln_f"], eps)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.einsum("btd,vd->btv", x, params["word_embeddings"],
                            preferred_element_type=jnp.float32)
    else:
        logits = params["lm_head"](x).astype(jnp.float32)
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def init_params(cfg: FalconConfig, key: Array, dtype=jnp.bfloat16) -> dict:
    d, hd = cfg.hidden_size, cfg.head_dim_
    nh, nkv = cfg.num_attention_heads, cfg.n_kv_
    qkv_out = ((nkv * 2 + nh) * hd if cfg.new_decoder_architecture
               else (nh + 2) * hd if cfg.multi_query else 3 * d)
    keys = iter(jax.random.split(key, 2 + 4 * cfg.num_hidden_layers))

    def lin(o, i):
        w = jax.random.normal(next(keys), (o, i), jnp.float32) / jnp.sqrt(i)
        return Linear(weight=w.astype(dtype),
                      bias=jnp.zeros((o,), dtype) if cfg.bias else None)

    def ln():
        return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layer = {
            "self_attn": {"query_key_value": lin(qkv_out, d), "dense": lin(d, d)},
            "mlp": {"dense_h_to_4h": lin(4 * d, d), "dense_4h_to_h": lin(d, 4 * d)},
        }
        if cfg.parallel_attn and cfg.two_ln:
            layer["ln_attn"], layer["ln_mlp"] = ln(), ln()
        else:
            layer["input_layernorm"] = ln()
            if not cfg.parallel_attn:
                layer["post_attention_layernorm"] = ln()
        layers.append(layer)
    return {
        "word_embeddings": (jax.random.normal(
            next(keys), (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype),
        "layers": layers,
        "ln_f": ln(),
    }


def params_from_hf_state_dict(state: dict, cfg: FalconConfig, dtype=jnp.bfloat16):
    def arr(name):
        x = state[name]
        if hasattr(x, "detach"):
            x = x.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(x), dtype)

    def lin(prefix):
        return Linear(weight=arr(prefix + ".weight"),
                      bias=arr(prefix + ".bias") if prefix + ".bias" in state else None)

    def ln(prefix):
        return {"weight": arr(prefix + ".weight"), "bias": arr(prefix + ".bias")}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.h.{i}"
        layer = {
            "self_attn": {
                "query_key_value": lin(f"{p}.self_attention.query_key_value"),
                "dense": lin(f"{p}.self_attention.dense"),
            },
            "mlp": {
                "dense_h_to_4h": lin(f"{p}.mlp.dense_h_to_4h"),
                "dense_4h_to_h": lin(f"{p}.mlp.dense_4h_to_h"),
            },
        }
        if f"{p}.ln_attn.weight" in state:
            layer["ln_attn"] = ln(f"{p}.ln_attn")
            layer["ln_mlp"] = ln(f"{p}.ln_mlp")
        else:
            layer["input_layernorm"] = ln(f"{p}.input_layernorm")
            if f"{p}.post_attention_layernorm.weight" in state:
                layer["post_attention_layernorm"] = ln(f"{p}.post_attention_layernorm")
        layers.append(layer)
    params = {
        "word_embeddings": arr("transformer.word_embeddings.weight"),
        "layers": layers,
        "ln_f": ln("transformer.ln_f"),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in state:
        params["lm_head"] = lin("lm_head")
    return params
