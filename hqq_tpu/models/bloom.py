# SPDX-License-Identifier: Apache-2.0
"""BLOOM family (bloom-560m .. 176B, bloomz).

The reference quantizes BLOOM through its generic HF patching; here it is a
functional family (≙ HF `modeling_bloom.py`). Architectural deltas vs the
llama walk:

* ALiBi position bias ONLY — no rotary, no learned positions. Bloom's
  eager path computes `alibi + (q@k^T)/sqrt(hd)` (baddbmm with beta=1,
  modeling_bloom.py:286-291) — the bias is NOT scaled by inv_norm_factor
  (unlike Falcon's quirky double-scaled form).
* a LayerNorm directly after the token embedding
  (`word_embeddings_layernorm`),
* fused query_key_value in per-head-interleaved layout [nh, 3, hd],
* sequential pre-LN blocks (input / post-attention LayerNorms) with the
  Megatron tanh-GELU MLP,
* optional `apply_residual_connection_post_layernorm` (bloom-petals
  variants): the residual branch starts from the LN output instead of x.
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
from .falcon import alibi_slopes
from .llama import KVCache
from .vit import _layer_norm

__all__ = ["BloomConfig", "forward", "init_cache", "init_params",
           "params_from_hf_state_dict"]


@dataclass(frozen=True)
class BloomConfig:
    vocab_size: int = 250880
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    layer_norm_epsilon: float = 1e-5
    apply_residual_connection_post_layernorm: bool = False
    tie_word_embeddings: bool = True
    # shared-helper compatibility
    sliding_window: Optional[int] = None
    rope_theta: float = 10000.0
    max_position_embeddings: int = 2048

    @property
    def head_dim_(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_key_value_heads(self) -> int:
        return self.num_attention_heads

    @classmethod
    def from_hf(cls, hf: dict) -> "BloomConfig":
        return cls(
            vocab_size=hf["vocab_size"],
            hidden_size=hf.get("hidden_size", hf.get("n_embed", 1024)),
            num_hidden_layers=hf.get("num_hidden_layers", hf.get("n_layer", 24)),
            num_attention_heads=hf.get("num_attention_heads", hf.get("n_head", 16)),
            layer_norm_epsilon=hf.get("layer_norm_epsilon", 1e-5),
            apply_residual_connection_post_layernorm=hf.get(
                "apply_residual_connection_post_layernorm", False),
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256, **kw) -> "BloomConfig":
        return cls(vocab_size=vocab_size, hidden_size=64, num_hidden_layers=2,
                   num_attention_heads=4, **kw)


def init_cache(cfg: BloomConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    shape = (cfg.num_hidden_layers, batch, cfg.num_attention_heads, max_len,
             cfg.head_dim_)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def forward(
    params: dict,
    cfg: BloomConfig,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos: "int | Array" = 0,
) -> Tuple[Array, Optional[KVCache]]:
    b, t = tokens.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim_
    eps = cfg.layer_norm_epsilon

    _, _, _, mask = llama.positions_and_masks(
        cfg, t, start_pos, None if cache is None else cache.max_len
    )
    s_len = t if cache is None else cache.max_len
    bias = (jnp.asarray(alibi_slopes(nh))[:, None, None]
            * jnp.arange(s_len)[None, None, :])  # [nh, 1, S], unscaled
    mask = mask + bias[None]

    x = jnp.take(params["word_embeddings"], tokens, axis=0)
    x = _layer_norm(x, params["word_embeddings_layernorm"], eps)

    k_all = v_all = None
    if cache is not None:
        k_all, v_all = cache.k, cache.v

    for i, layer in enumerate(params["layers"]):
        h = _layer_norm(x, layer["input_layernorm"], eps)
        resid = h if cfg.apply_residual_connection_post_layernorm else x
        qkv = layer["self_attn"]["query_key_value"](h)
        qkv = qkv.reshape(b, t, nh, 3, hd)
        q = qkv[..., 0, :].transpose(0, 2, 1, 3)
        k = qkv[..., 1, :].transpose(0, 2, 1, 3)
        v = qkv[..., 2, :].transpose(0, 2, 1, 3)
        if cache is not None:
            k_all, v_all = llama._update_stacked_cache(k_all, v_all, i, k, v,
                                                       start_pos)
            keys, vals = k_all[i], v_all[i]
        else:
            keys, vals = k, v
        scores = jnp.einsum("bhtd,bhsd->bhts", q, keys,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        probs = jax.nn.softmax((scores + mask).astype(jnp.float32), -1).astype(q.dtype)
        att = jnp.einsum("bhts,bhsd->bhtd", probs, vals)
        x = resid + layer["self_attn"]["dense"](
            att.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
        )

        h = _layer_norm(x, layer["post_attention_layernorm"], eps)
        resid = h if cfg.apply_residual_connection_post_layernorm else x
        x = resid + layer["mlp"]["dense_4h_to_h"](
            jax.nn.gelu(layer["mlp"]["dense_h_to_4h"](h), approximate=True)
        )

    x = _layer_norm(x, params["ln_f"], eps)
    logits = jnp.einsum("btd,vd->btv", x, params["word_embeddings"],
                        preferred_element_type=jnp.float32)
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def init_params(cfg: BloomConfig, key: Array, dtype=jnp.bfloat16) -> dict:
    d = cfg.hidden_size
    keys = iter(jax.random.split(key, 2 + 4 * cfg.num_hidden_layers))

    def lin(o, i):
        w = jax.random.normal(next(keys), (o, i), jnp.float32) / jnp.sqrt(i)
        return Linear(weight=w.astype(dtype), bias=jnp.zeros((o,), dtype))

    def ln():
        return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    layers = [
        {
            "input_layernorm": ln(),
            "self_attn": {"query_key_value": lin(3 * d, d), "dense": lin(d, d)},
            "post_attention_layernorm": ln(),
            "mlp": {"dense_h_to_4h": lin(4 * d, d), "dense_4h_to_h": lin(d, 4 * d)},
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    return {
        "word_embeddings": (jax.random.normal(
            next(keys), (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype),
        "word_embeddings_layernorm": ln(),
        "layers": layers,
        "ln_f": ln(),
    }


def params_from_hf_state_dict(state: dict, cfg: BloomConfig, dtype=jnp.bfloat16):
    def arr(name):
        x = state[name]
        if hasattr(x, "detach"):
            x = x.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(x), dtype)

    def lin(prefix):
        return Linear(weight=arr(prefix + ".weight"), bias=arr(prefix + ".bias"))

    def ln(prefix):
        return {"weight": arr(prefix + ".weight"), "bias": arr(prefix + ".bias")}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.h.{i}"
        layers.append({
            "input_layernorm": ln(f"{p}.input_layernorm"),
            "self_attn": {
                "query_key_value": lin(f"{p}.self_attention.query_key_value"),
                "dense": lin(f"{p}.self_attention.dense"),
            },
            "post_attention_layernorm": ln(f"{p}.post_attention_layernorm"),
            "mlp": {"dense_h_to_4h": lin(f"{p}.mlp.dense_h_to_4h"),
                    "dense_4h_to_h": lin(f"{p}.mlp.dense_4h_to_h")},
        })
    return {
        "word_embeddings": arr("transformer.word_embeddings.weight"),
        "word_embeddings_layernorm": ln("transformer.word_embeddings_layernorm"),
        "layers": layers,
        "ln_f": ln("transformer.ln_f"),
    }
