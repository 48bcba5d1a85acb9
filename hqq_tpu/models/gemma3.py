# SPDX-License-Identifier: Apache-2.0
"""Gemma-3 (text) family — Gemma-2's block structure with per-head q/k
RMSNorm instead of attention softcapping, DUAL RoPE frequencies (a local
base frequency for sliding layers, the global theta for full layers), and
config-driven layer_types. ≙ the reference's Gemma-3 gemlite example, here
as a first-class quantizable family (HF `Gemma3ForCausalLM` semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from . import llama
from .gemma import _gemma_mlp, _gemma_norm
from .gemma2 import Gemma2Config
from .llama import KVCache, _update_stacked_cache, init_cache  # noqa: F401

__all__ = ["Gemma3Config", "init_params", "forward", "init_cache"]


@dataclasses.dataclass(frozen=True)
class Gemma3Config(Gemma2Config):
    attn_logit_softcapping: Optional[float] = None
    final_logit_softcapping: Optional[float] = None
    rope_local_base_freq: float = 10000.0
    rope_theta: float = 1000000.0
    layer_types: Optional[tuple] = None  # from HF config; fallback 5:1 pattern

    def __post_init__(self):
        # JSON sidecars round-trip tuples as lists; keep the field hashable
        # (configs are frozen / used as static jit args)
        if isinstance(self.layer_types, list):
            object.__setattr__(self, "layer_types", tuple(self.layer_types))

    def layer_is_sliding(self, i: int) -> bool:
        if self.layer_types is not None:
            return self.layer_types[i] == "sliding_attention"
        return (i + 1) % 6 != 0  # gemma3 default: 5 sliding : 1 full

    @classmethod
    def from_hf(cls, hf: dict) -> "Gemma3Config":
        lt = hf.get("layer_types")
        return cls(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            num_key_value_heads=hf.get("num_key_value_heads",
                                       hf["num_attention_heads"]),
            head_dim=hf.get("head_dim", 256),
            max_position_embeddings=hf.get("max_position_embeddings", 32768),
            rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
            rope_theta=hf.get("rope_theta", 1_000_000.0),
            rope_local_base_freq=hf.get("rope_local_base_freq", 10_000.0),
            sliding_window=hf.get("sliding_window", 4096),
            query_pre_attn_scalar=hf.get("query_pre_attn_scalar", 256.0),
            attn_logit_softcapping=hf.get("attn_logit_softcapping"),
            final_logit_softcapping=hf.get("final_logit_softcapping"),
            layer_types=tuple(lt) if lt else None,
            tie_word_embeddings=True,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "Gemma3Config":
        return cls(
            vocab_size=vocab_size,
            hidden_size=256,
            intermediate_size=512,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=64,
            max_position_embeddings=512,
            query_pre_attn_scalar=64.0,
            sliding_window=16,
            layer_types=("sliding_attention", "full_attention"),
        )


def init_params(cfg: Gemma3Config, key: Array, dtype=jnp.float32) -> dict:
    from .gemma2 import init_params as g2_init

    params = g2_init(cfg, key, dtype)
    hd = cfg.head_dim_
    for layer in params["layers"]:
        layer["self_attn"]["q_norm"] = jnp.zeros((hd,), dtype)  # (1+w) identity
        layer["self_attn"]["k_norm"] = jnp.zeros((hd,), dtype)
    return params


def _attention(layer, cfg, x, k_all, v_all, layer_idx, start_pos, mask,
               cos, sin, cached: bool):
    b, t, d = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    if "qkv_proj" in layer:
        qkv = layer["qkv_proj"](x)
        q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
        q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    else:
        q = layer["q_proj"](x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = layer["k_proj"](x).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
        v = layer["v_proj"](x).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)

    q = _gemma_norm(q, layer["q_norm"], cfg.rms_norm_eps)
    k = _gemma_norm(k, layer["k_norm"], cfg.rms_norm_eps)
    q = llama._apply_rope(q, cos, sin)
    k = llama._apply_rope(k, cos, sin)

    if cached:
        k_all, v_all = _update_stacked_cache(k_all, v_all, layer_idx, k, v, start_pos)
        keys, vals = k_all[layer_idx], v_all[layer_idx]
    else:
        keys, vals = k, v
    rep = nh // nkv
    if rep > 1:
        keys = jnp.repeat(keys, rep, axis=1)
        vals = jnp.repeat(vals, rep, axis=1)

    scores = jnp.einsum("bhtd,bhsd->bhts", q, keys, preferred_element_type=jnp.float32)
    scores = scores * (cfg.query_pre_attn_scalar**-0.5) + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, vals)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    return layer["o_proj"](out), k_all, v_all


def forward(
    params: dict,
    cfg: Gemma3Config,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos=0,
    kv_valid: Optional[Array] = None,
    page_indices=None,
) -> Tuple[Array, Optional[KVCache]]:
    from ..ops.paged import PagedKVCache

    if isinstance(cache, PagedKVCache):
        # shared gemma paged step (handles gemma3 q/k-norm + dual rope)
        from .gemma2 import _forward_paged

        return _forward_paged(params, cfg, tokens, cache,
                              jnp.asarray(start_pos), page_indices)
    b, t = tokens.shape
    x = jnp.take(params["embed_tokens"], tokens, axis=0)
    x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)

    cache_len = None if cache is None else cache.max_len
    cfg_full = dataclasses.replace(cfg, sliding_window=None)
    _, cos_g, sin_g, mask_full = llama.positions_and_masks(
        cfg_full, t, start_pos, cache_len, kv_valid
    )
    cfg_local = dataclasses.replace(cfg, rope_theta=cfg.rope_local_base_freq)
    _, cos_l, sin_l, mask_sliding = llama.positions_and_masks(
        cfg_local, t, start_pos, cache_len, kv_valid
    )

    k_all = cache.k if cache is not None else None
    v_all = cache.v if cache is not None else None
    for i, layer in enumerate(params["layers"]):
        sliding = cfg.layer_is_sliding(i)
        mask = mask_sliding if sliding else mask_full
        cos, sin = (cos_l, sin_l) if sliding else (cos_g, sin_g)
        h = _gemma_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, k_all, v_all = _attention(
            layer["self_attn"], cfg, h, k_all, v_all, i, start_pos,
            mask, cos, sin, cached=cache is not None,
        )
        attn_out = _gemma_norm(attn_out, layer["post_attention_layernorm"],
                               cfg.rms_norm_eps)
        x = x + attn_out
        h = _gemma_norm(x, layer["pre_feedforward_layernorm"], cfg.rms_norm_eps)
        h = _gemma_mlp(layer["mlp"], h)
        h = _gemma_norm(h, layer["post_feedforward_layernorm"], cfg.rms_norm_eps)
        x = x + h

    x = _gemma_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                        preferred_element_type=jnp.float32)
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def params_from_hf_state_dict(state, cfg: Gemma3Config, dtype=jnp.float32) -> dict:
    from .gemma2 import params_from_hf_state_dict as g2_load

    params = g2_load(state, cfg, dtype)
    import numpy as np

    def arr(name):
        x = state[name]
        if hasattr(x, "detach"):
            x = x.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(x), dtype)

    for i, layer in enumerate(params["layers"]):
        p = f"model.layers.{i}.self_attn"
        layer["self_attn"]["q_norm"] = arr(f"{p}.q_norm.weight")
        layer["self_attn"]["k_norm"] = arr(f"{p}.k_norm.weight")
    return params
