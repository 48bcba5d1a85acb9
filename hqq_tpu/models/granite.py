# SPDX-License-Identifier: Apache-2.0
"""IBM Granite family — Llama-shaped with the muP-style scalar knobs:
embedding/residual/attention multipliers and logits scaling
(HF `GraniteForCausalLM`). Reuses the Llama block; only the four scalars and
the attention score scale differ."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from . import llama
from .llama import (  # noqa: F401
    KVCache,
    _update_stacked_cache,
    init_cache,
    init_params,
    rms_norm,
)


@dataclasses.dataclass(frozen=True)
class GraniteConfig(llama.LlamaConfig):
    embedding_multiplier: float = 1.0
    residual_multiplier: float = 1.0
    attention_multiplier: float = 1.0
    logits_scaling: float = 1.0

    @classmethod
    def from_hf(cls, hf: dict) -> "GraniteConfig":
        base = llama.LlamaConfig.from_hf(hf)
        return cls(
            **dataclasses.asdict(base),
            embedding_multiplier=hf.get("embedding_multiplier", 1.0),
            residual_multiplier=hf.get("residual_multiplier", 1.0),
            attention_multiplier=hf.get("attention_multiplier", 1.0),
            logits_scaling=hf.get("logits_scaling", 1.0),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "GraniteConfig":
        return cls(
            vocab_size=vocab_size, hidden_size=256, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512,
            embedding_multiplier=12.0, residual_multiplier=0.22,
            attention_multiplier=0.015625, logits_scaling=8.0,
        )


def _attention(layer, cfg, x, k_all, v_all, layer_idx, start_pos, mask, cos, sin,
               cached: bool):
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
    # Granite replaces 1/sqrt(hd) with the attention_multiplier
    scores = jnp.einsum("bhtd,bhsd->bhts", q, keys,
                        preferred_element_type=jnp.float32)
    scores = scores * cfg.attention_multiplier + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, vals)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    return layer["o_proj"](out), k_all, v_all


def _forward_paged(params, cfg, tokens, cache, lengths, page_indices):
    """Paged decode step (cache polymorphism; see llama._forward_paged).
    Granite deltas: embedding/residual multipliers, attention_multiplier as
    the query scale, logits_scaling on the head."""
    toks = tokens if tokens.ndim == 2 else tokens[:, None]
    x = jnp.take(params["embed_tokens"], toks, axis=0)
    x = x * jnp.asarray(cfg.embedding_multiplier, x.dtype)
    _, cos, sin, _ = llama.positions_and_masks(cfg, toks.shape[1], lengths, None)
    rm = jnp.asarray(cfg.residual_multiplier, x.dtype)
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, cache = llama._attention_paged(
            layer["self_attn"], cfg, h, cache, i, lengths, page_indices,
            cos, sin, q_scale=cfg.attention_multiplier,
        )
        x = x + attn_out * rm
        h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + llama._mlp(layer["mlp"], h) * rm
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                            preferred_element_type=jnp.float32)
    else:
        logits = params["lm_head"](x).astype(jnp.float32)
    return logits / cfg.logits_scaling, cache


def forward(
    params: dict,
    cfg: GraniteConfig,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos=0,
    kv_valid: Optional[Array] = None,
    page_indices=None,
) -> Tuple[Array, Optional[KVCache]]:
    from ..ops.paged import PagedKVCache

    if isinstance(cache, PagedKVCache):
        return _forward_paged(params, cfg, tokens, cache,
                              jnp.asarray(start_pos), page_indices)
    b, t = tokens.shape
    x = jnp.take(params["embed_tokens"], tokens, axis=0)
    x = x * jnp.asarray(cfg.embedding_multiplier, x.dtype)

    _, cos, sin, mask = llama.positions_and_masks(
        cfg, t, start_pos, None if cache is None else cache.max_len, kv_valid
    )
    rm = jnp.asarray(cfg.residual_multiplier, x.dtype)

    k_all = cache.k if cache is not None else None
    v_all = cache.v if cache is not None else None
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, k_all, v_all = _attention(
            layer["self_attn"], cfg, h, k_all, v_all, i, start_pos,
            mask, cos, sin, cached=cache is not None,
        )
        x = x + attn_out * rm
        h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + llama._mlp(layer["mlp"], h) * rm

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                            preferred_element_type=jnp.float32)
    else:
        logits = params["lm_head"](x).astype(jnp.float32)
    logits = logits / cfg.logits_scaling
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache
