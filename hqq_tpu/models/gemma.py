# SPDX-License-Identifier: Apache-2.0
"""Gemma family — Llama-shaped decoder with Gemma's deltas: scaled embeddings
(sqrt(d_model)), RMSNorm with a (1 + w) weight offset, GeGLU MLP, tied
embeddings.

≙ the reference's Gemma support (example-level: `examples/` Gemma-3 gemlite
script); here first-class like the other families. Reuses `llama`'s
attention/cache machinery — only the norm, activation and embed scaling
differ (HF `GemmaForCausalLM` conventions).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from . import llama
from .llama import (  # noqa: F401
    KVCache,
    LINEAR_TAGS,
    _attention,
    _attention_nocache,
    init_cache,
    positions_and_masks,
)

__all__ = ["GemmaConfig", "init_params", "forward", "init_cache"]


@dataclasses.dataclass(frozen=True)
class GemmaConfig(llama.LlamaConfig):
    """Gemma-2B-ish defaults; `from_hf` handles real checkpoints."""

    vocab_size: int = 256000
    hidden_size: int = 2048
    intermediate_size: int = 16384
    num_hidden_layers: int = 18
    num_attention_heads: int = 8
    num_key_value_heads: int = 1
    head_dim: Optional[int] = 256
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "GemmaConfig":
        return cls(
            vocab_size=vocab_size,
            hidden_size=256,
            intermediate_size=512,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=64,
            max_position_embeddings=512,
        )


def init_params(cfg: GemmaConfig, key: Array, dtype=jnp.float32) -> dict:
    params = llama.init_params(cfg, key, dtype)
    params.pop("lm_head", None)  # always tied
    return params


def _gemma_norm(x: Array, w: Array, eps: float) -> Array:
    """RMSNorm with (1 + w) weighting, fp32 internals (HF GemmaRMSNorm)."""
    dt = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * (1.0 + w.astype(jnp.float32))).astype(dt)


def _gemma_mlp(layer: dict, x: Array) -> Array:
    if "gate_up_proj" in layer:
        gu = layer["gate_up_proj"](x)
        gate, up = jnp.split(gu, 2, axis=-1)
    else:
        gate, up = layer["gate_proj"](x), layer["up_proj"](x)
    return layer["down_proj"](jax.nn.gelu(gate, approximate=True) * up)


def forward(
    params: dict,
    cfg: GemmaConfig,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos=0,
    kv_valid: Optional[Array] = None,
) -> Tuple[Array, Optional[KVCache]]:
    """Same contract as `llama.forward`; Gemma norm/act/embed-scale deltas."""
    b, t = tokens.shape
    x = jnp.take(params["embed_tokens"], tokens, axis=0)
    # Gemma scales embeddings by sqrt(hidden) in the INPUT dtype
    x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)

    _, cos, sin, mask = positions_and_masks(
        cfg, t, start_pos, None if cache is None else cache.max_len, kv_valid
    )

    k_all = cache.k if cache is not None else None
    v_all = cache.v if cache is not None else None
    for i, layer in enumerate(params["layers"]):
        h = _gemma_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        if cache is None:
            attn_out = _attention_nocache(layer["self_attn"], cfg, h, mask, cos, sin)
        else:
            attn_out, k_all, v_all = _attention(
                layer["self_attn"], cfg, h, k_all, v_all, i, start_pos,
                mask, cos, sin,
            )
        x = x + attn_out
        h = _gemma_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + _gemma_mlp(layer["mlp"], h)

    x = _gemma_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = jnp.einsum(
        "btd,vd->btv", x, params["embed_tokens"], preferred_element_type=jnp.float32
    )
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache
