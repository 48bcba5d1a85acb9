# SPDX-License-Identifier: Apache-2.0
"""OLMo-2 family — "norm-after" decoder: RMSNorm applied to the OUTPUT of
each sublayer (no input norms), plus q/k RMSNorm over the FLAT projection
(nh*hd, applied before the head reshape/RoPE) — HF `Olmo2ForCausalLM`.
Linear tags identical to Llama's seven."""

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
    init_params as _llama_init,
    rms_norm,
)


@dataclasses.dataclass(frozen=True)
class Olmo2Config(llama.LlamaConfig):
    vocab_size: int = 100352
    rms_norm_eps: float = 1e-6
    rope_theta: float = 500000.0

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "Olmo2Config":
        return cls(
            vocab_size=vocab_size, hidden_size=256, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512,
        )


def init_params(cfg: Olmo2Config, key: Array, dtype=jnp.float32) -> dict:
    params = _llama_init(cfg, key, dtype)
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    for layer in params["layers"]:
        sa = layer["self_attn"]
        sa["q_norm_flat"] = jnp.ones((nh * hd,), dtype)
        sa["k_norm_flat"] = jnp.ones((nkv * hd,), dtype)
        # olmo2 has no input norms; llama init's input_layernorm becomes the
        # post-attention norm and we add the post-ffn one
        layer["post_feedforward_layernorm"] = jnp.ones((cfg.hidden_size,), dtype)
    return params


def _attention(layer, cfg, x, k_all, v_all, layer_idx, start_pos, mask, cos, sin,
               cached: bool):
    b, t, d = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    q = rms_norm(layer["q_proj"](x), layer["q_norm_flat"], cfg.rms_norm_eps)
    k = rms_norm(layer["k_proj"](x), layer["k_norm_flat"], cfg.rms_norm_eps)
    v = layer["v_proj"](x)
    q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
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
    scores = jnp.einsum("bhtd,bhsd->bhts", q, keys,
                        preferred_element_type=jnp.float32) / jnp.sqrt(hd)
    probs = jax.nn.softmax((scores + mask).astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, vals)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    return layer["o_proj"](out), k_all, v_all


def forward(
    params: dict,
    cfg: Olmo2Config,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos=0,
    kv_valid: Optional[Array] = None,
) -> Tuple[Array, Optional[KVCache]]:
    b, t = tokens.shape
    x = jnp.take(params["embed_tokens"], tokens, axis=0)
    _, cos, sin, mask = llama.positions_and_masks(
        cfg, t, start_pos, None if cache is None else cache.max_len, kv_valid
    )
    k_all = cache.k if cache is not None else None
    v_all = cache.v if cache is not None else None
    for i, layer in enumerate(params["layers"]):
        # norm-after: attention reads x RAW, its output is normed
        attn_out, k_all, v_all = _attention(
            layer["self_attn"], cfg, x, k_all, v_all, i, start_pos,
            mask, cos, sin, cached=cache is not None,
        )
        x = x + rms_norm(attn_out, layer["post_attention_layernorm"],
                         cfg.rms_norm_eps)
        m = layer["mlp"]
        ffn = m["down_proj"](jax.nn.silu(m["gate_proj"](x)) * m["up_proj"](x))
        x = x + rms_norm(ffn, layer["post_feedforward_layernorm"],
                         cfg.rms_norm_eps)

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = params["lm_head"](x).astype(jnp.float32) if "lm_head" in params else (
        jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                   preferred_element_type=jnp.float32)
    )
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def params_from_hf_state_dict(state, cfg: Olmo2Config, dtype=jnp.float32) -> dict:
    import numpy as np

    from ..nn.linear import Linear

    def arr(name):
        x = state[name]
        if hasattr(x, "detach"):
            x = x.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(x), dtype)

    def lin(prefix):
        b = f"{prefix}.bias"
        return Linear(weight=arr(f"{prefix}.weight"),
                      bias=arr(b) if b in state else None)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        layers.append({
            "self_attn": {
                "q_proj": lin(f"{p}.self_attn.q_proj"),
                "k_proj": lin(f"{p}.self_attn.k_proj"),
                "v_proj": lin(f"{p}.self_attn.v_proj"),
                "o_proj": lin(f"{p}.self_attn.o_proj"),
                "q_norm_flat": arr(f"{p}.self_attn.q_norm.weight"),
                "k_norm_flat": arr(f"{p}.self_attn.k_norm.weight"),
            },
            "mlp": {
                "gate_proj": lin(f"{p}.mlp.gate_proj"),
                "up_proj": lin(f"{p}.mlp.up_proj"),
                "down_proj": lin(f"{p}.mlp.down_proj"),
            },
            "post_attention_layernorm": arr(f"{p}.post_attention_layernorm.weight"),
            "post_feedforward_layernorm": arr(f"{p}.post_feedforward_layernorm.weight"),
        })
    return {
        "embed_tokens": arr("model.embed_tokens.weight"),
        "layers": layers,
        "norm": arr("model.norm.weight"),
        "lm_head": lin("lm_head"),
    }
