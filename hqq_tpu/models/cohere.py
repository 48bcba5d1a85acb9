# SPDX-License-Identifier: Apache-2.0
"""Cohere (Command-R) decoder: parallel residual, interleaved RoPE, scaled
logits.

18th family. Architectural deltas from Llama (HF `CohereForCausalLM`):
  * ONE pre-norm per block feeding attention AND the MLP in parallel:
    `x = x + attn(ln(x)) + mlp(ln(x))`;
  * `CohereLayerNorm` — mean-centered variance norm with weight only (no
    bias), also used per-head for the optional QK-norm (`use_qk_norm`,
    weight [heads, head_dim]);
  * INTERLEAVED RoPE: pairs (x_{2i}, x_{2i+1}) rotate together
    (`rotate_half` differs from Llama's half-split) with
    repeat-interleaved cos/sin tables;
  * logits scaled by `logit_scale`, embeddings tied.
Quantizable linear tags are the Llama seven, so every quantize / backend /
TP path applies unchanged."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..nn.linear import Linear
from . import llama
from .llama import KVCache, _update_stacked_cache

__all__ = ["CohereConfig", "init_params", "forward", "init_cache", "params_from_hf_state_dict"]


@dataclass(frozen=True)
class CohereConfig(llama.LlamaConfig):
    logit_scale: float = 0.0625
    use_qk_norm: bool = False
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf(cls, hf: dict) -> "CohereConfig":
        base = llama.LlamaConfig.from_hf(hf)
        base = dataclasses.replace(
            base,
            rms_norm_eps=hf.get("layer_norm_eps", 1e-5),
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
        )
        return cls(
            **dataclasses.asdict(base),
            logit_scale=hf.get("logit_scale", 0.0625),
            use_qk_norm=hf.get("use_qk_norm", False),
            layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "CohereConfig":
        return cls(
            vocab_size=vocab_size,
            hidden_size=128,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=256,
            tie_word_embeddings=True,
            use_qk_norm=True,
        )


def init_cache(cfg: CohereConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    return llama.init_cache(cfg, batch, max_len, dtype)


def cohere_norm(x: Array, w: Array, eps: float) -> Array:
    """Mean-centered variance norm, weight only (CohereLayerNorm)."""
    dt = x.dtype
    x = x.astype(jnp.float32)
    mu = x.mean(axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + eps)
    return (x * w.astype(jnp.float32)).astype(dt)


def _rope_tables_interleaved(positions: Array, head_dim: int, theta: float):
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [T, hd/2]
    emb = jnp.repeat(freqs, 2, axis=-1)  # repeat_interleave: [T, hd]
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope_interleaved(x: Array, cos: Array, sin: Array) -> Array:
    """x: [B, H, T, hd]; Cohere `rotate_half` interleaves even/odd dims."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rot = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return (x.astype(jnp.float32) * cos + rot.astype(jnp.float32) * sin).astype(x.dtype)


def _attention(layer, cfg, x, k_all, v_all, layer_idx, start_pos, mask, cos, sin,
               cached: bool):
    b, t, d = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    if "qkv_proj" in layer:
        qkv = layer["qkv_proj"](x)
        q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
    else:
        q, k, v = layer["q_proj"](x), layer["k_proj"](x), layer["v_proj"](x)
    # qk-norm applies over [.., H, hd] BEFORE the head transpose (per-head
    # weight [H, hd])
    q = q.reshape(b, t, nh, hd)
    k = k.reshape(b, t, nkv, hd)
    if cfg.use_qk_norm and "q_norm" in layer:
        q = cohere_norm(q, layer["q_norm"], cfg.layer_norm_eps)
        k = cohere_norm(k, layer["k_norm"], cfg.layer_norm_eps)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    q = _apply_rope_interleaved(q, cos, sin)
    k = _apply_rope_interleaved(k, cos, sin)

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
    cfg: CohereConfig,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos=0,
    kv_valid: Optional[Array] = None,
) -> Tuple[Array, Optional[KVCache]]:
    b, t = tokens.shape
    x = jnp.take(params["embed_tokens"], tokens, axis=0)

    pos_arr = jnp.asarray(start_pos)
    pos_bt = (pos_arr + jnp.arange(t))[None, :] if pos_arr.ndim == 0 else (
        pos_arr[:, None] + jnp.arange(t)[None, :]
    )
    cos, sin = _rope_tables_interleaved(pos_bt.reshape(-1), cfg.head_dim_, cfg.rope_theta)
    cos = cos.reshape(*pos_bt.shape, cfg.head_dim_)[:, None]
    sin = sin.reshape(*pos_bt.shape, cfg.head_dim_)[:, None]
    _, _, _, mask = llama.positions_and_masks(
        cfg, t, start_pos, None if cache is None else cache.max_len, kv_valid
    )

    k_all = cache.k if cache is not None else None
    v_all = cache.v if cache is not None else None
    for i, layer in enumerate(params["layers"]):
        h = cohere_norm(x, layer["input_layernorm"], cfg.layer_norm_eps)
        attn_out, k_all, v_all = _attention(
            layer["self_attn"], cfg, h, k_all, v_all, i, start_pos,
            mask, cos, sin, cached=cache is not None,
        )
        mlp_out = llama._mlp(layer["mlp"], h)
        x = x + attn_out + mlp_out  # parallel residual, single norm

    x = cohere_norm(x, params["norm"], cfg.layer_norm_eps)
    logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                        preferred_element_type=jnp.float32)
    logits = logits * jnp.asarray(cfg.logit_scale, jnp.float32)
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def init_params(cfg: CohereConfig, key: Array, dtype=jnp.bfloat16) -> dict:
    base = llama.init_params(cfg, key, dtype)
    base.pop("lm_head", None)  # tied
    if cfg.use_qk_norm:
        nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
        for layer in base["layers"]:
            layer["self_attn"]["q_norm"] = jnp.ones((nh, hd), dtype)
            layer["self_attn"]["k_norm"] = jnp.ones((nkv, hd), dtype)
    for layer in base["layers"]:
        layer.pop("post_attention_layernorm", None)  # single shared norm
    return base


def params_from_hf_state_dict(state, cfg: CohereConfig, dtype=jnp.bfloat16) -> dict:
    import numpy as np

    def arr(name):
        x = state[name]
        if hasattr(x, "detach"):
            x = x.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(x), dtype)

    def lin(prefix):
        b = prefix + ".bias"
        return Linear(weight=arr(prefix + ".weight"),
                      bias=arr(b) if b in state else None)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        sa = {f"{t}_proj": lin(f"{p}.self_attn.{t}_proj") for t in "qkvo"}
        if cfg.use_qk_norm:
            sa["q_norm"] = arr(f"{p}.self_attn.q_norm.weight")
            sa["k_norm"] = arr(f"{p}.self_attn.k_norm.weight")
        layers.append({
            "self_attn": sa,
            "mlp": {f"{t}_proj": lin(f"{p}.mlp.{t}_proj")
                    for t in ("gate", "up", "down")},
            "input_layernorm": arr(f"{p}.input_layernorm.weight"),
        })
    return {
        "embed_tokens": arr("model.embed_tokens.weight"),
        "layers": layers,
        "norm": arr("model.norm.weight"),
    }
