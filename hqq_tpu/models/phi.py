# SPDX-License-Identifier: Apache-2.0
"""Phi family (phi-1 / phi-1.5 / phi-2) — parallel attention+MLP decoder with
partial rotary embeddings and biased LayerNorm.

≙ `/root/reference/hqq/models/hf/phi.py:11-63` (linear tags q/k/v_proj,
dense, fc1, fc2; layernorms + embeddings kept fp). The forward pass is owned
here (HF `PhiForCausalLM` semantics): per block
``x = x + attn(LN(x)) + mlp(LN(x))`` — the SAME LayerNorm output feeds both
branches — with RoPE applied only to the first
``rotary_dim = partial_rotary_factor * head_dim`` dimensions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..nn.linear import Linear
from .llama import KVCache, _apply_rope, _rope_cos_sin, positions_and_masks

__all__ = ["PhiConfig", "init_params", "forward", "init_cache", "LINEAR_TAGS"]

LINEAR_TAGS = (
    "self_attn.q_proj",
    "self_attn.k_proj",
    "self_attn.v_proj",
    "self_attn.dense",
    "mlp.fc1",
    "mlp.fc2",
)


@dataclass(frozen=True)
class PhiConfig:
    vocab_size: int = 51200
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 24
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.5
    tie_word_embeddings: bool = False
    # shared-helper compatibility (positions_and_masks reads these)
    rms_norm_eps: float = 1e-5
    sliding_window: Optional[int] = None

    @property
    def head_dim_(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.partial_rotary_factor * self.head_dim_)

    @classmethod
    def from_hf(cls, hf: dict) -> "PhiConfig":
        return cls(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            num_key_value_heads=hf.get(
                "num_key_value_heads", hf["num_attention_heads"]
            ),
            max_position_embeddings=hf.get("max_position_embeddings", 2048),
            layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
            rope_theta=hf.get("rope_theta", 10000.0),
            partial_rotary_factor=hf.get("partial_rotary_factor", 0.5),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
        )

    @classmethod
    def phi2(cls) -> "PhiConfig":
        return cls(
            hidden_size=2560,
            intermediate_size=10240,
            num_hidden_layers=32,
            partial_rotary_factor=0.4,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "PhiConfig":
        return cls(
            vocab_size=vocab_size,
            hidden_size=256,
            intermediate_size=512,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=4,
            max_position_embeddings=512,
        )


def init_params(cfg: PhiConfig, key: Array, dtype=jnp.bfloat16) -> dict:
    k_iter = iter(jax.random.split(key, 4 + 6 * cfg.num_hidden_layers))
    d, f = cfg.hidden_size, cfg.intermediate_size
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_

    def lin(out_f, in_f):
        w = jax.random.normal(next(k_iter), (out_f, in_f), jnp.float32)
        return Linear(
            weight=(w / jnp.sqrt(in_f)).astype(dtype),
            bias=jnp.zeros((out_f,), dtype),
        )

    def ln(n):
        return {"weight": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "self_attn": {
                    "q_proj": lin(nh * hd, d),
                    "k_proj": lin(nkv * hd, d),
                    "v_proj": lin(nkv * hd, d),
                    "dense": lin(d, nh * hd),
                },
                "mlp": {"fc1": lin(f, d), "fc2": lin(d, f)},
                "input_layernorm": ln(d),
            }
        )
    embed = (
        jax.random.normal(next(k_iter), (cfg.vocab_size, d), jnp.float32) * 0.02
    ).astype(dtype)
    return {
        "embed_tokens": embed,
        "layers": layers,
        "final_layernorm": ln(d),
        "lm_head": lin(cfg.vocab_size, d),
    }


def init_cache(cfg: PhiConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (
        cfg.num_hidden_layers,
        batch,
        cfg.num_key_value_heads,
        max_len,
        cfg.head_dim_,
    )
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def layer_norm(x: Array, p: dict, eps: float) -> Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    mu = x.mean(axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + eps)
    return (x * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(dt)


def _apply_partial_rope(x: Array, cos: Array, sin: Array, rotary_dim: int) -> Array:
    """RoPE on the first `rotary_dim` dims only; the tail passes through."""
    rot, rest = x[..., :rotary_dim], x[..., rotary_dim:]
    rot = _apply_rope(rot, cos, sin)
    return jnp.concatenate([rot, rest], axis=-1)


def _attention(
    layer: dict,
    cfg: PhiConfig,
    x: Array,
    k_all: Array,
    v_all: Array,
    layer_idx: int,
    start_pos,
    mask: Array,
    cos: Array,
    sin: Array,
) -> Tuple[Array, Array, Array]:
    from .llama import _update_stacked_cache

    b, t, d = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_

    q = layer["q_proj"](x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = layer["k_proj"](x).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    v = layer["v_proj"](x).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)

    q = _apply_partial_rope(q, cos, sin, cfg.rotary_dim)
    k = _apply_partial_rope(k, cos, sin, cfg.rotary_dim)

    k_all, v_all = _update_stacked_cache(k_all, v_all, layer_idx, k, v, start_pos)

    rep = nh // nkv
    keys = jnp.repeat(k_all[layer_idx], rep, axis=1) if rep > 1 else k_all[layer_idx]
    vals = jnp.repeat(v_all[layer_idx], rep, axis=1) if rep > 1 else v_all[layer_idx]

    # Phi computes attention in fp32 (HF PhiAttention upcasts q/k).
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q, keys, preferred_element_type=jnp.float32
    ) / jnp.sqrt(hd).astype(jnp.float32)
    probs = jax.nn.softmax((scores + mask).astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, vals)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    return layer["dense"](out), k_all, v_all


def _mlp(layer: dict, x: Array) -> Array:
    return layer["fc2"](jax.nn.gelu(layer["fc1"](x), approximate=True))


def forward(
    params: dict,
    cfg: PhiConfig,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos=0,
    kv_valid: Optional[Array] = None,
) -> Tuple[Array, Optional[KVCache]]:
    """Phi forward: logits [B, T, V] + updated cache (same contract as
    `llama.forward`, so Generator / ContinuousBatchingEngine / eval reuse)."""
    b, t = tokens.shape
    x = jnp.take(params["embed_tokens"], tokens, axis=0)

    pos_arr = jnp.asarray(start_pos)
    if pos_arr.ndim == 0:
        pos_bt = (pos_arr + jnp.arange(t))[None, :]
    else:
        pos_bt = pos_arr[:, None] + jnp.arange(t)[None, :]
    cos, sin = _rope_cos_sin(pos_bt.reshape(-1), cfg.rotary_dim, cfg.rope_theta)
    cos = cos.reshape(*pos_bt.shape, cfg.rotary_dim)[:, None]
    sin = sin.reshape(*pos_bt.shape, cfg.rotary_dim)[:, None]

    _, _, _, mask = positions_and_masks(
        cfg, t, start_pos, None if cache is None else cache.max_len, kv_valid
    )

    k_all = cache.k if cache is not None else None
    v_all = cache.v if cache is not None else None
    for i, layer in enumerate(params["layers"]):
        h = layer_norm(x, layer["input_layernorm"], cfg.layer_norm_eps)
        if cache is None:
            ck = jnp.zeros((1, b, cfg.num_key_value_heads, t, cfg.head_dim_), x.dtype)
            attn_out, _, _ = _attention(
                layer["self_attn"], cfg, h, ck, ck, 0, 0, mask, cos, sin
            )
        else:
            attn_out, k_all, v_all = _attention(
                layer["self_attn"], cfg, h, k_all, v_all, i,
                start_pos, mask, cos, sin,
            )
        # Parallel residual: both branches read the SAME normed input.
        x = x + attn_out + _mlp(layer["mlp"], h)

    x = layer_norm(x, params["final_layernorm"], cfg.layer_norm_eps)
    logits = params["lm_head"](x).astype(jnp.float32)

    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def params_from_hf_state_dict(state, cfg: PhiConfig, dtype=jnp.bfloat16) -> dict:
    """Map a HF `PhiForCausalLM` state dict onto the param pytree."""

    def arr(name):
        return jnp.asarray(np_like(state[name]), dtype)

    def np_like(t):
        import numpy as np

        return np.asarray(t)

    def lin(prefix):
        bias = f"{prefix}.bias"
        return Linear(
            weight=arr(f"{prefix}.weight"),
            bias=arr(bias) if bias in state else None,
        )

    def ln(prefix):
        return {"weight": arr(f"{prefix}.weight"), "bias": arr(f"{prefix}.bias")}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        layers.append(
            {
                "self_attn": {
                    "q_proj": lin(f"{p}.self_attn.q_proj"),
                    "k_proj": lin(f"{p}.self_attn.k_proj"),
                    "v_proj": lin(f"{p}.self_attn.v_proj"),
                    "dense": lin(f"{p}.self_attn.dense"),
                },
                "mlp": {"fc1": lin(f"{p}.mlp.fc1"), "fc2": lin(f"{p}.mlp.fc2")},
                "input_layernorm": ln(f"{p}.input_layernorm"),
            }
        )
    return {
        "embed_tokens": arr("model.embed_tokens.weight"),
        "layers": layers,
        "final_layernorm": ln("model.final_layernorm"),
        "lm_head": lin("lm_head"),
    }
