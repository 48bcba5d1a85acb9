# SPDX-License-Identifier: Apache-2.0
"""Phi-3 decoder: Llama-shaped with NATIVELY fused qkv/gate_up projections.

17th family. HF `Phi3ForCausalLM` stores `self_attn.qkv_proj` and
`mlp.gate_up_proj` as single linears — exactly the fused-layer contract
`llama.forward` already speaks (`fuse_for_decode` produces the same keys for
other families), so the whole forward is `llama.forward` with a direct
weight mapping. The fused projections quantize as single `QuantLinear`s
(wider N also feeds the MXU better — the fusion the reference hand-builds in
`models/hf/phi_opt.py:8-57`, Phi-3 ships natively).

LongRoPE (`rope_scaling`) is not implemented: supported contexts are the
base `original_max_position_embeddings` (4k/8k class); the loader asserts.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import Array

from ..nn.linear import Linear
from . import llama
from .llama import KVCache, forward as _llama_forward  # noqa: F401

__all__ = ["Phi3Config", "init_params", "forward", "init_cache", "params_from_hf_state_dict"]


@dataclass(frozen=True)
class Phi3Config(llama.LlamaConfig):
    @classmethod
    def from_hf(cls, hf: dict) -> "Phi3Config":
        scaling = hf.get("rope_scaling")
        assert scaling in (None, {}), (
            "Phi-3 LongRoPE (rope_scaling) is not implemented; use the base-"
            "context checkpoints or strip the scaling for short contexts"
        )
        base = llama.LlamaConfig.from_hf(hf)
        return cls(**dataclasses.asdict(base))

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "Phi3Config":
        return cls(
            vocab_size=vocab_size,
            hidden_size=128,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=256,
        )


def init_cache(cfg: Phi3Config, batch: int, max_len: int, dtype=jnp.bfloat16):
    return llama.init_cache(cfg, batch, max_len, dtype)


def init_params(cfg: Phi3Config, key: Array, dtype=jnp.bfloat16) -> dict:
    """Random init with the NATIVE fused projections (qkv_proj/gate_up_proj)."""
    d, f = cfg.hidden_size, cfg.intermediate_size
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    k_iter = iter(jax.random.split(key, 2 + 4 * cfg.num_hidden_layers))

    def lin(out_f, in_f):
        w = jax.random.normal(next(k_iter), (out_f, in_f), jnp.float32)
        return Linear(weight=(w / jnp.sqrt(in_f)).astype(dtype))

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append({
            "self_attn": {
                "qkv_proj": lin((nh + 2 * nkv) * hd, d),
                "o_proj": lin(d, nh * hd),
            },
            "mlp": {
                "gate_up_proj": lin(2 * f, d),
                "down_proj": lin(d, f),
            },
            "input_layernorm": jnp.ones((d,), dtype),
            "post_attention_layernorm": jnp.ones((d,), dtype),
        })
    embed = (jax.random.normal(next(k_iter), (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype)
    params = {"embed_tokens": embed, "layers": layers, "norm": jnp.ones((d,), dtype)}
    if not cfg.tie_word_embeddings:
        params["lm_head"] = lin(cfg.vocab_size, d)
    return params


# the forward IS llama's (fused keys are first-class there)
forward = _llama_forward


def params_from_hf_state_dict(state, cfg: Phi3Config, dtype=jnp.bfloat16) -> dict:
    """Map HF `Phi3ForCausalLM` weights (fused qkv/gate_up) to the tree."""
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
        layers.append({
            "self_attn": {
                "qkv_proj": lin(f"{p}.self_attn.qkv_proj"),
                "o_proj": lin(f"{p}.self_attn.o_proj"),
            },
            "mlp": {
                "gate_up_proj": lin(f"{p}.mlp.gate_up_proj"),
                "down_proj": lin(f"{p}.mlp.down_proj"),
            },
            "input_layernorm": arr(f"{p}.input_layernorm.weight"),
            "post_attention_layernorm": arr(f"{p}.post_attention_layernorm.weight"),
        })
    params = {
        "embed_tokens": arr("model.embed_tokens.weight"),
        "layers": layers,
        "norm": arr("model.norm.weight"),
    }
    if "lm_head.weight" in state:
        params["lm_head"] = lin("lm_head")
    return params
