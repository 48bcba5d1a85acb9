# SPDX-License-Identifier: Apache-2.0
"""StarCoder2 family — code-LLM variant: biased LayerNorm (not RMSNorm),
biased linears throughout, GELU `c_fc`/`c_proj` MLP, optional sliding window
(HF `Starcoder2ForCausalLM` semantics). Linear tags: self_attn.{q,k,v,o}_proj
+ mlp.{c_fc,c_proj}."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..nn.linear import Linear
from . import llama
from .llama import KVCache, _attention, _update_stacked_cache, init_cache  # noqa: F401
from .phi import layer_norm


@dataclasses.dataclass(frozen=True)
class Starcoder2Config(llama.LlamaConfig):
    vocab_size: int = 49152
    hidden_size: int = 3072
    intermediate_size: int = 12288
    num_hidden_layers: int = 30
    num_attention_heads: int = 24
    num_key_value_heads: int = 2
    rope_theta: float = 100000.0
    sliding_window: Optional[int] = 4096
    norm_epsilon: float = 1e-5
    tie_word_embeddings: bool = True

    @classmethod
    def from_hf(cls, hf: dict) -> "Starcoder2Config":
        return cls(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            num_key_value_heads=hf.get("num_key_value_heads",
                                       hf["num_attention_heads"]),
            max_position_embeddings=hf.get("max_position_embeddings", 4096),
            rope_theta=hf.get("rope_theta", 100000.0),
            sliding_window=hf.get("sliding_window"),
            norm_epsilon=hf.get("norm_epsilon", 1e-5),
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "Starcoder2Config":
        return cls(
            vocab_size=vocab_size, hidden_size=256, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512, sliding_window=None,
        )


def init_params(cfg: Starcoder2Config, key: Array, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8 + 8 * cfg.num_hidden_layers))
    d, f = cfg.hidden_size, cfg.intermediate_size
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_

    def lin(o, i):
        w = jax.random.normal(next(ks), (o, i), jnp.float32) / jnp.sqrt(i)
        return Linear(weight=w.astype(dtype), bias=jnp.zeros((o,), dtype))

    def ln(n):
        return {"weight": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append({
            "self_attn": {
                "q_proj": lin(nh * hd, d), "k_proj": lin(nkv * hd, d),
                "v_proj": lin(nkv * hd, d), "o_proj": lin(d, nh * hd),
            },
            "mlp": {"c_fc": lin(f, d), "c_proj": lin(d, f)},
            "input_layernorm": ln(d),
            "post_attention_layernorm": ln(d),
        })
    return {
        "embed_tokens": (jax.random.normal(next(ks), (cfg.vocab_size, d),
                                           jnp.float32) * 0.02).astype(dtype),
        "layers": layers,
        "norm": ln(d),
    }


def forward(
    params: dict,
    cfg: Starcoder2Config,
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
        h = layer_norm(x, layer["input_layernorm"], cfg.norm_epsilon)
        if cache is None:
            attn_out = llama._attention_nocache(layer["self_attn"], cfg, h,
                                                mask, cos, sin)
        else:
            attn_out, k_all, v_all = _attention(
                layer["self_attn"], cfg, h, k_all, v_all, i, start_pos,
                mask, cos, sin,
            )
        x = x + attn_out
        h = layer_norm(x, layer["post_attention_layernorm"], cfg.norm_epsilon)
        m = layer["mlp"]
        x = x + m["c_proj"](jax.nn.gelu(m["c_fc"](h), approximate=True))

    x = layer_norm(x, params["norm"], cfg.norm_epsilon)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                            preferred_element_type=jnp.float32)
    else:
        logits = params["lm_head"](x).astype(jnp.float32)
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def params_from_hf_state_dict(state, cfg: Starcoder2Config, dtype=jnp.float32) -> dict:
    import numpy as np

    def arr(name):
        x = state[name]
        if hasattr(x, "detach"):
            x = x.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(x), dtype)

    def lin(prefix):
        b = f"{prefix}.bias"
        return Linear(weight=arr(f"{prefix}.weight"),
                      bias=arr(b) if b in state else None)

    def ln(prefix):
        return {"weight": arr(f"{prefix}.weight"), "bias": arr(f"{prefix}.bias")}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        layers.append({
            "self_attn": {k: lin(f"{p}.self_attn.{k}")
                          for k in ("q_proj", "k_proj", "v_proj", "o_proj")},
            "mlp": {"c_fc": lin(f"{p}.mlp.c_fc"), "c_proj": lin(f"{p}.mlp.c_proj")},
            "input_layernorm": ln(f"{p}.input_layernorm"),
            "post_attention_layernorm": ln(f"{p}.post_attention_layernorm"),
        })
    out = {
        "embed_tokens": arr("model.embed_tokens.weight"),
        "layers": layers,
        "norm": ln("model.norm"),
    }
    if "lm_head.weight" in state and not cfg.tie_word_embeddings:
        out["lm_head"] = lin("lm_head")
    return out
