# SPDX-License-Identifier: Apache-2.0
"""GPT-2 family (gpt2 .. gpt2-xl, DistilGPT2, DialoGPT, CodeParrot, ...).

The reference quantizes GPT-2 through its generic HF patching; here it is a
functional family (≙ HF `modeling_gpt2.py`). Architectural deltas vs the
llama walk:

* learned absolute position embeddings (`wpe`) added to token embeddings —
  no rotary anything,
* pre-LN blocks with LayerNorm (weight+bias), fused `c_attn` producing
  [q | k | v] along the feature dim,
* HF stores Conv1D weights [in, out] — transposed at load into the
  framework's [out, in] `Linear` so the quantizer groups along input
  features (axis=1) exactly like every other family,
* MLP is c_fc -> gelu_new (tanh approximation) -> c_proj,
* embeddings tied.
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

__all__ = ["GPT2Config", "forward", "init_cache", "init_params",
           "params_from_hf_state_dict"]


@dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    hidden_size: int = 768  # HF: n_embd
    num_hidden_layers: int = 12  # HF: n_layer
    num_attention_heads: int = 12  # HF: n_head
    max_position_embeddings: int = 1024  # HF: n_positions
    layer_norm_epsilon: float = 1e-5
    tie_word_embeddings: bool = True
    # shared-helper compatibility (positions_and_masks builds rope tables
    # unconditionally; GPT-2 ignores them — learned positions only)
    sliding_window: Optional[int] = None
    rope_theta: float = 10000.0

    @property
    def head_dim_(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_key_value_heads(self) -> int:
        return self.num_attention_heads

    @classmethod
    def from_hf(cls, hf: dict) -> "GPT2Config":
        return cls(
            vocab_size=hf["vocab_size"],
            hidden_size=hf.get("n_embd", hf.get("hidden_size", 768)),
            num_hidden_layers=hf.get("n_layer", hf.get("num_hidden_layers", 12)),
            num_attention_heads=hf.get("n_head", hf.get("num_attention_heads", 12)),
            max_position_embeddings=hf.get("n_positions",
                                           hf.get("max_position_embeddings", 1024)),
            layer_norm_epsilon=hf.get("layer_norm_epsilon", 1e-5),
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "GPT2Config":
        return cls(vocab_size=vocab_size, hidden_size=64, num_hidden_layers=2,
                   num_attention_heads=4, max_position_embeddings=128)


def init_cache(cfg: GPT2Config, batch: int, max_len: int, dtype=jnp.bfloat16):
    shape = (cfg.num_hidden_layers, batch, cfg.num_attention_heads, max_len,
             cfg.head_dim_)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def forward(
    params: dict,
    cfg: GPT2Config,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos: "int | Array" = 0,
) -> Tuple[Array, Optional[KVCache]]:
    b, t = tokens.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim_
    eps = cfg.layer_norm_epsilon

    positions, _, _, mask = llama.positions_and_masks(
        cfg, t, start_pos, None if cache is None else cache.max_len
    )
    pos_bt = positions if positions.ndim == 2 else positions[None, :]
    x = (jnp.take(params["wte"], tokens, axis=0)
         + jnp.take(params["wpe"], pos_bt, axis=0))

    k_all = v_all = None
    if cache is not None:
        k_all, v_all = cache.k, cache.v

    for i, layer in enumerate(params["layers"]):
        h = _layer_norm(x, layer["ln_1"], eps)
        qkv = layer["attn"]["c_attn"](h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
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
        x = x + layer["attn"]["c_proj"](
            att.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
        )
        h = _layer_norm(x, layer["ln_2"], eps)
        x = x + layer["mlp"]["c_proj"](
            jax.nn.gelu(layer["mlp"]["c_fc"](h), approximate=True)
        )

    x = _layer_norm(x, params["ln_f"], eps)
    logits = jnp.einsum("btd,vd->btv", x, params["wte"],
                        preferred_element_type=jnp.float32)
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def init_params(cfg: GPT2Config, key: Array, dtype=jnp.bfloat16) -> dict:
    d = cfg.hidden_size
    keys = iter(jax.random.split(key, 3 + 4 * cfg.num_hidden_layers))

    def lin(o, i):
        w = jax.random.normal(next(keys), (o, i), jnp.float32) / jnp.sqrt(i)
        return Linear(weight=w.astype(dtype), bias=jnp.zeros((o,), dtype))

    def ln():
        return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    layers = [
        {
            "ln_1": ln(),
            "attn": {"c_attn": lin(3 * d, d), "c_proj": lin(d, d)},
            "ln_2": ln(),
            "mlp": {"c_fc": lin(4 * d, d), "c_proj": lin(d, 4 * d)},
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    return {
        "wte": (jax.random.normal(next(keys), (cfg.vocab_size, d), jnp.float32)
                * 0.02).astype(dtype),
        "wpe": (jax.random.normal(next(keys),
                                  (cfg.max_position_embeddings, d), jnp.float32)
                * 0.01).astype(dtype),
        "layers": layers,
        "ln_f": ln(),
    }


def params_from_hf_state_dict(state: dict, cfg: GPT2Config, dtype=jnp.bfloat16):
    def arr(name, transpose=False):
        x = state[name]
        if hasattr(x, "detach"):
            x = x.detach().to("cpu").float().numpy()
        x = np.asarray(x)
        if transpose:
            x = np.ascontiguousarray(x.T)
        return jnp.asarray(x, dtype)

    def conv1d(prefix):
        # HF Conv1D stores [in, out]; framework Linear is [out, in]
        return Linear(weight=arr(prefix + ".weight", transpose=True),
                      bias=arr(prefix + ".bias"))

    def ln(prefix):
        return {"weight": arr(prefix + ".weight"), "bias": arr(prefix + ".bias")}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.h.{i}"
        layers.append({
            "ln_1": ln(f"{p}.ln_1"),
            "attn": {"c_attn": conv1d(f"{p}.attn.c_attn"),
                     "c_proj": conv1d(f"{p}.attn.c_proj")},
            "ln_2": ln(f"{p}.ln_2"),
            "mlp": {"c_fc": conv1d(f"{p}.mlp.c_fc"),
                    "c_proj": conv1d(f"{p}.mlp.c_proj")},
        })
    return {
        "wte": arr("transformer.wte.weight"),
        "wpe": arr("transformer.wpe.weight"),
        "layers": layers,
        "ln_f": ln("transformer.ln_f"),
    }
