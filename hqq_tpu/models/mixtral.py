# SPDX-License-Identifier: Apache-2.0
"""Mixtral (sparse MoE) decoder in pure functional JAX.

≙ `/root/reference/hqq/models/hf/mixtral.py`: Llama-shaped attention plus a
block-sparse MoE MLP with top-2 routing; the router ("gate") stays
full-precision while the experts quantize (ref `:12-30` keeps gate in
_IGNORE-style fp16). Where the reference loops over 8 expert modules in
Python (`:63-83`), experts here are stacked `GroupedQuantLinear`s computed by
one batched dequant-einsum with GShard capacity dispatch (see
`hqq_tpu/nn/moe.py`) — static shapes, MXU-batched, expert-parallel-shardable
along E.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..nn.linear import Linear
from ..nn.moe import GroupedLinear, GroupedQuantLinear, moe_dispatch, quantize_grouped
from . import llama
from .llama import KVCache, rms_norm

__all__ = [
    "MixtralConfig",
    "init_params",
    "forward",
    "init_cache",
    "quantize_mixtral",
    "params_from_hf_state_dict",
]


@dataclass(frozen=True)
class MixtralConfig(llama.LlamaConfig):
    num_local_experts: int = 8
    num_experts_per_tok: int = 2
    capacity_factor: float = 2.0  # >= E/top_k drops nothing
    # Expert-parallel axis name when running inside shard_map with the expert
    # stack sharded over a mesh axis (set by `parallel.tp.prepare_tp`); the
    # MoE block then computes only its local experts and psums the combine.
    ep_axis: Optional[str] = None

    @classmethod
    def from_hf(cls, hf: dict) -> "MixtralConfig":
        base = llama.LlamaConfig.from_hf(hf)
        return cls(
            **dataclasses.asdict(base),
            num_local_experts=hf.get("num_local_experts", 8),
            num_experts_per_tok=hf.get("num_experts_per_tok", 2),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "MixtralConfig":
        return cls(
            vocab_size=vocab_size,
            hidden_size=128,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=256,
            num_local_experts=4,
            num_experts_per_tok=2,
        )


def init_cache(cfg: MixtralConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    return llama.init_cache(cfg, batch, max_len, dtype)


def init_params(cfg: MixtralConfig, key: Array, dtype=jnp.bfloat16) -> dict:
    base = llama.init_params(
        dataclasses.replace(cfg, intermediate_size=8), key, dtype
    )  # attention/norms/embeds; dummy mlp replaced below
    d, f, e = cfg.hidden_size, cfg.intermediate_size, cfg.num_local_experts
    keys = jax.random.split(jax.random.fold_in(key, 999), 4 * cfg.num_hidden_layers)

    for i, layer in enumerate(base["layers"]):
        k0, k1, k2, k3 = keys[4 * i : 4 * i + 4]
        layer.pop("mlp")
        layer["block_sparse_moe"] = {
            "gate": Linear(
                weight=(jax.random.normal(k0, (e, d), jnp.float32) / jnp.sqrt(d)).astype(dtype)
            ),
            "experts": {
                # HF Mixtral naming: w1=gate, w3=up ([f, d]), w2=down ([d, f])
                "w1": GroupedLinear(
                    weight=(jax.random.normal(k1, (e, f, d), jnp.float32) / jnp.sqrt(d)).astype(dtype)
                ),
                "w2": GroupedLinear(
                    weight=(jax.random.normal(k2, (e, d, f), jnp.float32) / jnp.sqrt(f)).astype(dtype)
                ),
                "w3": GroupedLinear(
                    weight=(jax.random.normal(k3, (e, f, d), jnp.float32) / jnp.sqrt(d)).astype(dtype)
                ),
            },
        }
    return base


def _moe_block(block: dict, cfg: MixtralConfig, x: Array) -> Array:
    """x: [B, T, D] -> [B, T, D] via top-k routed experts."""
    b, t, d = x.shape
    xf = x.reshape(b * t, d)
    router_logits = block["gate"](xf).astype(jnp.float32)  # [BT, E]
    probs = jax.nn.softmax(router_logits, axis=-1)

    e = cfg.num_local_experts
    k = cfg.num_experts_per_tok
    capacity = int(np_ceil(b * t * k / e * cfg.capacity_factor))
    capacity = max(capacity, 1)

    dispatch, combine = moe_dispatch(probs, k, capacity)  # [BT, E, C]

    w1, w2, w3 = (block["experts"][n] for n in ("w1", "w2", "w3"))
    # Expert parallelism (inside shard_map): the stacked weights are local
    # [E/ep, ...]; route only the local experts' slots and psum the combine.
    e_local = w1.n_experts
    ep = cfg.ep_axis is not None and e_local != e
    if ep:
        off = jax.lax.axis_index(cfg.ep_axis) * e_local
        dispatch = jax.lax.dynamic_slice_in_dim(dispatch, off, e_local, axis=1)
        combine = jax.lax.dynamic_slice_in_dim(combine, off, e_local, axis=1)

    expert_in = jnp.einsum("tec,td->ecd", dispatch.astype(xf.dtype), xf)
    h = jax.nn.silu(w1(expert_in)) * w3(expert_in)  # [E, C, F]
    expert_out = w2(h)  # [E, C, D]

    out = jnp.einsum("tec,ecd->td", combine.astype(jnp.float32), expert_out.astype(jnp.float32))
    if ep:
        out = jax.lax.psum(out, cfg.ep_axis)
    return out.reshape(b, t, d).astype(x.dtype)


def np_ceil(x: float) -> int:
    return int(-(-x // 1))


def forward(
    params: dict,
    cfg: MixtralConfig,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos: int | Array = 0,
    kv_valid: Optional[Array] = None,
    page_indices: Optional[Array] = None,
) -> Tuple[Array, Optional[KVCache]]:
    """Same contract as `llama.forward` (incl. paged decode — the reference's
    flagship MoE, `/root/reference/examples/models/mixtral_13GB_example.py`,
    serves on the paged engine), with the MoE block as the MLP."""
    from ..ops.paged import PagedKVCache

    if isinstance(cache, PagedKVCache):
        return _forward_paged(params, cfg, tokens, cache,
                              jnp.asarray(start_pos), page_indices)
    b, t = tokens.shape
    x = jnp.take(params["embed_tokens"], tokens, axis=0)

    _, cos, sin, mask = llama.positions_and_masks(
        cfg, t, start_pos, None if cache is None else cache.max_len, kv_valid
    )

    k_all = cache.k if cache is not None else None
    v_all = cache.v if cache is not None else None
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        if cache is None:
            attn_out = llama._attention_nocache(
                layer["self_attn"], cfg, h, mask, cos, sin
            )
        else:
            attn_out, k_all, v_all = llama._attention(
                layer["self_attn"], cfg, h, k_all, v_all, i,
                start_pos, mask, cos, sin,
            )
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + _moe_block(layer["block_sparse_moe"], cfg, h)

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.einsum(
            "btd,vd->btv", x, params["embed_tokens"], preferred_element_type=jnp.float32
        )
    else:
        logits = params["lm_head"](x).astype(jnp.float32)

    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def _forward_paged(params, cfg, tokens, cache, lengths, page_indices):
    """Paged decode step: llama's cache-polymorphic walk with the sparse-MoE
    block injected (no duplicated forward to keep in sync)."""
    return llama._forward_paged(
        params, cfg, tokens, cache, lengths, page_indices,
        mlp_fn=lambda layer, h: _moe_block(layer["block_sparse_moe"], cfg, h),
    )


def quantize_mixtral(
    params: dict,
    attn_config: Optional[dict] = None,
    expert_config: Optional[dict] = None,
    compute_dtype=jnp.bfloat16,
) -> dict:
    """Quantize attention (per-tag config) + stacked experts; the router gate
    stays full-precision (≙ ref mixtral example `mixtral_13GB_example.py`:
    4-bit attention + 3/2-bit experts mixed configs are expressed by passing
    different expert_config)."""
    from ..core.quantize import BaseQuantizeConfig
    from .base import quantize_model

    attn_config = attn_config or BaseQuantizeConfig(nbits=4, group_size=64)
    expert_config = expert_config or BaseQuantizeConfig(nbits=4, group_size=64)
    ewqp = expert_config["weight_quant_params"]

    # the router gate stays fp (≙ ref `models/hf/mixtral.py:12-30`)
    out = quantize_model(
        params, attn_config, compute_dtype,
        ignore=("lm_head", "block_sparse_moe.gate"),
    )
    for layer in out["layers"]:
        experts = layer["block_sparse_moe"]["experts"]
        for name in ("w1", "w2", "w3"):
            gl = experts[name]
            if isinstance(gl, GroupedLinear):
                experts[name] = quantize_grouped(
                    gl.weight,
                    nbits=ewqp["nbits"],
                    group_size=ewqp["group_size"],
                    axis=ewqp["axis"],
                    round_zero=ewqp["round_zero"],
                    compute_dtype=compute_dtype,
                )
    return out


def params_from_hf_state_dict(state, cfg: MixtralConfig, dtype=jnp.bfloat16) -> dict:
    """Convert a HF Mixtral state dict to the functional pytree."""
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
        experts = {
            w: GroupedLinear(
                weight=jnp.stack([
                    arr(f"{p}.block_sparse_moe.experts.{e}.{w}.weight")
                    for e in range(cfg.num_local_experts)
                ])
            )
            for w in ("w1", "w2", "w3")
        }
        layers.append({
            "self_attn": {
                f"{t}_proj": lin(f"{p}.self_attn.{t}_proj") for t in "qkvo"
            },
            "block_sparse_moe": {
                "gate": lin(f"{p}.block_sparse_moe.gate"),
                "experts": experts,
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
