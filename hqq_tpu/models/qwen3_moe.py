# SPDX-License-Identifier: Apache-2.0
"""Qwen3-MoE decoder: qwen3 attention (per-head q/k RMSNorm) + sparse MoE MLP.

16th family. The reference covers Qwen models through generic transformers
patching (`/root/reference/hqq/models/hf/`) and MoE through the aria
grouped-GEMM path (`utils/aria.py`); here both combine natively: attention
reuses `llama._attention` (q/k-norm via the `q_norm`/`k_norm` layer keys) and
experts are stacked `GroupedQuantLinear`s with GShard capacity dispatch
(`nn/moe.py`) — expert-parallel-shardable along E like Mixtral.

HF naming: router `mlp.gate`, experts `mlp.experts.{e}.{gate,up,down}_proj`
with `moe_intermediate_size` hidden width; `mlp_only_layers` lists dense
layers (empty by default)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..nn.linear import Linear
from ..nn.moe import GroupedLinear, moe_dispatch, quantize_grouped
from . import llama
from .llama import KVCache, rms_norm

__all__ = [
    "Qwen3MoeConfig",
    "init_params",
    "forward",
    "init_cache",
    "quantize_qwen3_moe",
    "params_from_hf_state_dict",
]


@dataclass(frozen=True)
class Qwen3MoeConfig(llama.LlamaConfig):
    num_experts: int = 8
    num_experts_per_tok: int = 2
    moe_intermediate_size: int = 256
    mlp_only_layers: tuple = ()
    capacity_factor: float = 2.0
    # Expert-parallel axis (see mixtral.MixtralConfig.ep_axis): set by
    # `parallel.tp.prepare_tp` when expert stacks shard over the mesh.
    ep_axis: Optional[str] = None

    def __post_init__(self):
        if isinstance(self.mlp_only_layers, list):
            object.__setattr__(self, "mlp_only_layers", tuple(self.mlp_only_layers))

    @classmethod
    def from_hf(cls, hf: dict) -> "Qwen3MoeConfig":
        base = llama.LlamaConfig.from_hf(hf)
        return cls(
            **dataclasses.asdict(base),
            num_experts=hf.get("num_experts", 8),
            num_experts_per_tok=hf.get("num_experts_per_tok", 2),
            moe_intermediate_size=hf.get("moe_intermediate_size", 256),
            mlp_only_layers=tuple(hf.get("mlp_only_layers", ()) or ()),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "Qwen3MoeConfig":
        return cls(
            vocab_size=vocab_size,
            hidden_size=128,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=32,
            max_position_embeddings=256,
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=64,
        )


def init_cache(cfg: Qwen3MoeConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    return llama.init_cache(cfg, batch, max_len, dtype)


def init_params(cfg: Qwen3MoeConfig, key: Array, dtype=jnp.bfloat16) -> dict:
    base = llama.init_params(
        dataclasses.replace(cfg, intermediate_size=8), key, dtype
    )  # attention/norms/embeds; dummy mlp replaced below
    d, f, e = cfg.hidden_size, cfg.moe_intermediate_size, cfg.num_experts
    hd = cfg.head_dim_
    keys = jax.random.split(jax.random.fold_in(key, 999), 4 * cfg.num_hidden_layers)

    for i, layer in enumerate(base["layers"]):
        layer["self_attn"]["q_norm"] = jnp.ones((hd,), dtype)
        layer["self_attn"]["k_norm"] = jnp.ones((hd,), dtype)
        k0, k1, k2, k3 = keys[4 * i : 4 * i + 4]
        if i in cfg.mlp_only_layers:
            continue  # keep the dense llama mlp
        layer["mlp"] = {
            "gate": Linear(
                weight=(jax.random.normal(k0, (e, d), jnp.float32) / jnp.sqrt(d)).astype(dtype)
            ),
            "experts": {
                "gate_proj": GroupedLinear(
                    weight=(jax.random.normal(k1, (e, f, d), jnp.float32) / jnp.sqrt(d)).astype(dtype)
                ),
                "up_proj": GroupedLinear(
                    weight=(jax.random.normal(k2, (e, f, d), jnp.float32) / jnp.sqrt(d)).astype(dtype)
                ),
                "down_proj": GroupedLinear(
                    weight=(jax.random.normal(k3, (e, d, f), jnp.float32) / jnp.sqrt(f)).astype(dtype)
                ),
            },
        }
    return base


def _moe_block(block: dict, cfg: Qwen3MoeConfig, x: Array) -> Array:
    """x: [B, T, D] -> [B, T, D] via top-k routed experts (renormalized
    routing weights — HF `norm_topk_prob=True` convention)."""
    b, t, d = x.shape
    xf = x.reshape(b * t, d)
    router_logits = block["gate"](xf).astype(jnp.float32)
    probs = jax.nn.softmax(router_logits, axis=-1)

    e = cfg.num_experts
    k = cfg.num_experts_per_tok
    capacity = max(int(-(-(b * t * k / e * cfg.capacity_factor) // 1)), 1)

    dispatch, combine = moe_dispatch(probs, k, capacity)

    w_g, w_u, w_d = (block["experts"][n] for n in ("gate_proj", "up_proj", "down_proj"))
    # Expert parallelism inside shard_map (see mixtral._moe_block)
    e_local = w_g.n_experts
    ep = cfg.ep_axis is not None and e_local != e
    if ep:
        off = jax.lax.axis_index(cfg.ep_axis) * e_local
        dispatch = jax.lax.dynamic_slice_in_dim(dispatch, off, e_local, axis=1)
        combine = jax.lax.dynamic_slice_in_dim(combine, off, e_local, axis=1)

    expert_in = jnp.einsum("tec,td->ecd", dispatch.astype(xf.dtype), xf)
    h = jax.nn.silu(w_g(expert_in)) * w_u(expert_in)
    expert_out = w_d(h)

    out = jnp.einsum("tec,ecd->td", combine.astype(jnp.float32),
                     expert_out.astype(jnp.float32))
    if ep:
        out = jax.lax.psum(out, cfg.ep_axis)
    return out.reshape(b, t, d).astype(x.dtype)


def forward(
    params: dict,
    cfg: Qwen3MoeConfig,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos: int | Array = 0,
    kv_valid: Optional[Array] = None,
    page_indices: Optional[Array] = None,
) -> Tuple[Array, Optional[KVCache]]:
    """Same contract as `llama.forward` (incl. paged decode) with the sparse
    MoE block as the MLP."""
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
        if "experts" in layer["mlp"]:
            x = x + _moe_block(layer["mlp"], cfg, h)
        else:
            x = x + llama._mlp(layer["mlp"], h)

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
    """Paged decode step (cache polymorphism; see llama._forward_paged)."""
    toks = tokens if tokens.ndim == 2 else tokens[:, None]
    x = jnp.take(params["embed_tokens"], toks, axis=0)
    _, cos, sin, _ = llama.positions_and_masks(cfg, toks.shape[1], lengths, None)
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, cache = llama._attention_paged(
            layer["self_attn"], cfg, h, cache, i, lengths, page_indices, cos, sin,
        )
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        if "experts" in layer["mlp"]:
            x = x + _moe_block(layer["mlp"], cfg, h)
        else:
            x = x + llama._mlp(layer["mlp"], h)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                            preferred_element_type=jnp.float32)
    else:
        logits = params["lm_head"](x).astype(jnp.float32)
    return logits, cache


def quantize_qwen3_moe(
    params: dict,
    attn_config: Optional[dict] = None,
    expert_config: Optional[dict] = None,
    compute_dtype=jnp.bfloat16,
) -> dict:
    """Quantize attention + stacked experts; the router stays fp
    (≙ mixtral's gate handling, ref `models/hf/mixtral.py:12-30`)."""
    from ..core.quantize import BaseQuantizeConfig
    from .base import quantize_model

    attn_config = attn_config or BaseQuantizeConfig(nbits=4, group_size=64)
    expert_config = expert_config or BaseQuantizeConfig(nbits=4, group_size=64)
    ewqp = expert_config["weight_quant_params"]

    out = quantize_model(
        params, attn_config, compute_dtype, ignore=("lm_head", "mlp.gate")
    )
    for layer in out["layers"]:
        mlp = layer["mlp"]
        if "experts" not in mlp:
            continue
        for name in ("gate_proj", "up_proj", "down_proj"):
            gl = mlp["experts"][name]
            if isinstance(gl, GroupedLinear):
                mlp["experts"][name] = quantize_grouped(
                    gl.weight,
                    nbits=ewqp["nbits"],
                    group_size=ewqp["group_size"],
                    axis=ewqp["axis"],
                    round_zero=ewqp["round_zero"],
                    compute_dtype=compute_dtype,
                )
    return out


def params_from_hf_state_dict(state, cfg: Qwen3MoeConfig, dtype=jnp.bfloat16) -> dict:
    """Convert a HF `Qwen3MoeForCausalLM` state dict to the functional tree."""
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
        sa["q_norm"] = arr(f"{p}.self_attn.q_norm.weight")
        sa["k_norm"] = arr(f"{p}.self_attn.k_norm.weight")
        if f"{p}.mlp.gate.weight" in state:
            mlp = {
                "gate": lin(f"{p}.mlp.gate"),
                "experts": {
                    w: GroupedLinear(
                        weight=jnp.stack([
                            arr(f"{p}.mlp.experts.{e}.{w}.weight")
                            for e in range(cfg.num_experts)
                        ])
                    )
                    for w in ("gate_proj", "up_proj", "down_proj")
                },
            }
        else:  # dense (mlp_only_layers) layer
            mlp = {f"{t}_proj": lin(f"{p}.mlp.{t}_proj")
                   for t in ("gate", "up", "down")}
        layers.append({
            "self_attn": sa,
            "mlp": mlp,
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
