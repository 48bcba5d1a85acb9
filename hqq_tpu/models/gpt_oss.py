# SPDX-License-Identifier: Apache-2.0
"""GPT-OSS (openai/gpt-oss-20b/120b) decoder: attention sinks, alternating
sliding/full layers, YaRN rope, clamped-SwiGLU MoE with expert biases.

19th family. Architectural deltas (HF `GptOssForCausalLM`):
  * per-head attention SINKS: an extra learned logit joins each softmax and
    its probability mass is dropped — heads can "attend to nothing";
  * layer_types alternate sliding_attention (window 128) / full_attention;
  * YaRN rope scaling (`llama._rope_params` handles it);
  * MoE experts store INTERLEAVED gate/up columns in one `gate_up_proj`
    [E, 2F, D] with per-expert biases, activation
    `(up + 1) · gate·σ(1.702·gate)` with ±limit clamps; the router biases
    its logits and softmaxes over the top-k (identical to renormalized
    full-softmax top-k — what `nn.moe.moe_dispatch` computes);
  * attention projections carry biases.
The 20B model at 4-bit (~10.5 GB + MoE meta) targets a single v5e chip.
"""

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
    "GptOssConfig",
    "init_params",
    "forward",
    "init_cache",
    "quantize_gpt_oss",
    "params_from_hf_state_dict",
]


@dataclass(frozen=True)
class GptOssConfig(llama.LlamaConfig):
    num_local_experts: int = 4
    num_experts_per_tok: int = 2
    layer_types: Optional[tuple] = None  # fallback: even layers sliding
    swiglu_alpha: float = 1.702
    swiglu_limit: float = 7.0
    capacity_factor: float = 2.0
    # Expert-parallel axis (see mixtral.MixtralConfig.ep_axis): set by
    # `parallel.tp.prepare_tp` when expert stacks shard over the mesh.
    ep_axis: Optional[str] = None

    def __post_init__(self):
        super().__post_init__()
        if isinstance(self.layer_types, list):
            object.__setattr__(self, "layer_types", tuple(self.layer_types))

    def layer_is_sliding(self, i: int) -> bool:
        if self.layer_types is not None:
            return self.layer_types[i] == "sliding_attention"
        return i % 2 == 0

    @classmethod
    def from_hf(cls, hf: dict) -> "GptOssConfig":
        base = llama.LlamaConfig.from_hf(hf)
        base = dataclasses.replace(base, attention_bias=hf.get("attention_bias", True))
        return cls(
            **dataclasses.asdict(base),
            num_local_experts=hf.get("num_local_experts", 4),
            num_experts_per_tok=hf.get("num_experts_per_tok", 2),
            layer_types=tuple(hf.get("layer_types") or ()) or None,
            swiglu_limit=hf.get("swiglu_limit", 7.0),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "GptOssConfig":
        return cls(
            vocab_size=vocab_size,
            hidden_size=128,
            intermediate_size=64,  # expert width
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=32,
            max_position_embeddings=256,
            sliding_window=16,
            num_local_experts=4,
            num_experts_per_tok=2,
            layer_types=("sliding_attention", "full_attention"),
            attention_bias=True,
        )


def init_cache(cfg: GptOssConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    return llama.init_cache(cfg, batch, max_len, dtype)


def _sink_softmax(scores: Array, sinks: Array) -> Array:
    """softmax over [scores, per-head sink logit], sink column dropped.

    scores: [B, nh, T, S] (mask already added); sinks: [nh]."""
    sink = sinks.reshape(1, -1, 1, 1).astype(jnp.float32)
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sink)
    num = jnp.exp(scores - m)
    den = jnp.sum(num, axis=-1, keepdims=True) + jnp.exp(sink - m)
    return num / den


def _attention(layer, cfg, x, k_all, v_all, layer_idx, start_pos, mask, cos, sin,
               cached: bool):
    b, t, d = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    q = layer["q_proj"](x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = layer["k_proj"](x).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    v = layer["v_proj"](x).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    q = llama._apply_rope(q, cos, sin)
    k = llama._apply_rope(k, cos, sin)
    if cached:
        k_all, v_all = llama._update_stacked_cache(
            k_all, v_all, layer_idx, k, v, start_pos
        )
        keys, vals = k_all[layer_idx], v_all[layer_idx]
    else:
        keys, vals = k, v
    rep = nh // nkv
    if rep > 1:
        keys = jnp.repeat(keys, rep, axis=1)
        vals = jnp.repeat(vals, rep, axis=1)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, keys,
                        preferred_element_type=jnp.float32) / jnp.sqrt(hd)
    probs = _sink_softmax(scores + mask, layer["sinks"]).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, vals)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    return layer["o_proj"](out), k_all, v_all


def _moe_block(block: dict, cfg: GptOssConfig, x: Array) -> Array:
    """Clamped-SwiGLU MoE with interleaved gate/up and expert biases."""
    b, t, d = x.shape
    xf = x.reshape(b * t, d)
    router_logits = block["router"](xf).astype(jnp.float32)
    probs = jax.nn.softmax(router_logits, axis=-1)
    # moe_dispatch renormalizes the kept top-k — identical to gpt-oss'
    # softmax over the top-k logits
    e, k = cfg.num_local_experts, cfg.num_experts_per_tok
    capacity = max(int(-(-(b * t * k / e * cfg.capacity_factor) // 1)), 1)
    dispatch, combine = moe_dispatch(probs, k, capacity)

    # Expert parallelism inside shard_map (see mixtral._moe_block); the
    # gate_up/down bias arrays shard their leading E axis alongside the stacks
    e_local = block["experts"]["gate_up_proj"].n_experts
    ep = cfg.ep_axis is not None and e_local != e
    if ep:
        off = jax.lax.axis_index(cfg.ep_axis) * e_local
        dispatch = jax.lax.dynamic_slice_in_dim(dispatch, off, e_local, axis=1)
        combine = jax.lax.dynamic_slice_in_dim(combine, off, e_local, axis=1)

    expert_in = jnp.einsum("tec,td->ecd", dispatch.astype(xf.dtype), xf)

    gu = block["experts"]["gate_up_proj"](expert_in)  # [E, C, 2F]
    gu = (gu.astype(jnp.float32) + block["gate_up_bias"][:, None, :])
    gate, up = gu[..., 0::2], gu[..., 1::2]  # INTERLEAVED columns
    limit = cfg.swiglu_limit
    gate = jnp.clip(gate, max=limit)
    up = jnp.clip(up, min=-limit, max=limit)
    glu = gate * jax.nn.sigmoid(gate * cfg.swiglu_alpha)
    h = ((up + 1.0) * glu).astype(xf.dtype)
    out_e = block["experts"]["down_proj"](h).astype(jnp.float32)
    out_e = out_e + block["down_bias"][:, None, :]
    out = jnp.einsum("tec,ecd->td", combine.astype(jnp.float32), out_e)
    if ep:
        out = jax.lax.psum(out, cfg.ep_axis)
    return out.reshape(b, t, d).astype(x.dtype)


def forward(
    params: dict,
    cfg: GptOssConfig,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos=0,
    kv_valid: Optional[Array] = None,
    page_indices: Optional[Array] = None,
) -> Tuple[Array, Optional[KVCache]]:
    from ..ops.paged import PagedKVCache

    if isinstance(cache, PagedKVCache):
        return _forward_paged(params, cfg, tokens, cache,
                              jnp.asarray(start_pos), page_indices)
    b, t = tokens.shape
    x = jnp.take(params["embed_tokens"], tokens, axis=0)

    cache_len = None if cache is None else cache.max_len
    cfg_full = dataclasses.replace(cfg, sliding_window=None)
    _, cos, sin, mask_full = llama.positions_and_masks(
        cfg_full, t, start_pos, cache_len, kv_valid
    )
    _, _, _, mask_sliding = llama.positions_and_masks(
        cfg, t, start_pos, cache_len, kv_valid
    )

    k_all = cache.k if cache is not None else None
    v_all = cache.v if cache is not None else None
    for i, layer in enumerate(params["layers"]):
        mask = mask_sliding if cfg.layer_is_sliding(i) else mask_full
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, k_all, v_all = _attention(
            layer["self_attn"], cfg, h, k_all, v_all, i, start_pos,
            mask, cos, sin, cached=cache is not None,
        )
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + _moe_block(layer["mlp"], cfg, h)

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                            preferred_element_type=jnp.float32)
    else:
        logits = params["lm_head"](x).astype(jnp.float32)
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def _forward_paged(params, cfg, tokens, cache, lengths, page_indices):
    """Paged decode step (sinks + per-layer windows via the gather path)."""
    from ..ops.paged import paged_attn, write_token_to_pages

    toks = tokens if tokens.ndim == 2 else tokens[:, None]
    b, t = toks.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    x = jnp.take(params["embed_tokens"], toks, axis=0)
    _, cos, sin, _ = llama.positions_and_masks(cfg, t, lengths, None)
    pg = cache.page_size
    pos_bt = lengths[:, None] + jnp.arange(t)[None, :]
    page_of = jnp.take_along_axis(page_indices, pos_bt // pg, axis=1)
    offset = pos_bt % pg

    for i, layer in enumerate(params["layers"]):
        sa = layer["self_attn"]
        window = cfg.sliding_window if cfg.layer_is_sliding(i) else None
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        q = sa["q_proj"](h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = sa["k_proj"](h).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
        v = sa["v_proj"](h).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
        q = llama._apply_rope(q, cos, sin)
        k = llama._apply_rope(k, cos, sin)
        # T>1 (speculative verify window): write all rows, then query j
        # attends keys < lengths+j+1 (see llama._attention_paged)
        kw = k.transpose(0, 2, 1, 3).reshape(b * t, nkv, hd)
        vw = v.transpose(0, 2, 1, 3).reshape(b * t, nkv, hd)
        cache = write_token_to_pages(cache, i, kw, vw,
                                     page_of.reshape(-1), offset.reshape(-1))
        qdt = jnp.float32 if cache.quantized else cache.k.dtype
        qd = (q * (hd**-0.5)).astype(qdt)
        attn = jnp.stack(
            [
                paged_attn(qd[:, :, j], cache, i, lengths + j + 1, page_indices,
                           window=window, sinks=sa["sinks"])
                for j in range(t)
            ],
            axis=1,
        )
        x = x + sa["o_proj"](attn.reshape(b, t, nh * hd).astype(x.dtype))
        h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + _moe_block(layer["mlp"], cfg, h)

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                            preferred_element_type=jnp.float32)
    else:
        logits = params["lm_head"](x).astype(jnp.float32)
    return logits, cache


def init_params(cfg: GptOssConfig, key: Array, dtype=jnp.bfloat16) -> dict:
    d, f, e = cfg.hidden_size, cfg.intermediate_size, cfg.num_local_experts
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    keys = iter(jax.random.split(key, 4 + 8 * cfg.num_hidden_layers))

    def lin(out_f, in_f, bias=True):
        w = jax.random.normal(next(keys), (out_f, in_f), jnp.float32)
        return Linear(weight=(w / jnp.sqrt(in_f)).astype(dtype),
                      bias=jnp.zeros((out_f,), dtype) if bias else None)

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append({
            "self_attn": {
                "q_proj": lin(nh * hd, d),
                "k_proj": lin(nkv * hd, d),
                "v_proj": lin(nkv * hd, d),
                "o_proj": lin(d, nh * hd),
                "sinks": jnp.zeros((nh,), dtype),
            },
            "mlp": {
                "router": lin(e, d),
                "experts": {
                    "gate_up_proj": GroupedLinear(
                        weight=(jax.random.normal(next(keys), (e, 2 * f, d), jnp.float32)
                                / jnp.sqrt(d)).astype(dtype)),
                    "down_proj": GroupedLinear(
                        weight=(jax.random.normal(next(keys), (e, d, f), jnp.float32)
                                / jnp.sqrt(f)).astype(dtype)),
                },
                "gate_up_bias": jnp.zeros((e, 2 * f), jnp.float32),
                "down_bias": jnp.zeros((e, d), jnp.float32),
            },
            "input_layernorm": jnp.ones((d,), dtype),
            "post_attention_layernorm": jnp.ones((d,), dtype),
        })
    embed = (jax.random.normal(next(keys), (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype)
    params = {"embed_tokens": embed, "layers": layers, "norm": jnp.ones((d,), dtype)}
    if not cfg.tie_word_embeddings:
        params["lm_head"] = lin(cfg.vocab_size, d, bias=False)
    return params


def quantize_gpt_oss(
    params: dict,
    attn_config: Optional[dict] = None,
    expert_config: Optional[dict] = None,
    compute_dtype=jnp.bfloat16,
) -> dict:
    """Quantize attention + stacked experts; router and sinks stay fp."""
    from ..core.quantize import BaseQuantizeConfig
    from .base import quantize_model

    attn_config = attn_config or BaseQuantizeConfig(nbits=4, group_size=64)
    expert_config = expert_config or BaseQuantizeConfig(nbits=4, group_size=64)
    ewqp = expert_config["weight_quant_params"]
    out = quantize_model(
        params, attn_config, compute_dtype, ignore=("lm_head", "mlp.router")
    )
    for layer in out["layers"]:
        experts = layer["mlp"]["experts"]
        for name in ("gate_up_proj", "down_proj"):
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


def params_from_hf_state_dict(state, cfg: GptOssConfig, dtype=jnp.bfloat16) -> dict:
    """Map HF `GptOssForCausalLM` weights (experts input-major, transposed
    here to the stacked [E, out, in] convention; interleaved gate/up kept)."""
    import numpy as np

    def arr(name, d=dtype):
        x = state[name]
        if hasattr(x, "detach"):
            x = x.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(x), d)

    def lin(prefix):
        b = prefix + ".bias"
        return Linear(weight=arr(prefix + ".weight"),
                      bias=arr(b) if b in state else None)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        sa = {f"{t}_proj": lin(f"{p}.self_attn.{t}_proj") for t in "qkvo"}
        sa["sinks"] = arr(f"{p}.self_attn.sinks")
        mlp = {
            "router": Linear(weight=arr(f"{p}.mlp.router.weight"),
                             bias=arr(f"{p}.mlp.router.bias")),
            "experts": {
                # HF stores [E, D, 2F]/[E, F, D] input-major
                "gate_up_proj": GroupedLinear(
                    weight=jnp.swapaxes(arr(f"{p}.mlp.experts.gate_up_proj"), 1, 2)),
                "down_proj": GroupedLinear(
                    weight=jnp.swapaxes(arr(f"{p}.mlp.experts.down_proj"), 1, 2)),
            },
            "gate_up_bias": arr(f"{p}.mlp.experts.gate_up_proj_bias", jnp.float32),
            "down_bias": arr(f"{p}.mlp.experts.down_proj_bias", jnp.float32),
        }
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
