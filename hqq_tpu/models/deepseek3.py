# SPDX-License-Identifier: Apache-2.0
"""DeepSeek-V3 family — Multi-head Latent Attention (MLA) + fine-grained MoE
with shared experts and group-limited sigmoid routing.

HF `DeepseekV3ForCausalLM` semantics (transformers 4.57):
- MLA: queries optionally low-rank (q_a/q_b + RMSNorm); K/V decompress from a
  `kv_lora_rank` latent (`kv_a_proj_with_mqa` -> RMSNorm -> `kv_b_proj`);
  RoPE applies only to a `qk_rope_head_dim` slice, with the K rope part
  SHARED across heads (multi-query); scores scale by qk_head_dim**-0.5.
- MoE (layers >= first_k_dense_replace): router = sigmoid(fp32 logits) +
  correction bias, group-limited top-k (top-2-sum per group -> topk_group
  groups -> top_k experts), weights = gathered sigmoid scores (optionally
  normalized) * routed_scaling_factor; plus always-on shared experts.

Quantization: all attention projections and the stacked routed experts
(GroupedQuantLinear) + shared experts quantize; the router gate stays fp32
(like Mixtral's gate in the reference).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..nn.linear import Linear
from . import llama
from .llama import KVCache, _update_stacked_cache, positions_and_masks, rms_norm

__all__ = ["DeepseekV3Config", "init_params", "forward", "init_cache"]


@dataclass(frozen=True)
class DeepseekV3Config:
    vocab_size: int = 129280
    hidden_size: int = 7168
    intermediate_size: int = 18432
    moe_intermediate_size: int = 2048
    num_hidden_layers: int = 61
    num_attention_heads: int = 128
    n_routed_experts: int = 256
    n_shared_experts: int = 1
    num_experts_per_tok: int = 8
    n_group: int = 8
    topk_group: int = 4
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 2.5
    first_k_dense_replace: int = 3
    q_lora_rank: Optional[int] = 1536
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    # YaRN scaling (real V3 checkpoints ship it): canonical hashable tuple,
    # see llama.LlamaConfig. The mscale_all_dim term additionally scales the
    # attention softmax (DeepSeek convention, ≙ HF DeepseekV3Attention).
    rope_scaling: "tuple | None" = None
    # real V3 checkpoints store the rope dims interleaved (even/odd pairs);
    # HF de-interleaves q/k before the standard rotation (≙ HF
    # `apply_rotary_pos_emb_interleave`, config default True)
    rope_interleave: bool = True
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    # shared-helper compatibility
    sliding_window: Optional[int] = None

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @property
    def attn_scale_(self) -> float:
        """qk_head_dim**-0.5, times the DeepSeek-YaRN mscale² correction
        (≙ HF DeepseekV3Attention when rope_scaling has mscale_all_dim)."""
        import math

        base = self.qk_head_dim**-0.5
        if self.rope_scaling is None:
            return base
        rs = dict(self.rope_scaling)
        mscale_all = rs.get("mscale_all_dim") or 0
        if mscale_all:
            factor = float(rs.get("factor", 1.0))
            m = 1.0 if factor <= 1 else 0.1 * mscale_all * math.log(factor) + 1.0
            base = base * m * m
        return base

    @property
    def head_dim_(self) -> int:  # positions_and_masks compatibility (unused dims)
        return self.qk_rope_head_dim

    @classmethod
    def from_hf(cls, hf: dict) -> "DeepseekV3Config":
        return cls(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            moe_intermediate_size=hf.get("moe_intermediate_size", 2048),
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            n_routed_experts=hf.get("n_routed_experts", 256),
            n_shared_experts=hf.get("n_shared_experts", 1),
            num_experts_per_tok=hf.get("num_experts_per_tok", 8),
            n_group=hf.get("n_group", 8),
            topk_group=hf.get("topk_group", 4),
            norm_topk_prob=hf.get("norm_topk_prob", True),
            routed_scaling_factor=hf.get("routed_scaling_factor", 2.5),
            first_k_dense_replace=hf.get("first_k_dense_replace", 3),
            q_lora_rank=hf.get("q_lora_rank"),
            kv_lora_rank=hf.get("kv_lora_rank", 512),
            qk_nope_head_dim=hf.get("qk_nope_head_dim", 128),
            qk_rope_head_dim=hf.get("qk_rope_head_dim", 64),
            v_head_dim=hf.get("v_head_dim", 128),
            rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
            rope_theta=hf.get("rope_theta", 10000.0),
            rope_scaling=llama.LlamaConfig._canon_rope_scaling(
                hf.get("rope_scaling")
            ),
            rope_interleave=hf.get("rope_interleave", True),
            max_position_embeddings=hf.get("max_position_embeddings", 4096),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "DeepseekV3Config":
        return cls(
            vocab_size=vocab_size,
            hidden_size=128,
            intermediate_size=256,
            moe_intermediate_size=64,
            num_hidden_layers=3,
            num_attention_heads=4,
            n_routed_experts=8,
            n_shared_experts=1,
            num_experts_per_tok=2,
            n_group=4,
            topk_group=2,
            first_k_dense_replace=1,
            q_lora_rank=64,
            kv_lora_rank=32,
            qk_nope_head_dim=32,
            qk_rope_head_dim=16,
            v_head_dim=32,
            max_position_embeddings=128,
        )


def _dense_mlp_params(key_iter, d, f, dtype):
    def lin(o, i):
        w = jax.random.normal(next(key_iter), (o, i), jnp.float32) / jnp.sqrt(i)
        return Linear(weight=w.astype(dtype))

    return {"gate_proj": lin(f, d), "up_proj": lin(f, d), "down_proj": lin(d, f)}


def init_params(cfg: DeepseekV3Config, key: Array, dtype=jnp.float32) -> dict:
    from ..nn.moe import GroupedLinear

    ks = iter(jax.random.split(key, 16 + 24 * cfg.num_hidden_layers))
    d = cfg.hidden_size

    def lin(o, i):
        w = jax.random.normal(next(ks), (o, i), jnp.float32) / jnp.sqrt(i)
        return Linear(weight=w.astype(dtype))

    layers = []
    for li in range(cfg.num_hidden_layers):
        sa = {
            "kv_a_proj_with_mqa": lin(cfg.kv_lora_rank + cfg.qk_rope_head_dim, d),
            "kv_a_layernorm": jnp.ones((cfg.kv_lora_rank,), dtype),
            "kv_b_proj": lin(
                cfg.num_attention_heads * (cfg.qk_nope_head_dim + cfg.v_head_dim),
                cfg.kv_lora_rank,
            ),
            "o_proj": lin(d, cfg.num_attention_heads * cfg.v_head_dim),
        }
        if cfg.q_lora_rank is None:
            sa["q_proj"] = lin(cfg.num_attention_heads * cfg.qk_head_dim, d)
        else:
            sa["q_a_proj"] = lin(cfg.q_lora_rank, d)
            sa["q_a_layernorm"] = jnp.ones((cfg.q_lora_rank,), dtype)
            sa["q_b_proj"] = lin(cfg.num_attention_heads * cfg.qk_head_dim, cfg.q_lora_rank)

        if li < cfg.first_k_dense_replace:
            mlp = _dense_mlp_params(ks, d, cfg.intermediate_size, dtype)
        else:
            e, mf = cfg.n_routed_experts, cfg.moe_intermediate_size

            def ew(o, i):
                w = jax.random.normal(next(ks), (e, o, i), jnp.float32) / jnp.sqrt(i)
                return GroupedLinear(weight=w.astype(dtype))

            mlp = {
                "gate_weight": (jax.random.normal(next(ks), (e, d), jnp.float32) * 0.02),
                "e_score_correction_bias": jnp.zeros((e,), jnp.float32),
                "experts": {"w1": ew(mf, d), "w2": ew(d, mf), "w3": ew(mf, d)},
                "shared_experts": _dense_mlp_params(
                    ks, d, cfg.moe_intermediate_size * cfg.n_shared_experts, dtype
                ),
            }
        layers.append({
            "self_attn": sa,
            "mlp": mlp,
            "input_layernorm": jnp.ones((d,), dtype),
            "post_attention_layernorm": jnp.ones((d,), dtype),
        })
    return {
        "embed_tokens": (jax.random.normal(next(ks), (cfg.vocab_size, d), jnp.float32)
                         * 0.02).astype(dtype),
        "layers": layers,
        "norm": jnp.ones((d,), dtype),
        "lm_head": lin(cfg.vocab_size, d),
    }


def init_cache(cfg: DeepseekV3Config, batch: int, max_len: int, dtype=jnp.float32) -> KVCache:
    """MLA cache: K rows carry qk_head_dim (nope+rope), V rows v_head_dim."""
    base = (cfg.num_hidden_layers, batch, cfg.num_attention_heads, max_len)
    return KVCache(
        k=jnp.zeros(base + (cfg.qk_head_dim,), dtype),
        v=jnp.zeros(base + (cfg.v_head_dim,), dtype),
    )


def _mla_attention(layer, cfg, x, k_all, v_all, layer_idx, start_pos, mask, cos, sin,
                   cached: bool):
    b, t, d = x.shape
    nh = cfg.num_attention_heads
    nd, rd, vd = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim

    if "q_proj" in layer:
        q = layer["q_proj"](x)
    else:
        q = layer["q_b_proj"](
            rms_norm(layer["q_a_proj"](x), layer["q_a_layernorm"], cfg.rms_norm_eps)
        )
    q = q.reshape(b, t, nh, nd + rd).transpose(0, 2, 1, 3)
    q_pass, q_rot = q[..., :nd], q[..., nd:]

    ckv = layer["kv_a_proj_with_mqa"](x)  # [B, T, kv_lora + rd]
    k_pass_lat, k_rot = ckv[..., : cfg.kv_lora_rank], ckv[..., cfg.kv_lora_rank:]
    kv = layer["kv_b_proj"](
        rms_norm(k_pass_lat, layer["kv_a_layernorm"], cfg.rms_norm_eps)
    ).reshape(b, t, nh, nd + vd).transpose(0, 2, 1, 3)
    k_pass, v = kv[..., :nd], kv[..., nd:]
    k_rot = k_rot.reshape(b, 1, t, rd)

    if cfg.rope_interleave:
        # de-interleave (even dims | odd dims) so the standard rotate-half
        # rotation pairs original dims (2i, 2i+1); the permuted layout is
        # kept (q and k permute identically -> scores are unchanged)
        q_rot = jnp.concatenate([q_rot[..., 0::2], q_rot[..., 1::2]], axis=-1)
        k_rot = jnp.concatenate([k_rot[..., 0::2], k_rot[..., 1::2]], axis=-1)
    q_rot = llama._apply_rope(q_rot, cos, sin)
    k_rot = llama._apply_rope(k_rot, cos, sin)
    k_rot = jnp.broadcast_to(k_rot, (b, nh, t, rd))

    k = jnp.concatenate([k_pass, k_rot], axis=-1)
    q = jnp.concatenate([q_pass, q_rot], axis=-1)

    if cached:
        k_all, v_all = _update_stacked_cache(k_all, v_all, layer_idx, k, v, start_pos)
        keys, vals = k_all[layer_idx], v_all[layer_idx]
    else:
        keys, vals = k, v

    scores = jnp.einsum("bhtd,bhsd->bhts", q, keys, preferred_element_type=jnp.float32)
    scores = scores * cfg.attn_scale_ + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, vals)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * vd)
    return layer["o_proj"](out), k_all, v_all


def _router(mlp, cfg, x2):
    """Group-limited sigmoid routing (fp32). x2: [T, d] ->
    (topk_idx [T, K], topk_w [T, K])."""
    logits = x2.astype(jnp.float32) @ mlp["gate_weight"].T.astype(jnp.float32)
    scores = jax.nn.sigmoid(logits)  # [T, E]
    choice = scores + mlp["e_score_correction_bias"][None, :]

    tg, ng = cfg.topk_group, cfg.n_group
    e_per_g = cfg.n_routed_experts // ng
    grouped = choice.reshape(-1, ng, e_per_g)
    group_scores = jax.lax.top_k(grouped, 2)[0].sum(-1)  # [T, G]
    _, gidx = jax.lax.top_k(group_scores, tg)  # [T, tg]
    gmask = jnp.zeros_like(group_scores).at[
        jnp.arange(gidx.shape[0])[:, None], gidx
    ].set(1.0)
    smask = jnp.repeat(gmask, e_per_g, axis=-1)  # [T, E]
    masked = jnp.where(smask > 0, choice, 0.0)
    _, topk_idx = jax.lax.top_k(masked, cfg.num_experts_per_tok)
    topk_w = jnp.take_along_axis(scores, topk_idx, axis=-1)
    if cfg.norm_topk_prob:
        topk_w = topk_w / (topk_w.sum(-1, keepdims=True) + 1e-20)
    return topk_idx, topk_w * cfg.routed_scaling_factor


def _moe_block(mlp, cfg, x):
    """Dense-compute MoE (every expert on every token, then weighted gather) —
    exact and simple; at 256-expert production scale use capacity-based
    dispatch (`nn.moe.moe_dispatch`) + EP sharding instead."""
    b, t, d = x.shape
    x2 = x.reshape(b * t, d)
    topk_idx, topk_w = _router(mlp, cfg, x2)

    e = cfg.n_routed_experts
    xin = jnp.broadcast_to(x2[None], (e, b * t, d))
    w1, w2, w3 = (mlp["experts"][n] for n in ("w1", "w2", "w3"))
    h = jax.nn.silu(w1(xin)) * w3(xin)
    eout = w2(h)  # [E, T, d]

    gathered = jnp.take_along_axis(
        eout.transpose(1, 0, 2),  # [T, E, d]
        topk_idx[..., None].astype(jnp.int32),
        axis=1,
    )  # [T, K, d]
    routed = (gathered.astype(jnp.float32) * topk_w[..., None]).sum(1)

    sh = mlp["shared_experts"]
    shared = sh["down_proj"](jax.nn.silu(sh["gate_proj"](x2)) * sh["up_proj"](x2))
    return (routed.astype(x.dtype) + shared).reshape(b, t, d)


def forward(
    params: dict,
    cfg: DeepseekV3Config,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos=0,
    kv_valid: Optional[Array] = None,
) -> Tuple[Array, Optional[KVCache]]:
    b, t = tokens.shape
    x = jnp.take(params["embed_tokens"], tokens, axis=0)

    # positions + mask via the shared helper; RoPE tables at qk_rope_head_dim
    _, cos, sin, mask = positions_and_masks(
        cfg, t, start_pos, None if cache is None else cache.max_len, kv_valid
    )

    k_all = cache.k if cache is not None else None
    v_all = cache.v if cache is not None else None
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, k_all, v_all = _mla_attention(
            layer["self_attn"], cfg, h, k_all, v_all, i, start_pos,
            mask, cos, sin, cached=cache is not None,
        )
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        if "experts" in layer["mlp"]:
            x = x + _moe_block(layer["mlp"], cfg, h)
        else:
            m = layer["mlp"]
            x = x + m["down_proj"](jax.nn.silu(m["gate_proj"](h)) * m["up_proj"](h))

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = params["lm_head"](x).astype(jnp.float32)
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def params_from_hf_state_dict(state, cfg: DeepseekV3Config, dtype=jnp.float32) -> dict:
    """Map HF `DeepseekV3ForCausalLM` weights (routed experts stacked)."""
    import numpy as np

    from ..nn.moe import GroupedLinear

    def arr(name):
        x = state[name]
        if hasattr(x, "detach"):
            x = x.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(x), dtype)

    def lin(prefix):
        b = f"{prefix}.bias"
        return Linear(weight=arr(f"{prefix}.weight"),
                      bias=arr(b) if b in state else None)

    def dense_mlp(p):
        return {"gate_proj": lin(f"{p}.gate_proj"), "up_proj": lin(f"{p}.up_proj"),
                "down_proj": lin(f"{p}.down_proj")}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        sa = {
            "kv_a_proj_with_mqa": lin(f"{p}.self_attn.kv_a_proj_with_mqa"),
            "kv_a_layernorm": arr(f"{p}.self_attn.kv_a_layernorm.weight"),
            "kv_b_proj": lin(f"{p}.self_attn.kv_b_proj"),
            "o_proj": lin(f"{p}.self_attn.o_proj"),
        }
        if f"{p}.self_attn.q_proj.weight" in state:
            sa["q_proj"] = lin(f"{p}.self_attn.q_proj")
        else:
            sa["q_a_proj"] = lin(f"{p}.self_attn.q_a_proj")
            sa["q_a_layernorm"] = arr(f"{p}.self_attn.q_a_layernorm.weight")
            sa["q_b_proj"] = lin(f"{p}.self_attn.q_b_proj")

        if i < cfg.first_k_dense_replace:
            mlp = dense_mlp(f"{p}.mlp")
        else:
            e = cfg.n_routed_experts
            # stack routed experts: HF w [out, in] -> GroupedLinear [E, in, out]
            def stack(proj):
                ws = [np.asarray(state[f"{p}.mlp.experts.{j}.{proj}.weight"].detach()
                                 .to("cpu").float().numpy()
                                 if hasattr(state[f"{p}.mlp.experts.{j}.{proj}.weight"], "detach")
                                 else state[f"{p}.mlp.experts.{j}.{proj}.weight"])
                      for j in range(e)]
                return GroupedLinear(weight=jnp.asarray(np.stack(ws), dtype))

            mlp = {
                "gate_weight": arr(f"{p}.mlp.gate.weight").astype(jnp.float32),
                "e_score_correction_bias": arr(
                    f"{p}.mlp.gate.e_score_correction_bias"
                ).astype(jnp.float32),
                "experts": {
                    "w1": stack("gate_proj"),
                    "w2": stack("down_proj"),
                    "w3": stack("up_proj"),
                },
                "shared_experts": dense_mlp(f"{p}.mlp.shared_experts"),
            }
        layers.append({
            "self_attn": sa,
            "mlp": mlp,
            "input_layernorm": arr(f"{p}.input_layernorm.weight"),
            "post_attention_layernorm": arr(f"{p}.post_attention_layernorm.weight"),
        })
    return {
        "embed_tokens": arr("model.embed_tokens.weight"),
        "layers": layers,
        "norm": arr("model.norm.weight"),
        "lm_head": lin("lm_head"),
    }
