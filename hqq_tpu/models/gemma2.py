# SPDX-License-Identifier: Apache-2.0
"""Gemma-2 family — Gemma deltas plus: attention/final logit softcapping,
query_pre_attn_scalar scaling, pre+post norms around BOTH sublayers, and
alternating sliding/full attention layers.

HF `Gemma2ForCausalLM` semantics:
    x = x + post_attn_norm( attn( input_norm(x) ) )
    x = x + post_ffn_norm( mlp( pre_ffn_norm(x) ) )
    scores = cap * tanh(scores / cap);  logits = cap_f * tanh(logits / cap_f)
    layer i uses a sliding window iff `layer_types[i] == "sliding_attention"`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..nn.linear import Linear
from . import llama
from .gemma import GemmaConfig, _gemma_mlp, _gemma_norm
from .llama import KVCache, _update_stacked_cache, init_cache  # noqa: F401

__all__ = ["Gemma2Config", "init_params", "forward", "init_cache"]


@dataclasses.dataclass(frozen=True)
class Gemma2Config(GemmaConfig):
    attn_logit_softcapping: Optional[float] = 50.0
    final_logit_softcapping: Optional[float] = 30.0
    query_pre_attn_scalar: float = 256.0
    sliding_window: Optional[int] = 4096

    def layer_is_sliding(self, i: int) -> bool:
        # HF: even layers sliding, odd layers full attention
        return i % 2 == 0

    @classmethod
    def from_hf(cls, hf: dict) -> "Gemma2Config":
        base = GemmaConfig.from_hf(hf)
        return cls(
            **dataclasses.asdict(base),
            attn_logit_softcapping=hf.get("attn_logit_softcapping", 50.0),
            final_logit_softcapping=hf.get("final_logit_softcapping", 30.0),
            query_pre_attn_scalar=hf.get("query_pre_attn_scalar", 256.0),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "Gemma2Config":
        return cls(
            vocab_size=vocab_size,
            hidden_size=256,
            intermediate_size=512,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=64,
            max_position_embeddings=512,
            query_pre_attn_scalar=64.0,
            sliding_window=16,
        )


def init_params(cfg: Gemma2Config, key: Array, dtype=jnp.float32) -> dict:
    params = llama.init_params(cfg, key, dtype)
    params.pop("lm_head", None)
    d = cfg.hidden_size
    for layer in params["layers"]:
        layer["pre_feedforward_layernorm"] = jnp.zeros((d,), dtype)
        layer["post_feedforward_layernorm"] = jnp.zeros((d,), dtype)
        # gemma RMSNorm weights are (1 + w); zero-init = identity
        layer["input_layernorm"] = jnp.zeros((d,), dtype)
        layer["post_attention_layernorm"] = jnp.zeros((d,), dtype)
    params["norm"] = jnp.zeros((d,), dtype)
    return params


def _softcap(x: Array, cap: Optional[float]) -> Array:
    if cap is None:
        return x
    return cap * jnp.tanh(x / cap)


def _attention(
    layer: dict, cfg: Gemma2Config, x: Array, k_all, v_all, layer_idx: int,
    start_pos, mask: Array, cos: Array, sin: Array, cached: bool,
):
    b, t, d = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    if "qkv_proj" in layer:
        qkv = layer["qkv_proj"](x)
        q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
        q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    else:
        q = layer["q_proj"](x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = layer["k_proj"](x).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
        v = layer["v_proj"](x).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
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

    scores = jnp.einsum("bhtd,bhsd->bhts", q, keys, preferred_element_type=jnp.float32)
    scores = scores * (cfg.query_pre_attn_scalar**-0.5)
    scores = _softcap(scores, cfg.attn_logit_softcapping)
    scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, vals)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    return layer["o_proj"](out), k_all, v_all


def _attention_paged(layer, cfg, x, cache, layer_idx, lengths, page_indices,
                     cos, sin, window):
    """Gemma2/3 paged attention (T=1 decode; T=k speculative verify):
    query_pre_attn_scalar scaling, optional per-head q/k gemma-norm
    (gemma3), score softcapping and sliding windows handled by the gather
    path of `ops.paged.paged_attn`. T>1 writes all rows first, then query j
    attends keys < lengths+j+1 (see llama._attention_paged)."""
    from ..ops.paged import paged_attn, write_token_to_pages

    b, t, _ = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    if "qkv_proj" in layer:
        qkv = layer["qkv_proj"](x)
        q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
    else:
        q, k, v = layer["q_proj"](x), layer["k_proj"](x), layer["v_proj"](x)
    q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    if "q_norm" in layer:  # gemma3
        q = _gemma_norm(q, layer["q_norm"], cfg.rms_norm_eps)
        k = _gemma_norm(k, layer["k_norm"], cfg.rms_norm_eps)
    q = llama._apply_rope(q, cos, sin)
    k = llama._apply_rope(k, cos, sin)

    pg = cache.page_size
    pos_bt = lengths[:, None] + jnp.arange(t)[None, :]
    page_of = jnp.take_along_axis(page_indices, pos_bt // pg, axis=1)
    offset = pos_bt % pg
    kw = k.transpose(0, 2, 1, 3).reshape(b * t, nkv, hd)
    vw = v.transpose(0, 2, 1, 3).reshape(b * t, nkv, hd)
    cache = write_token_to_pages(cache, layer_idx, kw, vw,
                                 page_of.reshape(-1), offset.reshape(-1))
    qdt = jnp.float32 if cache.quantized else cache.k.dtype
    qd = (q * (cfg.query_pre_attn_scalar**-0.5)).astype(qdt)  # [B, nh, T, hd]
    attn = jnp.stack(
        [
            paged_attn(
                qd[:, :, j], cache, layer_idx, lengths + j + 1, page_indices,
                window=window, softcap=cfg.attn_logit_softcapping,
            )
            for j in range(t)
        ],
        axis=1,
    )
    out = attn.reshape(b, t, nh * hd).astype(x.dtype)
    return layer["o_proj"](out), cache


def _forward_paged(params, cfg, tokens, cache, lengths, page_indices):
    """Paged decode step shared by gemma2 and gemma3 (cache polymorphism):
    sandwich norms, embedding scaling, alternating sliding/full layers,
    gemma3's dual rope tables (local theta on sliding layers), softcaps."""
    toks = tokens if tokens.ndim == 2 else tokens[:, None]
    t = toks.shape[1]
    x = jnp.take(params["embed_tokens"], toks, axis=0)
    x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)

    cfg_full = dataclasses.replace(cfg, sliding_window=None)
    _, cos_g, sin_g, _ = llama.positions_and_masks(cfg_full, t, lengths, None)
    local_theta = getattr(cfg, "rope_local_base_freq", None)
    if local_theta is not None:  # gemma3: sliding layers use the local theta
        cfg_local = dataclasses.replace(cfg, rope_theta=local_theta)
        _, cos_l, sin_l, _ = llama.positions_and_masks(cfg_local, t, lengths, None)
    else:
        cos_l, sin_l = cos_g, sin_g

    for i, layer in enumerate(params["layers"]):
        sliding = cfg.layer_is_sliding(i)
        window = cfg.sliding_window if sliding else None
        cos, sin = (cos_l, sin_l) if sliding else (cos_g, sin_g)
        h = _gemma_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, cache = _attention_paged(
            layer["self_attn"], cfg, h, cache, i, lengths, page_indices,
            cos, sin, window,
        )
        attn_out = _gemma_norm(attn_out, layer["post_attention_layernorm"],
                               cfg.rms_norm_eps)
        x = x + attn_out
        h = _gemma_norm(x, layer["pre_feedforward_layernorm"], cfg.rms_norm_eps)
        h = _gemma_mlp(layer["mlp"], h)
        h = _gemma_norm(h, layer["post_feedforward_layernorm"], cfg.rms_norm_eps)
        x = x + h

    x = _gemma_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                        preferred_element_type=jnp.float32)
    logits = _softcap(logits, getattr(cfg, "final_logit_softcapping", None))
    return logits, cache


def forward(
    params: dict,
    cfg: Gemma2Config,
    tokens: Array,
    cache: Optional[KVCache] = None,
    start_pos=0,
    kv_valid: Optional[Array] = None,
    page_indices=None,
) -> Tuple[Array, Optional[KVCache]]:
    from ..ops.paged import PagedKVCache

    if isinstance(cache, PagedKVCache):
        return _forward_paged(params, cfg, tokens, cache,
                              jnp.asarray(start_pos), page_indices)
    b, t = tokens.shape
    x = jnp.take(params["embed_tokens"], tokens, axis=0)
    x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)

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
        h = _gemma_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, k_all, v_all = _attention(
            layer["self_attn"], cfg, h, k_all, v_all, i, start_pos,
            mask, cos, sin, cached=cache is not None,
        )
        attn_out = _gemma_norm(attn_out, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + attn_out
        h = _gemma_norm(x, layer["pre_feedforward_layernorm"], cfg.rms_norm_eps)
        h = _gemma_mlp(layer["mlp"], h)
        h = _gemma_norm(h, layer["post_feedforward_layernorm"], cfg.rms_norm_eps)
        x = x + h

    x = _gemma_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                        preferred_element_type=jnp.float32)
    logits = _softcap(logits, cfg.final_logit_softcapping)
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def params_from_hf_state_dict(state, cfg: Gemma2Config, dtype=jnp.float32) -> dict:
    """Map HF `Gemma2ForCausalLM` weights (4 norms per block, tied head)."""
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

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        layers.append({
            "self_attn": {
                "q_proj": lin(f"{p}.self_attn.q_proj"),
                "k_proj": lin(f"{p}.self_attn.k_proj"),
                "v_proj": lin(f"{p}.self_attn.v_proj"),
                "o_proj": lin(f"{p}.self_attn.o_proj"),
            },
            "mlp": {
                "gate_proj": lin(f"{p}.mlp.gate_proj"),
                "up_proj": lin(f"{p}.mlp.up_proj"),
                "down_proj": lin(f"{p}.mlp.down_proj"),
            },
            "input_layernorm": arr(f"{p}.input_layernorm.weight"),
            "post_attention_layernorm": arr(f"{p}.post_attention_layernorm.weight"),
            "pre_feedforward_layernorm": arr(f"{p}.pre_feedforward_layernorm.weight"),
            "post_feedforward_layernorm": arr(f"{p}.post_feedforward_layernorm.weight"),
        })
    return {
        "embed_tokens": arr("model.embed_tokens.weight"),
        "layers": layers,
        "norm": arr("model.norm.weight"),
    }
