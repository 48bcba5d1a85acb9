# SPDX-License-Identifier: Apache-2.0
"""Paged KV-cache primitives: pooled pages, per-token writes, paged attention.

Model-neutral core shared by every family forward (the serving engine in
`serving/paged.py` builds on top). The vLLM idea rebuilt TPU-native
(the reference delegates all paging to vLLM, `/root/reference/hqq/utils/
vllm.py`):

* pages live in one stacked pool `[L, H, num_pages, page_size, hd]` updated
  in place (single scatter per pool per token),
* decode attention runs the production Pallas paged-attention kernel
  (async page DMA, double buffering, megacore) on TPU whenever the layer is
  a plain causal one; layers needing a sliding window or logit softcapping
  (mistral / gemma2 / gemma3) use the gather-based implementation, which
  supports both — the Pallas kernel has no mask/softcap hooks,
* optional int8 pages (per-row absmax scales) halve KV memory and page
  bandwidth.

Family forwards accept a `PagedKVCache` wherever they accept a dense
`KVCache` (cache polymorphism): the same forward that prefills densely
decodes paged, so every architectural detail (q/k-norm, sandwich norms,
softcap, alternating windows, μP multipliers) lives in exactly one place.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

__all__ = [
    "PagedKVCache",
    "init_paged_cache",
    "paged_attention_ref",
    "paged_attn",
    "write_token_to_pages",
]


@struct.dataclass
class PagedKVCache:
    """Pooled KV pages: k/v [L, n_kv_heads, num_pages, page_size, head_dim].

    With `quantized` pages are int8 and k/v_scales hold per-row absmax
    scales [L, H, P, pg, 1] — half the KV memory and page bandwidth,
    supported natively by the Pallas kernel via QuantizedTensor."""

    k: Array
    v: Array
    k_scales: Optional[Array] = None
    v_scales: Optional[Array] = None
    page_size: int = struct.field(pytree_node=False, default=16)

    @property
    def num_pages(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None


def init_paged_cache(
    cfg, num_pages: int, page_size: int = 16, dtype=jnp.bfloat16,
    quantize_kv: bool = False,
) -> PagedKVCache:
    shape = (
        cfg.num_hidden_layers,
        cfg.num_key_value_heads,
        num_pages,
        page_size,
        cfg.head_dim_,
    )
    if quantize_kv:
        sshape = shape[:-1] + (1,)
        return PagedKVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scales=jnp.ones(sshape, jnp.float32),
            v_scales=jnp.ones(sshape, jnp.float32),
            page_size=page_size,
        )
    return PagedKVCache(
        k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype), page_size=page_size
    )


def quant_rows(x: Array):
    """Per-row int8 quantization (absmax over the last dim)."""
    scales = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scales = jnp.maximum(scales, 1e-8)
    w = jnp.round(x.astype(jnp.float32) / scales * 127.0).astype(jnp.int8)
    return w, scales.astype(jnp.float32)


def write_token_to_pages(
    cache: PagedKVCache,
    layer_idx: int,
    kb: Array,  # [B, H, hd] new K rows (one token per slot)
    vb: Array,
    page_of: Array,  # [B] physical page holding each slot's next position
    offset: Array,  # [B] row offset within the page
    drop_oob: bool = False,
) -> PagedKVCache:
    """Write one new K/V row per slot into its page: ONE scatter per pool
    (advanced indexing with [B] page/offset vectors) rather than B
    dynamic_update_slices — at 8 slots × 32 layers a per-slot loop was
    thousands of tiny update ops per decode step.

    drop_oob=True discards rows whose page index is out of range (scatter
    mode='drop') — the sequence-parallel path marks non-owned pages with an
    OOB sentinel so only the owning shard writes."""
    import dataclasses

    mode = "drop" if drop_oob else None
    k_pool, v_pool = cache.k, cache.v
    ks_pool, vs_pool = cache.k_scales, cache.v_scales
    if cache.quantized:
        kq, ks = quant_rows(kb)
        vq, vs = quant_rows(vb)
        k_pool = k_pool.at[layer_idx, :, page_of, offset].set(kq, mode=mode)
        v_pool = v_pool.at[layer_idx, :, page_of, offset].set(vq, mode=mode)
        ks_pool = ks_pool.at[layer_idx, :, page_of, offset].set(ks, mode=mode)
        vs_pool = vs_pool.at[layer_idx, :, page_of, offset].set(vs, mode=mode)
    else:
        k_pool = k_pool.at[layer_idx, :, page_of, offset].set(
            kb.astype(k_pool.dtype), mode=mode)
        v_pool = v_pool.at[layer_idx, :, page_of, offset].set(
            vb.astype(v_pool.dtype), mode=mode)
    return dataclasses.replace(
        cache, k=k_pool, v=v_pool, k_scales=ks_pool, v_scales=vs_pool
    )


def paged_attention_ref(
    q: Array,  # [B, nh, hd] (pre-scaled)
    k_pages: Array,  # [H, P, pg, hd]
    v_pages: Array,
    lengths: Array,  # [B] int32
    page_indices: Array,  # [B, MP] int32
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[Array] = None,  # [nh] gpt-oss attention sinks
) -> Array:
    """Gather-based paged attention (CPU tests, fallback, and the
    window/softcap/sink cases the Pallas kernel does not support)."""
    b, nh, hd = q.shape
    h = k_pages.shape[0]
    mp, pg = page_indices.shape[1], k_pages.shape[2]
    s_max = mp * pg

    k_seq = jnp.take(k_pages, page_indices, axis=1)  # [H, B, MP, pg, hd]
    v_seq = jnp.take(v_pages, page_indices, axis=1)
    k_seq = k_seq.transpose(1, 0, 2, 3, 4).reshape(b, h, s_max, hd)
    v_seq = v_seq.transpose(1, 0, 2, 3, 4).reshape(b, h, s_max, hd)

    rep = nh // h
    if rep > 1:
        k_seq = jnp.repeat(k_seq, rep, axis=1)
        v_seq = jnp.repeat(v_seq, rep, axis=1)

    scores = jnp.einsum("bhd,bhsd->bhs", q, k_seq, preferred_element_type=jnp.float32)
    if softcap is not None:
        scores = jnp.tanh(scores / softcap) * softcap
    neg = jnp.finfo(jnp.float32).min
    key_pos = jnp.arange(s_max)[None, :]
    valid = key_pos < lengths[:, None]  # [B, S]
    if window is not None:
        # query position is lengths-1 (the just-written token)
        valid &= key_pos > (lengths[:, None] - 1 - window)
    scores = jnp.where(valid[:, None, :], scores, neg)
    if sinks is not None:
        # per-head sink logit joins the softmax; its mass is dropped
        sk = sinks.reshape(1, -1, 1).astype(jnp.float32)
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sk)
        num = jnp.exp(scores - m)
        den = jnp.sum(num, axis=-1, keepdims=True) + jnp.exp(sk - m)
        probs = (num / den).astype(q.dtype)
    else:
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhs,bhsd->bhd", probs, v_seq)


def paged_attention_sp(
    q: Array,  # [B, nh, hd] (pre-scaled)
    k_pages: Array,  # LOCAL shard [H, P_local, pg, hd]
    v_pages: Array,
    lengths: Array,  # [B] int32 (global)
    page_indices: Array,  # [B, MP] int32 GLOBAL page ids
    axis_name: str,
) -> Array:
    """Sequence-parallel paged decode attention: the page pool is sharded
    over `axis_name` in contiguous blocks (device r owns global pages
    [r*P_local, (r+1)*P_local)); each device computes an online-softmax
    partial over ITS pages and the partials merge with one pmax + two psums
    — contexts longer than one chip's pool decode as one SPMD program
    (VERDICT r4 item 10 / SURVEY §5.7). The merge collectives ride ICI via
    shard_map; a fused Pallas partial-attention kernel is the further
    optimization point (this gather form is the correctness/placement
    substrate, like `paged_attention_ref` for the single-chip path)."""
    b, nh, hd = q.shape
    h, p_local, pg, _ = k_pages.shape
    rank = jax.lax.axis_index(axis_name)
    lidx = page_indices - rank * p_local  # [B, MP], local page ids
    owned = (lidx >= 0) & (lidx < p_local)
    safe = jnp.where(owned, lidx, 0)

    k_seq = jnp.take(k_pages, safe, axis=1)  # [H, B, MP, pg, hd]
    v_seq = jnp.take(v_pages, safe, axis=1)
    mp = page_indices.shape[1]
    s_max = mp * pg
    k_seq = k_seq.transpose(1, 0, 2, 3, 4).reshape(b, h, s_max, hd)
    v_seq = v_seq.transpose(1, 0, 2, 3, 4).reshape(b, h, s_max, hd)
    rep = nh // h
    if rep > 1:
        k_seq = jnp.repeat(k_seq, rep, axis=1)
        v_seq = jnp.repeat(v_seq, rep, axis=1)

    scores = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32),
                        k_seq.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    key_pos = jnp.arange(s_max)[None, :]
    valid = (key_pos < lengths[:, None]) & jnp.repeat(owned, pg, axis=1)
    scores = jnp.where(valid[:, None, :], scores, neg)

    # online-softmax partial merge across the axis
    m_loc = jnp.max(scores, axis=-1, keepdims=True)  # [B, nh, 1]
    m_glob = jax.lax.pmax(m_loc, axis_name)
    e = jnp.where(valid[:, None, :], jnp.exp(scores - m_glob), 0.0)
    num = jnp.einsum("bhs,bhsd->bhd", e, v_seq.astype(jnp.float32))
    den = jnp.sum(e, axis=-1, keepdims=True)
    num = jax.lax.psum(num, axis_name)
    den = jax.lax.psum(den, axis_name)
    return (num / jnp.maximum(den, 1e-30)).astype(q.dtype)


def paged_attn(
    q: Array,
    cache: PagedKVCache,
    layer_idx: int,
    lengths: Array,
    page_indices: Array,
    pages_per_block: int = 4,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[Array] = None,
    seq_axis: Optional[str] = None,
) -> Array:
    """Dispatch: Pallas kernel on TPU for plain-causal layers; gather-based
    implementation for window/softcap/sink layers and off-TPU. With
    `seq_axis` (inside shard_map, pool page-sharded over that axis) the
    sequence-parallel merge path runs instead."""
    if seq_axis is not None:
        k_pages, v_pages = cache.k[layer_idx], cache.v[layer_idx]
        if cache.quantized:
            k_pages = k_pages.astype(jnp.float32) * (cache.k_scales[layer_idx] / 127.0)
            v_pages = v_pages.astype(jnp.float32) * (cache.v_scales[layer_idx] / 127.0)
        assert window is None and softcap is None and sinks is None, (
            "sequence-parallel decode supports plain causal attention"
        )
        return paged_attention_sp(q, k_pages, v_pages, lengths, page_indices,
                                  seq_axis)
    k_pages, v_pages = cache.k[layer_idx], cache.v[layer_idx]
    ks = None if cache.k_scales is None else cache.k_scales[layer_idx]
    vs = None if cache.v_scales is None else cache.v_scales[layer_idx]
    # the production kernel's block shapes need a lane-aligned head_dim;
    # small/toy models fall back to the gather implementation
    kernel_ok = k_pages.shape[-1] % 128 == 0
    if (jax.default_backend() == "tpu" and window is None and softcap is None
            and sinks is None and kernel_ok):
        from jax.experimental.pallas.ops.tpu.paged_attention import paged_attention
        from jax.experimental.pallas.ops.tpu.paged_attention.quantization_utils import (
            QuantizedTensor,
        )

        if ks is not None:
            k_pages = QuantizedTensor(weight=k_pages, scales=ks / 127.0)
            v_pages = QuantizedTensor(weight=v_pages, scales=vs / 127.0)
        return paged_attention(
            q,
            k_pages,
            v_pages,
            lengths,
            page_indices,
            pages_per_compute_block=pages_per_block,
        )
    if ks is not None:
        k_pages = k_pages.astype(jnp.float32) * (ks / 127.0)
        v_pages = v_pages.astype(jnp.float32) * (vs / 127.0)
        q = q.astype(jnp.float32)
    return paged_attention_ref(
        q, k_pages, v_pages, lengths, page_indices, window=window,
        softcap=softcap, sinks=sinks,
    )
