# SPDX-License-Identifier: Apache-2.0
"""Paged-KV continuous batching — block-table KV cache + Pallas paged
attention.

The dense engine (`batching.py`) reserves `max_len` KV rows per slot; this
engine allocates KV in fixed-size PAGES from a shared pool with a per-request
block table, the vLLM idea rebuilt TPU-native:

* pages live in one stacked pool `[L, H, num_pages, page_size, hd]` updated
  in place with `dynamic_update_slice` (scan-carry friendly),
* decode attention runs the production Pallas paged-attention kernel
  (`jax.experimental.pallas.ops.tpu.paged_attention` — async page DMA,
  double buffering, megacore; see boom_attention_tricks.md §8-13) on TPU and
  a gather-based reference implementation elsewhere,
* prefill reuses the dense model forward into a mini cache, then splices it
  page-by-page into the pool,
* the host-side page allocator is a simple free list; admission waits until
  a request's worst-case page budget is free (no preemption).

The reference has no serving substrate of its own (it rides vLLM,
`/root/reference/hqq/utils/vllm.py`); this module is the native equivalent.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from ..models import llama
from .batching import Request
from .generate import next_power_of_2, sample_token

__all__ = ["PagedKVCache", "PagedBatchingEngine", "paged_attention_ref"]


@struct.dataclass
class PagedKVCache:
    """Pooled KV pages: k/v [L, n_kv_heads, num_pages, page_size, head_dim].

    With `quantized` (guide: boom_attention_tricks.md §13) pages are int8 and
    k/v_scales hold per-row absmax scales [L, H, P, pg, 1] — half the KV
    memory and page bandwidth, supported natively by the Pallas kernel via
    QuantizedTensor."""

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


def _quant_rows(x: Array):
    """Per-row int8 quantization (absmax over the last dim)."""
    scales = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scales = jnp.maximum(scales, 1e-8)
    w = jnp.round(x.astype(jnp.float32) / scales * 127.0).astype(jnp.int8)
    return w, scales.astype(jnp.float32)


def paged_attention_ref(
    q: Array,  # [B, nh, hd] (pre-scaled)
    k_pages: Array,  # [H, P, pg, hd]
    v_pages: Array,
    lengths: Array,  # [B] int32
    page_indices: Array,  # [B, MP] int32
) -> Array:
    """Gather-based reference paged attention (CPU tests + fallback)."""
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
    neg = jnp.finfo(jnp.float32).min
    valid = jnp.arange(s_max)[None, :] < lengths[:, None]  # [B, S]
    scores = jnp.where(valid[:, None, :], scores, neg)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhs,bhsd->bhd", probs, v_seq)


def _paged_attn(q, k_pages, v_pages, lengths, page_indices, pages_per_block,
                k_scales=None, v_scales=None):
    """Dispatch to the Pallas kernel on TPU, reference impl elsewhere.
    int8 pages ride the kernel's QuantizedTensor path."""
    if jax.default_backend() == "tpu":
        from jax.experimental.pallas.ops.tpu.paged_attention import paged_attention
        from jax.experimental.pallas.ops.tpu.paged_attention.quantization_utils import (
            QuantizedTensor,
        )

        if k_scales is not None:
            # kernel convention: int8 weight + absmax scales (w = q/127*s is
            # folded as w = q * (s/127) by pre-scaling)
            k_pages = QuantizedTensor(weight=k_pages, scales=k_scales / 127.0)
            v_pages = QuantizedTensor(weight=v_pages, scales=v_scales / 127.0)
        return paged_attention(
            q,
            k_pages,
            v_pages,
            lengths,
            page_indices,
            pages_per_compute_block=pages_per_block,
        )
    if k_scales is not None:
        k_pages = k_pages.astype(jnp.float32) * (k_scales / 127.0)
        v_pages = v_pages.astype(jnp.float32) * (v_scales / 127.0)
        q = q.astype(jnp.float32)
    return paged_attention_ref(q, k_pages, v_pages, lengths, page_indices)


def paged_decode_step(
    params: dict,
    cfg,
    tokens: Array,  # [B] int32
    cache: PagedKVCache,
    lengths: Array,  # [B] current sequence length (pos of the new token)
    page_indices: Array,  # [B, MP] int32
    pages_per_block: int = 4,
):
    """One decode step for all slots over the paged pool.

    Llama-family layers (supports fused qkv/gate_up from fuse_for_decode).
    Returns (logits [B, V], cache).
    """
    b = tokens.shape[0]
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    pg = cache.page_size

    x = jnp.take(params["embed_tokens"], tokens[:, None], axis=0)  # [B, 1, D]
    cos, sin = llama._rope_cos_sin(lengths, hd, cfg.rope_theta)  # [B, hd]
    cos = cos[:, None, None, :]  # [B, 1, 1, hd]
    sin = sin[:, None, None, :]

    k_pool, v_pool = cache.k, cache.v
    ks_pool, vs_pool = cache.k_scales, cache.v_scales
    page_of = page_indices[jnp.arange(b), lengths // pg]  # [B] physical page
    offset = lengths % pg  # [B]

    for i, layer in enumerate(params["layers"]):
        sa = layer["self_attn"]
        h = llama.rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        if "qkv_proj" in sa:
            qkv = sa["qkv_proj"](h)
            q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
        else:
            q, k, v = sa["q_proj"](h), sa["k_proj"](h), sa["v_proj"](h)
        q = q.reshape(b, 1, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, 1, nkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, 1, nkv, hd).transpose(0, 2, 1, 3)
        q = llama._apply_rope(q, cos, sin)
        k = llama._apply_rope(k, cos, sin)

        # write the new K/V row of every slot into its page: ONE scatter per
        # pool (advanced indexing at[...] with [B] page/offset vectors) rather
        # than B dynamic_update_slices — at 8 slots x 32 layers the per-slot
        # loop was thousands of tiny update ops per decode step
        kb, vb = k[:, :, 0], v[:, :, 0]  # [B, H, hd]
        if cache.quantized:
            kq, ks = _quant_rows(kb)
            vq, vs = _quant_rows(vb)
            k_pool = k_pool.at[i, :, page_of, offset].set(kq)
            v_pool = v_pool.at[i, :, page_of, offset].set(vq)
            ks_pool = ks_pool.at[i, :, page_of, offset].set(ks)
            vs_pool = vs_pool.at[i, :, page_of, offset].set(vs)
        else:
            k_pool = k_pool.at[i, :, page_of, offset].set(kb.astype(k_pool.dtype))
            v_pool = v_pool.at[i, :, page_of, offset].set(vb.astype(v_pool.dtype))

        qdt = jnp.float32 if cache.quantized else k_pool.dtype
        qd = (q[:, :, 0] * (hd**-0.5)).astype(qdt)  # [B, nh, hd]
        attn = _paged_attn(
            qd, k_pool[i], v_pool[i], lengths + 1, page_indices, pages_per_block,
            None if ks_pool is None else ks_pool[i],
            None if vs_pool is None else vs_pool[i],
        )  # [B, nh, hd]
        attn = attn.reshape(b, 1, nh * hd).astype(x.dtype)
        x = x + sa["o_proj"](attn)

        h = llama.rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + llama._mlp(layer["mlp"], h)

    x = llama.rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                            preferred_element_type=jnp.float32)
    else:
        logits = params["lm_head"](x).astype(jnp.float32)
    return logits[:, 0], dataclasses.replace(
        cache, k=k_pool, v=v_pool, k_scales=ks_pool, v_scales=vs_pool
    )


def splice_prefill_into_pages(
    cache: PagedKVCache, mini: llama.KVCache, pages: List[int], t_real: int
) -> PagedKVCache:
    """Copy a dense prefill mini-cache [L, 1, H, T_pad, hd] into `pages`."""
    pg = cache.page_size
    k_pool, v_pool = cache.k, cache.v
    ks_pool, vs_pool = cache.k_scales, cache.v_scales
    n_full = -(-t_real // pg)
    for j in range(n_full):
        chunk_k = jax.lax.dynamic_slice_in_dim(mini.k[:, 0], j * pg, pg, axis=2)
        chunk_v = jax.lax.dynamic_slice_in_dim(mini.v[:, 0], j * pg, pg, axis=2)
        at = (0, 0, pages[j], 0, 0)
        if cache.quantized:
            kq, ks = _quant_rows(chunk_k)
            vq, vs = _quant_rows(chunk_v)
            k_pool = jax.lax.dynamic_update_slice(k_pool, kq[:, :, None], at)
            v_pool = jax.lax.dynamic_update_slice(v_pool, vq[:, :, None], at)
            ks_pool = jax.lax.dynamic_update_slice(ks_pool, ks[:, :, None], at)
            vs_pool = jax.lax.dynamic_update_slice(vs_pool, vs[:, :, None], at)
        else:
            # [L, H, pg, hd] -> [L, H, 1, pg, hd] at page pages[j]
            k_pool = jax.lax.dynamic_update_slice(
                k_pool, chunk_k[:, :, None].astype(k_pool.dtype), at)
            v_pool = jax.lax.dynamic_update_slice(
                v_pool, chunk_v[:, :, None].astype(v_pool.dtype), at)
    return dataclasses.replace(
        cache, k=k_pool, v=v_pool, k_scales=ks_pool, v_scales=vs_pool
    )


class PagedBatchingEngine:
    """Continuous batching over a paged KV pool (same public API as
    `ContinuousBatchingEngine`: add_request / step / run)."""

    def __init__(
        self,
        params: Any,
        cfg: Any,
        batch_slots: int = 8,
        num_pages: int = 512,
        page_size: int = 16,
        max_pages_per_seq: int = 64,  # must be a multiple of 4 (kernel block)
        eos_token_id: Optional[int] = None,
        do_sample: bool = False,
        top_k: int = 20,
        temperature: float = 0.6,
        cache_dtype=jnp.bfloat16,
        quantize_kv: bool = False,
        seed: int = 0,
        horizon: int = 1,
    ):
        self.params = params
        self.cfg = cfg
        self.s = batch_slots
        self.pg = page_size
        assert max_pages_per_seq % 4 == 0, "max_pages_per_seq must be a multiple of 4"
        self.mp = max_pages_per_seq
        self.eos = eos_token_id
        self.do_sample = do_sample
        self.top_k = top_k
        self.temperature = temperature

        self.cache = init_paged_cache(cfg, num_pages, page_size, cache_dtype,
                                      quantize_kv=quantize_kv)
        self._mini_dtype = cache_dtype  # prefill mini-cache stays float
        self._key = jax.random.PRNGKey(seed)

        # page 0 is a reserved scratch page: dead slots' block tables point
        # at it, so their (ignored) decode writes can never corrupt a live
        # request's pages
        self.free_pages = deque(range(1, num_pages))
        self.slot_pages: List[List[int]] = [[] for _ in range(batch_slots)]
        # block table; unallocated entries point at page 0 (never read thanks
        # to the length mask)
        self._page_tab = np.zeros((batch_slots, max_pages_per_seq), np.int32)

        self.queue: deque[Request] = deque()
        self.active: Dict[int, Request] = {}
        self.finished: Dict[int, Request] = {}
        self._uid = 0
        self._tokens = np.zeros((batch_slots,), np.int32)
        self._pos = np.zeros((batch_slots,), np.int32)
        self._live = np.zeros((batch_slots,), bool)

        self.horizon = max(1, int(horizon))
        self._decode_jit = jax.jit(self._decode_impl)
        self._horizon_jit = jax.jit(self._decode_horizon_impl, static_argnames=("steps",))
        self._prefill_jit = jax.jit(self._prefill_impl, static_argnames=("t_pad",))

    # -- jitted kernels ------------------------------------------------------
    def _prefill_impl(self, params, tokens, mini_cache, *, t_pad):
        return llama.forward(params, self.cfg, tokens, mini_cache, 0)

    def _decode_impl(self, params, tokens, cache, lengths, page_tab, key):
        logits, cache = paged_decode_step(
            params, self.cfg, tokens, cache, lengths, page_tab
        )
        key, sub = jax.random.split(key)
        nxt = sample_token(logits, sub, self.do_sample, self.top_k, self.temperature)
        return nxt.astype(jnp.int32), cache, key

    def _decode_horizon_impl(self, params, tokens, cache, lengths, page_tab, key, *, steps):
        """`steps` paged decode steps in ONE device program (host-latency
        amortization, same trick as the dense engine's horizon)."""

        def body(carry, _):
            tok, cache, lengths, key = carry
            logits, cache = paged_decode_step(
                params, self.cfg, tok, cache, lengths, page_tab
            )
            key, sub = jax.random.split(key)
            nxt = sample_token(
                logits, sub, self.do_sample, self.top_k, self.temperature
            ).astype(jnp.int32)
            return (nxt, cache, lengths + 1, key), nxt

        (tok, cache, lengths, key), toks = jax.lax.scan(
            body, (tokens, cache, lengths, key), None, length=steps
        )
        return toks, cache, key

    # -- host-side scheduling --------------------------------------------------
    def add_request(self, prompt_ids, max_new_tokens: int = 128) -> int:
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        t_pad = next_power_of_2(max(len(prompt), 2))
        need = -(-(len(prompt) + max_new_tokens) // self.pg)
        if need > self.mp or -(-t_pad // self.pg) > self.mp:
            raise ValueError(
                f"request needs {need} pages (> max_pages_per_seq={self.mp}); "
                f"raise max_pages_per_seq or shorten prompt/max_new_tokens"
            )
        self._uid += 1
        self.queue.append(
            Request(uid=self._uid, prompt=prompt, max_new_tokens=max_new_tokens)
        )
        return self._uid

    def _pages_needed(self, req: Request) -> int:
        return min(
            -(-(len(req.prompt) + req.max_new_tokens) // self.pg), self.mp
        )

    def _admit(self, slot: int, req: Request) -> None:
        need = self._pages_needed(req)
        pages = [self.free_pages.popleft() for _ in range(need)]
        self.slot_pages[slot] = pages
        self._page_tab[slot, :] = pages[0] if pages else 0
        self._page_tab[slot, : len(pages)] = pages

        t = len(req.prompt)
        t_pad = next_power_of_2(max(t, 2))
        # prefill must fit the allocated pages exactly: pad to page multiple
        t_cache = -(-t_pad // self.pg) * self.pg
        prompt = np.zeros((1, t_pad), np.int32)
        prompt[0, :t] = req.prompt
        mini = llama.init_cache(self.cfg, 1, t_cache, self._mini_dtype)
        logits, mini = self._prefill_jit(self.params, jnp.asarray(prompt), mini,
                                         t_pad=t_pad)
        self.cache = splice_prefill_into_pages(self.cache, mini, pages, t)

        self._key, sub = jax.random.split(self._key)
        first = sample_token(
            logits[:, t - 1], sub, self.do_sample, self.top_k, self.temperature
        )
        req.slot = slot
        req.output = [int(first[0])]
        self.active[slot] = req
        self._tokens[slot] = int(first[0])
        self._pos[slot] = t
        self._live[slot] = True
        self._maybe_finish(slot)

    def _release(self, slot: int) -> None:
        for p in self.slot_pages[slot]:
            self.free_pages.append(p)
        self.slot_pages[slot] = []
        self._page_tab[slot, :] = 0
        self._pos[slot] = 0
        self._tokens[slot] = 0

    def _maybe_finish(self, slot: int) -> None:
        req = self.active.get(slot)
        if req is None:
            return
        last = req.output[-1] if req.output else None
        out_of_pages = int(self._pos[slot]) + 1 >= len(self.slot_pages[slot]) * self.pg
        if (
            (self.eos is not None and last == self.eos)
            or len(req.output) >= req.max_new_tokens
            or out_of_pages
        ):
            req.done = True
            self.finished[req.uid] = req
            del self.active[slot]
            self._live[slot] = False
            self._release(slot)

    def _schedule(self) -> None:
        for slot in range(self.s):
            if not self._live[slot] and self.queue:
                if len(self.free_pages) < self._pages_needed(self.queue[0]):
                    return  # wait for pages
                self._admit(slot, self.queue.popleft())

    def step(self) -> int:
        self._schedule()
        if not self.active:
            return 0

        # full horizon only if every live slot has page room (avoid a
        # per-h recompile zoo: h is either `horizon` or 1)
        h = self.horizon
        if h > 1:
            room = min(
                len(self.slot_pages[s]) * self.pg - int(self._pos[s])
                for s in self.active
            )
            if room < h + 1:
                h = 1

        if h == 1:
            nxt, self.cache, self._key = self._decode_jit(
                self.params,
                jnp.asarray(self._tokens),
                self.cache,
                jnp.asarray(self._pos),
                jnp.asarray(self._page_tab),
                self._key,
            )
            toks = np.asarray(nxt)[None]
        else:
            toks, self.cache, self._key = self._horizon_jit(
                self.params,
                jnp.asarray(self._tokens),
                self.cache,
                jnp.asarray(self._pos),
                jnp.asarray(self._page_tab),
                self._key,
                steps=h,
            )
            toks = np.asarray(toks)

        for slot in list(self.active):
            for j in range(toks.shape[0]):
                req = self.active.get(slot)
                if req is None:
                    break
                req.output.append(int(toks[j, slot]))
                self._tokens[slot] = int(toks[j, slot])
                self._pos[slot] += 1
                self._maybe_finish(slot)
        return len(self.active)

    def run(self) -> Dict[int, List[int]]:
        while self.queue or self.active:
            self.step()
        return {uid: r.output for uid, r in self.finished.items()}
