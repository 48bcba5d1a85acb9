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
  double buffering, megacore) on TPU and
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
from ..ops.paged import (
    PagedKVCache,
    init_paged_cache,
    paged_attention_ref,
    quant_rows as _quant_rows,
)
from .batching import Request, _effective_sampling
from .generate import next_power_of_2, sample_token, sample_token_batch

__all__ = ["PagedKVCache", "PagedBatchingEngine", "paged_attention_ref", "init_paged_cache"]


def paged_decode_step(
    params: dict,
    cfg,
    tokens: Array,  # [B] int32
    cache: PagedKVCache,
    lengths: Array,  # [B] current sequence length (pos of the new token)
    page_indices: Array,  # [B, MP] int32
    pages_per_block: int = 4,
    forward_fn=None,
):
    """One decode step for all slots over the paged pool.

    Delegates to the family forward's paged branch (cache polymorphism —
    `llama._forward_paged` by default; pass `forward_fn` for other families
    or a tensor-parallel shard_map forward). Returns (logits [B, V], cache).
    """
    fwd = forward_fn or (
        lambda p, toks, c, lens, ptab: llama.forward(
            p, cfg, toks, c, lens, page_indices=ptab
        )
    )
    logits, cache = fwd(params, tokens[:, None], cache, lengths, page_indices)
    return logits[:, -1], cache


def splice_prefill_into_pages(
    cache: PagedKVCache, mini: llama.KVCache, pages: List[int], t_real: int,
    start_tok: int = 0,
) -> PagedKVCache:
    """Copy a dense prefill mini-cache [L, 1, H, T_pad, hd] into `pages`.

    `start_tok` (a page multiple) skips the leading tokens — used by prefix
    caching, where the leading pages already live in the pool."""
    pg = cache.page_size
    assert start_tok % pg == 0
    k_pool, v_pool = cache.k, cache.v
    ks_pool, vs_pool = cache.k_scales, cache.v_scales
    n_full = -(-(t_real - start_tok) // pg)
    for j in range(n_full):
        off = start_tok + j * pg
        chunk_k = jax.lax.dynamic_slice_in_dim(mini.k[:, 0], off, pg, axis=2)
        chunk_v = jax.lax.dynamic_slice_in_dim(mini.v[:, 0], off, pg, axis=2)
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
        top_p: float = 1.0,
        temperature: float = 0.6,
        cache_dtype=jnp.bfloat16,
        quantize_kv: bool = False,
        seed: int = 0,
        horizon: int = 1,
        forward_fn=None,
        embeds_forward_fn=None,
        enable_prefix_cache: bool = False,
        prefill_chunk: "int | None" = None,
    ):
        """forward_fn: family/TP injection point (≙ the dense engine's).
        Signature: (params, tokens [B,T], cache, start_pos, page_indices) ->
        (logits, cache); called with a dense mini-cache (page_indices=None)
        for prefill and with the PagedKVCache for decode. Defaults to the
        Llama-family forward (covers llama / mistral / qwen2 / qwen3).

        enable_prefix_cache: automatic prefix caching (the vLLM feature the
        reference inherits): full prompt pages are content-hashed; a new
        request whose prompt shares a page-aligned prefix with a cached one
        REUSES those pages — skipping both their KV memory and their prefill
        compute (only the suffix runs). Cached pages are refcounted and
        LRU-evicted when the free pool runs dry.

        prefill_chunk: CHUNKED PREFILL (vLLM-style): long prompts prefill in
        chunks of this many tokens, one chunk per `step()`, interleaved with
        decode of the active slots — a long prompt no longer stalls every
        running request for its whole prefill. Powers of two keep the
        compile-cache bucket count at one."""
        self.params = params
        self.cfg = cfg
        self._fwd = forward_fn or (
            lambda p, toks, cache, pos, ptab=None: llama.forward(
                p, cfg, toks, cache, pos, page_indices=ptab
            )
        )
        # multimodal prefill over inputs_embeds (VL serving); families whose
        # forward takes inputs_embeds work out of the box
        # With a custom forward_fn (family/TP injection) the llama default
        # would run the WRONG model on the params (e.g. unsharded forward on
        # a TP tree) — require an explicit embeds_forward_fn then.
        if embeds_forward_fn is None and forward_fn is not None:
            def _no_efwd(*a, **k):
                raise ValueError(
                    "inputs_embeds request on an engine with a custom "
                    "forward_fn: pass embeds_forward_fn too (the default "
                    "llama inputs_embeds forward does not apply)"
                )
            self._efwd = _no_efwd
        else:
            self._efwd = embeds_forward_fn or (
                lambda p, e, cache, pos: llama.forward(
                    p, cfg, None, cache, pos, inputs_embeds=e
                )
            )
        self.s = batch_slots
        self.pg = page_size
        assert max_pages_per_seq % 4 == 0, "max_pages_per_seq must be a multiple of 4"
        self.mp = max_pages_per_seq
        self.eos = eos_token_id
        self.do_sample = do_sample
        self.top_k = top_k
        self.top_p = top_p
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
        # multi-LoRA: per-slot adapter ids (same MultiLoRALinear +
        # adapter_context routing as the dense engine)
        self._adapter = np.zeros((batch_slots,), np.int32)
        # per-slot sampling params [4, S]: do_sample/top_k/temperature/top_p
        self._samp = np.zeros((4, batch_slots), np.float32)
        self._samp[0] = 1.0 if do_sample else 0.0
        self._samp[1] = top_k
        self._samp[2] = temperature
        self._samp[3] = top_p

        # prefix cache: chain-digest -> page id (OrderedDict = LRU order)
        from collections import OrderedDict

        self._prefix_cache: "OrderedDict[bytes, int] | None" = (
            OrderedDict() if enable_prefix_cache else None
        )
        self._page_ref: Dict[int, int] = {}   # cached page -> active users
        self._page_key: Dict[int, bytes] = {}
        self._slot_cached: List[List[int]] = [[] for _ in range(batch_slots)]
        self.prefix_cache_hits = 0  # pages reused (observability)

        self.prefill_chunk = prefill_chunk
        # slots mid-chunked-prefill: slot -> state dict (occupied, not live)
        self._prefilling: Dict[int, dict] = {}

        self.horizon = max(1, int(horizon))
        self._decode_jit = jax.jit(self._decode_impl)
        self._horizon_jit = jax.jit(self._decode_horizon_impl, static_argnames=("steps",))
        self._prefill_jit = jax.jit(self._prefill_impl, static_argnames=("t_pad",))
        self._prefill_embeds_jit = jax.jit(
            self._prefill_embeds_impl, static_argnames=("t_pad",)
        )
        self._load_prefix_jit = jax.jit(self._load_prefix_impl)

    def close(self):
        """Release device state promptly (page pool, executables, params) —
        see `ContinuousBatchingEngine.close` for why the jit wrappers must
        be dropped explicitly. Idempotent."""
        for attr in ("_decode_jit", "_horizon_jit", "_prefill_jit",
                     "_prefill_embeds_jit", "_load_prefix_jit",
                     "_efwd", "_fwd"):
            self.__dict__.pop(attr, None)
        self.cache = None
        self.params = None

    # -- jitted kernels ------------------------------------------------------
    def _prefill_impl(self, params, tokens, mini_cache, start_pos, adapter_ids,
                      *, t_pad):
        from ..nn.multilora import adapter_context

        with adapter_context(adapter_ids):
            return self._fwd(params, tokens, mini_cache, start_pos)

    def _prefill_embeds_impl(self, params, embeds, mini_cache, start_pos,
                             adapter_ids, *, t_pad):
        from ..nn.multilora import adapter_context

        with adapter_context(adapter_ids):
            return self._efwd(params, embeds, mini_cache, start_pos)

    def _load_prefix_impl(self, mini, cache, pages):
        """Gather cached prefix pages into the dense mini-cache rows
        [0, n*pg) (dequantizing int8 pools on the fly)."""
        n = pages.shape[0]
        pg = cache.page_size
        k = jnp.take(cache.k, pages, axis=2)  # [L, H, n, pg, hd]
        v = jnp.take(cache.v, pages, axis=2)
        if cache.quantized:
            ks = jnp.take(cache.k_scales, pages, axis=2)
            vs = jnp.take(cache.v_scales, pages, axis=2)
            k = k.astype(jnp.float32) * (ks / 127.0)
            v = v.astype(jnp.float32) * (vs / 127.0)
        L, H = k.shape[0], k.shape[1]
        hd = k.shape[-1]
        k = k.reshape(L, H, n * pg, hd)[:, None].astype(mini.k.dtype)
        v = v.reshape(L, H, n * pg, hd)[:, None].astype(mini.v.dtype)
        return llama.KVCache(
            k=jax.lax.dynamic_update_slice(mini.k, k, (0, 0, 0, 0, 0)),
            v=jax.lax.dynamic_update_slice(mini.v, v, (0, 0, 0, 0, 0)),
        )

    def _decode_impl(self, params, tokens, cache, lengths, page_tab, key,
                     adapter_ids, samp):
        from ..nn.multilora import adapter_context

        with adapter_context(adapter_ids):
            logits, cache = self._fwd(params, tokens[:, None], cache, lengths,
                                      page_tab)
        key, sub = jax.random.split(key)
        nxt = sample_token_batch(
            logits[:, -1], sub, samp[0] > 0.5, samp[1].astype(jnp.int32),
            samp[2], samp[3],
        )
        return nxt.astype(jnp.int32), cache, key

    def _decode_horizon_impl(self, params, tokens, cache, lengths, page_tab,
                             key, adapter_ids, samp, *, steps):
        """`steps` paged decode steps in ONE device program (host-latency
        amortization, same trick as the dense engine's horizon)."""
        from ..nn.multilora import adapter_context

        def body(carry, _):
            tok, cache, lengths, key = carry
            with adapter_context(adapter_ids):
                logits, cache = self._fwd(params, tok[:, None], cache, lengths,
                                          page_tab)
            key, sub = jax.random.split(key)
            nxt = sample_token_batch(
                logits[:, -1], sub, samp[0] > 0.5, samp[1].astype(jnp.int32),
                samp[2], samp[3],
            ).astype(jnp.int32)
            return (nxt, cache, lengths + 1, key), nxt

        (tok, cache, lengths, key), toks = jax.lax.scan(
            body, (tokens, cache, lengths, key), None, length=steps
        )
        return toks, cache, key

    # -- host-side scheduling --------------------------------------------------
    def add_request(self, prompt_ids, max_new_tokens: int = 128,
                    inputs_embeds=None, adapter_id: int = 0,
                    do_sample: Optional[bool] = None,
                    top_k: Optional[int] = None,
                    top_p: Optional[float] = None,
                    temperature: Optional[float] = None,
                    stop_token_ids: Optional[List[int]] = None) -> int:
        """`inputs_embeds` [T, D]: multimodal prompt embeddings (VL serving).
        Embeds requests bypass the prefix cache — page keys hash TOKEN
        content, and image placeholders repeat the same id, so two requests
        with different images would alias — and prefill unchunked.

        adapter_id: multi-LoRA adapter for this request (0 = no adapter;
        params must hold MultiLoRALinear layers — same contract as the dense
        engine). Prefix-cache page keys are seeded with the adapter id: LoRA
        changes the KV content, so pages are only shared within an adapter.

        do_sample / top_k / top_p / temperature / stop_token_ids: per-request
        sampling (None = engine defaults), same semantics as the dense
        engine's `add_request`."""
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        t_pad = next_power_of_2(max(len(prompt), 2))
        need = -(-(len(prompt) + max_new_tokens) // self.pg)
        if need > self.mp or -(-t_pad // self.pg) > self.mp:
            raise ValueError(
                f"request needs {need} pages (> max_pages_per_seq={self.mp}); "
                f"raise max_pages_per_seq or shorten prompt/max_new_tokens"
            )
        if inputs_embeds is not None:
            inputs_embeds = np.asarray(inputs_embeds)
            assert inputs_embeds.ndim == 2 and inputs_embeds.shape[0] == len(prompt), (
                f"inputs_embeds must be [len(prompt)={len(prompt)}, D], "
                f"got {inputs_embeds.shape}"
            )
        self._uid += 1
        self.queue.append(
            Request(uid=self._uid, prompt=prompt, max_new_tokens=max_new_tokens,
                    embeds=inputs_embeds, adapter_id=int(adapter_id),
                    do_sample=do_sample, top_k=top_k, top_p=top_p,
                    temperature=temperature,
                    stop_token_ids=list(stop_token_ids) if stop_token_ids else None)
        )
        return self._uid

    def _pages_needed(self, req: Request) -> int:
        return min(
            -(-(len(req.prompt) + req.max_new_tokens) // self.pg), self.mp
        )

    # -- prefix cache helpers -------------------------------------------------
    def _prefix_keys(self, prompt: np.ndarray, adapter_id: int = 0) -> list:
        """Chain digests of the prompt's cacheable full pages. The page
        holding the LAST prompt token is never cached/shared: decode writes
        into it when the prompt isn't page-aligned, and even when it is, the
        last token must re-run to produce logits.

        The chain is seeded with the adapter id: a LoRA adapter changes the
        KV content of a page, so identical prompts under different adapters
        must never share pages."""
        import hashlib

        t, pg = len(prompt), self.pg
        full = t // pg
        if full * pg == t:
            full -= 1
        keys, h = [], b"adapter:%d" % adapter_id
        for j in range(max(full, 0)):
            h = hashlib.sha1(h + prompt[j * pg : (j + 1) * pg].tobytes()).digest()
            keys.append(h)
        return keys

    def _evictable(self) -> int:
        if self._prefix_cache is None:
            return 0
        return sum(
            1 for p in self._prefix_cache.values() if self._page_ref.get(p, 0) == 0
        )

    def _free_capacity(self) -> int:
        return len(self.free_pages) + self._evictable()

    def _evict_for(self, need: int) -> None:
        """LRU-evict unreferenced cached pages until `need` pages are free."""
        if self._prefix_cache is None:
            return
        for key in list(self._prefix_cache):
            if len(self.free_pages) >= need:
                break
            page = self._prefix_cache[key]
            if self._page_ref.get(page, 0) == 0:
                del self._prefix_cache[key]
                self._page_ref.pop(page, None)
                self._page_key.pop(page, None)
                self.free_pages.append(page)

    def _admit(self, slot: int, req: Request) -> None:
        need = self._pages_needed(req)
        t = len(req.prompt)
        self._adapter[slot] = req.adapter_id
        ds, tk, tmp, tp = _effective_sampling(
            req, self.do_sample, self.top_k, self.temperature, self.top_p
        )
        self._samp[:, slot] = (1.0 if ds else 0.0, tk, tmp, tp)

        # longest cached page-aligned prefix (contiguous leading hits only).
        # Embeds (multimodal) requests never use the prefix cache: keys hash
        # token content, and repeated image-placeholder ids would alias
        # requests carrying different images.
        shared: List[int] = []
        keys: list = []
        if self._prefix_cache is not None and req.embeds is None:
            keys = self._prefix_keys(req.prompt, req.adapter_id)
            for j, key in enumerate(keys):
                page = self._prefix_cache.get(key)
                if page is None:
                    break
                shared.append(page)
                self._prefix_cache.move_to_end(key)  # LRU touch
        n_shared = len(shared)
        self.prefix_cache_hits += n_shared

        self._evict_for(need - n_shared)
        pages_new = [self.free_pages.popleft() for _ in range(need - n_shared)]
        pages = shared + pages_new
        for p in shared:
            self._page_ref[p] = self._page_ref.get(p, 0) + 1
        self.slot_pages[slot] = pages
        self._slot_cached[slot] = list(shared)
        # filler entries point at the scratch page 0 (never read thanks to
        # the length mask; a speculative window's overflow writes land there
        # harmlessly instead of wrapping onto the slot's own first page)
        self._page_tab[slot, :] = 0
        self._page_tab[slot, : len(pages)] = pages

        s0 = n_shared * self.pg  # first token that must actually run
        t_suf = t - s0
        t_pad_total = next_power_of_2(max(t_suf, 2))
        # prefill must fit the allocated pages exactly: pad to page multiple
        t_cache = s0 + -(-t_pad_total // self.pg) * self.pg
        mini = llama.init_cache(self.cfg, 1, t_cache, self._mini_dtype)
        if n_shared:
            mini = self._load_prefix_jit(
                mini, self.cache, jnp.asarray(shared, jnp.int32)
            )

        if (self.prefill_chunk is not None and t_suf > self.prefill_chunk
                and req.embeds is None):
            # chunked prefill: one chunk per step(), interleaved with decode.
            # The block table stays zeroed (scratch page) until activation so
            # other slots' masked dead writes can't touch these pages.
            self._prefilling[slot] = dict(
                req=req, mini=mini, t=t, s0=s0, done=s0,
                pages=pages, pages_new=pages_new, keys=keys, n_shared=n_shared,
            )
            self._page_tab[slot, :] = 0
            self._advance_prefill(slot)  # first chunk now
            return

        if req.embeds is not None:
            d = req.embeds.shape[1]
            # cast to the mini-cache dtype (same reason as the dense engine:
            # the in-place KV update requires matching dtypes)
            emb = np.zeros((1, t_pad_total, d), np.float32)
            emb[0, :t_suf] = req.embeds[s0:]
            logits, mini = self._prefill_embeds_jit(
                self.params, jnp.asarray(emb, self._mini_dtype), mini,
                jnp.asarray(s0, jnp.int32),
                jnp.asarray([req.adapter_id], jnp.int32), t_pad=t_pad_total,
            )
        else:
            suffix = np.zeros((1, t_pad_total), np.int32)
            suffix[0, :t_suf] = req.prompt[s0:]
            logits, mini = self._prefill_jit(
                self.params, jnp.asarray(suffix), mini, jnp.asarray(s0, jnp.int32),
                jnp.asarray([req.adapter_id], jnp.int32), t_pad=t_pad_total,
            )
        self._finish_prefill(slot, req, mini, logits, t_suf - 1, t, s0,
                             pages, pages_new, keys, n_shared)

    def _finish_prefill(self, slot, req, mini, logits, first_idx, t, s0,
                        pages, pages_new, keys, n_shared):
        """Splice the completed prefill into pages, register cacheable
        prompt pages, sample the first token, activate the slot."""
        self.cache = splice_prefill_into_pages(
            self.cache, mini, pages_new, t, start_tok=s0
        )
        # register this prompt's own full pages for future reuse (only AFTER
        # their KV is actually in the pool)
        if self._prefix_cache is not None:
            for j in range(n_shared, len(keys)):
                key, page = keys[j], pages[j]
                if key not in self._prefix_cache:
                    self._prefix_cache[key] = page
                    self._page_key[page] = key
                    self._page_ref[page] = self._page_ref.get(page, 0) + 1
                    self._slot_cached[slot].append(page)

        self._page_tab[slot, :] = 0
        self._page_tab[slot, : len(pages)] = pages

        self._key, sub = jax.random.split(self._key)
        ds, tk, tmp, tp = _effective_sampling(
            req, self.do_sample, self.top_k, self.temperature, self.top_p
        )
        first = sample_token(logits[:, first_idx], sub, ds, tk, tmp, tp)
        from ..utils.profiling import log_event

        log_event("request_admitted", uid=req.uid, slot=slot, prompt_len=t,
                  pages=len(pages), prefix_pages_reused=n_shared)
        req.slot = slot
        req.output = [int(first[0])]
        self.active[slot] = req
        self._tokens[slot] = int(first[0])
        self._pos[slot] = t
        self._live[slot] = True
        self._maybe_finish(slot)

    def _advance_prefill(self, slot: int) -> None:
        """Run ONE prefill chunk for a pending slot; activate when done."""
        st = self._prefilling[slot]
        req, t = st["req"], st["t"]
        start = st["done"]
        n = min(self.prefill_chunk, t - start)
        t_pad = next_power_of_2(max(n, 2))
        buf = np.zeros((1, t_pad), np.int32)
        buf[0, :n] = req.prompt[start : start + n]
        logits, st["mini"] = self._prefill_jit(
            self.params, jnp.asarray(buf), st["mini"],
            jnp.asarray(start, jnp.int32),
            jnp.asarray([req.adapter_id], jnp.int32), t_pad=t_pad,
        )
        st["done"] = start + n
        if st["done"] >= t:
            del self._prefilling[slot]
            self._finish_prefill(
                slot, req, st["mini"], logits, n - 1, t, st["s0"],
                st["pages"], st["pages_new"], st["keys"], st["n_shared"],
            )

    def _release(self, slot: int) -> None:
        cached = set(self._slot_cached[slot])
        for p in self.slot_pages[slot]:
            if p in cached:
                # stays resident (reusable prefix); evicted only when the
                # free pool runs dry and its refcount is zero
                self._page_ref[p] = max(self._page_ref.get(p, 1) - 1, 0)
            else:
                self.free_pages.append(p)
        self.slot_pages[slot] = []
        self._slot_cached[slot] = []
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
            or (req.stop_token_ids and last in req.stop_token_ids)
            or len(req.output) >= req.max_new_tokens
            or out_of_pages
        ):
            from ..utils.profiling import log_event

            log_event("request_finished", uid=req.uid, slot=slot,
                      n_tokens=len(req.output))
            req.done = True
            self.finished[req.uid] = req
            del self.active[slot]
            self._live[slot] = False
            self._release(slot)

    def cancel(self, uid: int) -> bool:
        """Cancel a queued or running request; running requests release
        their pages immediately. Returns True if found."""
        for i, req in enumerate(self.queue):
            if req.uid == uid:
                del self.queue[i]
                req.done = True
                self.finished[uid] = req
                return True
        for slot, req in list(self.active.items()):
            if req.uid == uid:
                req.done = True
                self.finished[uid] = req
                del self.active[slot]
                self._live[slot] = False
                self._release(slot)
                return True
        for slot, st in list(self._prefilling.items()):
            if st["req"].uid == uid:
                st["req"].done = True
                self.finished[uid] = st["req"]
                del self._prefilling[slot]
                self._release(slot)
                return True
        return False

    def _schedule(self) -> None:
        """Fill free slots from the queue. Admission scans past requests that
        don't fit the current free-page pool (no head-of-line blocking): a
        small request behind a large one is admitted first; FIFO order is
        preserved among requests of equal feasibility."""
        for slot in range(self.s):
            if self._live[slot] or slot in self._prefilling or not self.queue:
                continue
            free = self._free_capacity()
            pick = None
            for idx, req in enumerate(self.queue):
                if self._pages_needed(req) <= free:
                    pick = idx
                    break
            if pick is None:
                return  # nothing fits until pages free up
            req = self.queue[pick]
            del self.queue[pick]
            self._admit(slot, req)

    def step(self) -> int:
        self._schedule()
        for slot in list(self._prefilling):
            self._advance_prefill(slot)
        if not self.active:
            return len(self._prefilling)

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
                jnp.asarray(self._adapter),
                jnp.asarray(self._samp),
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
                jnp.asarray(self._adapter),
                jnp.asarray(self._samp),
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
        return len(self.active) + len(self._prefilling)

    def run(self) -> Dict[int, List[int]]:
        while self.queue or self.active or self._prefilling:
            self.step()
        return {uid: r.output for uid, r in self.finished.items()}
