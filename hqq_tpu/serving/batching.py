# SPDX-License-Identifier: Apache-2.0
"""Continuous-batching serving engine.

The TPU-native replacement for the reference's vLLM integration
(`/root/reference/hqq/utils/vllm.py` — the reference does not implement its
own scheduler; it plugs HQQ weights into vLLM's). This engine owns the whole
loop:

* a fixed pool of `batch_slots` decode slots backed by ONE static KV cache
  [L, S, n_kv, max_len, hd] — static shapes, so the decode step compiles once;
* per-slot positions (vector `start_pos`) so every slot decodes at its own
  offset — requests join and leave the batch without touching the others;
* prefill runs in a per-request mini-cache (bucketed prompt lengths) and is
  spliced into the slot's cache rows with one dynamic_update_slice;
* finished slots (EOS / max_new_tokens) retire on the host between steps and
  free slots are immediately refilled from the queue — continuous batching;
* on-the-fly quantization at load (≙ `HQQOnTheFlyConfig`, ref
  `utils/vllm.py:578-868`) falls out of the functional design: load fp
  weights, `quantize_model(...)`, serve.

Works with any forward following the llama contract, including the
`shard_map` tensor-parallel forward from `hqq_tpu.parallel.tp` (pass
`forward_fn=tp_forward_fn(...)` and a sharded cache).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from .generate import next_power_of_2, sample_token, sample_token_batch

__all__ = ["Request", "ContinuousBatchingEngine"]


@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray  # [T] int32
    max_new_tokens: int
    output: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None
    done: bool = False
    adapter_id: int = 0  # multi-LoRA: which adapter serves this request
    # per-request sampling parameters (None = engine default) — the vLLM
    # SamplingParams role (≙ ref `utils/vllm.py:578-868` riding vLLM's)
    do_sample: Optional[bool] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    temperature: Optional[float] = None
    # extra stop token ids beyond the engine's eos (checked host-side)
    stop_token_ids: Optional[List[int]] = None
    # multimodal: prompt embeddings [T, D] (image features already spliced
    # over placeholder ids) — prefill runs on these instead of token ids
    embeds: Optional[np.ndarray] = None
    # M-RoPE (qwen2_vl): explicit prefill position ids [3, T] and the decode
    # rope offset (mrope_position - token_count; 0 = standard RoPE)
    position_ids: Optional[np.ndarray] = None
    pos_offset: int = 0


def _effective_sampling(req: Request, do_sample, top_k, temperature, top_p):
    """Request params with engine defaults filled in (None = default)."""
    return (
        do_sample if req.do_sample is None else bool(req.do_sample),
        top_k if req.top_k is None else int(req.top_k),
        temperature if req.temperature is None else float(req.temperature),
        top_p if req.top_p is None else float(req.top_p),
    )


class ContinuousBatchingEngine:
    def __init__(
        self,
        params: Any,
        cfg: Any,
        batch_slots: int = 8,
        max_len: int = 1024,
        eos_token_id: Optional[int] = None,
        do_sample: bool = False,
        top_k: int = 20,
        top_p: float = 1.0,
        temperature: float = 0.6,
        cache_dtype=jnp.bfloat16,
        forward_fn: Optional[Callable] = None,
        embeds_forward_fn: Optional[Callable] = None,
        seed: int = 0,
        horizon: int = 1,
        quantize_kv: bool = False,
        mrope_offsets: bool = False,
    ):
        self.params = params
        self.cfg = cfg
        self.s = batch_slots
        self.max_len = max_len
        self.eos = eos_token_id
        self.do_sample = do_sample
        self.top_k = top_k
        self.top_p = top_p
        self.temperature = temperature
        self._fwd = forward_fn or (
            lambda p, toks, cache, pos: llama.forward(p, cfg, toks, cache, pos)
        )
        # multimodal prefill: forward over inputs_embeds (VL serving — the
        # vLLM role for LLaVA/Qwen2-VL checkpoints). Families whose forward
        # takes inputs_embeds work out of the box; others pass a custom fn.
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

        # quantize_kv: int8 KV pools with per-row scales — half the KV bytes
        # per decode step (same scheme as the paged engine's int8 pages)
        self.quantize_kv = bool(quantize_kv)
        self._cache_dtype = cache_dtype
        self.cache = llama.init_cache(cfg, batch_slots, max_len, cache_dtype,
                                      quantize_kv=quantize_kv)
        self._key = jax.random.PRNGKey(seed)

        # M-RoPE serving (qwen2_vl): per-slot decode rope offset; when the
        # flag is set, forward_fn/embeds_forward_fn receive an extra
        # positions argument (offsets vector / explicit [3,1,T] prefill ids)
        self._mrope = bool(mrope_offsets)
        self._pos_off = np.zeros((batch_slots,), np.int32)

        # host-side state
        self._adapter = np.zeros((batch_slots,), np.int32)
        # per-slot sampling params [4, S]: do_sample / top_k / temperature /
        # top_p — one array keeps the jitted decode signature stable while
        # every slot carries its own request's values
        self._samp = np.zeros((4, batch_slots), np.float32)
        self._samp[0] = 1.0 if do_sample else 0.0
        self._samp[1] = top_k
        self._samp[2] = temperature
        self._samp[3] = top_p
        self.queue: deque[Request] = deque()
        self.active: Dict[int, Request] = {}  # slot -> request
        self.finished: Dict[int, Request] = {}
        self._uid = 0
        self._tokens = np.zeros((batch_slots,), np.int32)  # next input token
        self._pos = np.zeros((batch_slots,), np.int32)  # write position
        self._live = np.zeros((batch_slots,), bool)

        # decode `horizon` steps per device call — amortizes host-dispatch
        # latency (huge over remote links; real hosts gain too). Finished
        # slots keep decoding masked garbage inside a horizon; their stale KV
        # is position-masked and overwritten on re-admission, so results are
        # identical to horizon=1.
        self.horizon = max(1, int(horizon))
        self._prefill_jit = jax.jit(self._prefill_impl, static_argnames=("t_pad",))
        self._prefill_embeds_jit = jax.jit(
            self._prefill_embeds_impl, static_argnames=("t_pad",)
        )
        self._prefill_embeds_pos_jit = jax.jit(
            self._prefill_embeds_pos_impl, static_argnames=("t_pad",)
        )
        self._decode_jit = jax.jit(self._decode_impl_lora)
        self._horizon_jit = jax.jit(self._decode_horizon_impl_lora,
                                    static_argnames=("steps",))

    def close(self):
        """Release device state promptly. The jitted step functions wrap
        bound methods, so the engine sits in a reference cycle that only a
        full gc pass breaks — until then the KV cache, compiled executables,
        and params stay pinned in HBM. Dropping the jit wrappers and device
        state frees everything at refcount zero. Call when replacing or
        discarding an engine; idempotent."""
        for attr in ("_prefill_jit", "_prefill_embeds_jit",
                     "_prefill_embeds_pos_jit", "_decode_jit",
                     "_horizon_jit", "_efwd", "_fwd"):
            self.__dict__.pop(attr, None)
        self.cache = None
        self.params = None

    # -- jitted kernels ------------------------------------------------------
    def _prefill_impl(self, params, tokens, mini_cache, adapter_ids, *, t_pad):
        from ..nn.multilora import adapter_context

        with adapter_context(adapter_ids):
            logits, mini_cache = self._fwd(params, tokens, mini_cache, 0)
        return logits, mini_cache

    def _prefill_embeds_impl(self, params, embeds, mini_cache, adapter_ids, *, t_pad):
        from ..nn.multilora import adapter_context

        with adapter_context(adapter_ids):
            logits, mini_cache = self._efwd(params, embeds, mini_cache, 0)
        return logits, mini_cache

    def _prefill_embeds_pos_impl(self, params, embeds, mini_cache, pos_ids,
                                 adapter_ids, *, t_pad):
        from ..nn.multilora import adapter_context

        with adapter_context(adapter_ids):
            logits, mini_cache = self._efwd(params, embeds, mini_cache, 0, pos_ids)
        return logits, mini_cache

    def _decode_impl(self, params, tokens, cache, pos, live, key, samp, offs=None):
        """One decode step for all slots; inactive slots are computed but
        ignored (static batch). `samp` [4, S] carries the per-slot sampling
        params (do_sample / top_k / temperature / top_p)."""
        if self._mrope:
            logits, cache = self._fwd(params, tokens[:, None], cache, pos, offs)
        else:
            logits, cache = self._fwd(params, tokens[:, None], cache, pos)
        key, sub = jax.random.split(key)
        nxt = sample_token_batch(
            logits[:, -1], sub, samp[0] > 0.5, samp[1].astype(jnp.int32),
            samp[2], samp[3],
        )
        return nxt.astype(jnp.int32), cache, key

    def _decode_impl_lora(self, params, tokens, cache, pos, live, key,
                          adapter_ids, samp, offs=None):
        from ..nn.multilora import adapter_context

        with adapter_context(adapter_ids):
            return self._decode_impl(params, tokens, cache, pos, live, key,
                                     samp, offs)

    def _decode_horizon_impl(self, params, tokens, cache, pos, key, samp,
                             offs=None, *, steps):
        """`steps` decode steps for all slots inside ONE device program."""

        def body(carry, _):
            tok, cache, pos, key = carry
            if self._mrope:
                logits, cache = self._fwd(params, tok[:, None], cache, pos, offs)
            else:
                logits, cache = self._fwd(params, tok[:, None], cache, pos)
            key, sub = jax.random.split(key)
            nxt = sample_token_batch(
                logits[:, -1], sub, samp[0] > 0.5, samp[1].astype(jnp.int32),
                samp[2], samp[3],
            ).astype(jnp.int32)
            return (nxt, cache, pos + 1, key), nxt

        (tok, cache, pos, key), toks = jax.lax.scan(
            body, (tokens, cache, pos, key), None, length=steps
        )
        return toks, cache, key  # toks: [steps, slots]

    def _decode_horizon_impl_lora(self, params, tokens, cache, pos, key,
                                  adapter_ids, samp, offs=None, *, steps):
        from ..nn.multilora import adapter_context

        with adapter_context(adapter_ids):
            return self._decode_horizon_impl(params, tokens, cache, pos, key,
                                             samp, offs, steps=steps)

    # -- public API -----------------------------------------------------------
    def add_request(self, prompt_ids, max_new_tokens: int = 128,
                    adapter_id: int = 0, inputs_embeds=None,
                    position_ids=None, pos_offset: int = 0,
                    do_sample: Optional[bool] = None,
                    top_k: Optional[int] = None,
                    top_p: Optional[float] = None,
                    temperature: Optional[float] = None,
                    stop_token_ids: Optional[List[int]] = None) -> int:
        """`inputs_embeds` [T, D]: multimodal prompt embeddings (vision
        features already spliced over placeholder ids) — prefill runs on
        these; decode proceeds on sampled token ids as usual (VL serving).

        M-RoPE (qwen2_vl): `position_ids` [3, T] explicit prefill rope ids
        and `pos_offset` (max_position + 1 - prompt_len) so decode rope runs
        at cache_length + offset; requires the engine to be built with
        mrope_offsets=True and an M-RoPE-aware forward_fn/embeds_forward_fn.

        do_sample / top_k / top_p / temperature: per-REQUEST sampling
        parameters (None = this engine's defaults); a greedy and a sampled
        request decode side by side in the same batch. stop_token_ids: extra
        stop ids beyond the engine's eos (the stop token is kept in the
        output, matching eos behavior)."""
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        t_pad = next_power_of_2(max(len(prompt), 2))
        if t_pad + max_new_tokens > self.max_len:
            raise ValueError(
                f"prompt ({len(prompt)} tokens, padded {t_pad}) + "
                f"max_new_tokens ({max_new_tokens}) exceeds max_len={self.max_len}"
            )
        if inputs_embeds is not None:
            inputs_embeds = np.asarray(inputs_embeds)
            assert inputs_embeds.ndim == 2 and inputs_embeds.shape[0] == len(prompt), (
                f"inputs_embeds must be [len(prompt)={len(prompt)}, D], "
                f"got {inputs_embeds.shape}"
            )
        if position_ids is not None:
            assert self._mrope, "position_ids requires mrope_offsets=True"
            assert inputs_embeds is not None, "position_ids requires inputs_embeds"
            position_ids = np.asarray(position_ids, np.int32).reshape(3, -1)
            assert position_ids.shape[1] == len(prompt)
        if pos_offset:
            assert self._mrope, "pos_offset requires mrope_offsets=True"
        if self._mrope and inputs_embeds is not None and position_ids is None:
            # the M-RoPE embeds forward requires explicit position ids; fail
            # at submission with a clear message instead of an opaque
            # TypeError inside the jitted prefill
            raise ValueError(
                "inputs_embeds on an mrope_offsets engine requires "
                "position_ids [3, T] (qwen2_vl M-RoPE prefill ids)"
            )
        self._uid += 1
        req = Request(
            uid=self._uid,
            prompt=prompt,
            max_new_tokens=max_new_tokens,
            adapter_id=int(adapter_id),
            embeds=inputs_embeds,
            position_ids=position_ids,
            pos_offset=int(pos_offset),
            do_sample=do_sample,
            top_k=top_k,
            top_p=top_p,
            temperature=temperature,
            stop_token_ids=list(stop_token_ids) if stop_token_ids else None,
        )
        self.queue.append(req)
        return req.uid

    def _admit(self, slot: int, req: Request) -> None:
        """Prefill `req` into `slot` (bucketed compile)."""
        t = len(req.prompt)
        t_pad = next_power_of_2(max(t, 2))
        prompt = np.zeros((1, t_pad), np.int32)
        prompt[0, :t] = req.prompt

        self._adapter[slot] = req.adapter_id
        ds, tk, tmp, tp = _effective_sampling(
            req, self.do_sample, self.top_k, self.temperature, self.top_p
        )
        self._samp[:, slot] = (1.0 if ds else 0.0, tk, tmp, tp)
        # prefill runs in a FULL-PRECISION mini-cache (so prefill logits and
        # the first sampled token are unaffected by KV quantization — same
        # split as the paged engine); rows quantize at the splice
        mini = llama.init_cache(self.cfg, 1, self.max_len, self._cache_dtype)
        self._pos_off[slot] = req.pos_offset
        if req.embeds is not None:
            d = req.embeds.shape[1]
            # cast to the cache dtype: mixed-dtype activations would fail the
            # in-place KV update (cache bf16 vs fp32 embeds)
            emb = np.zeros((1, t_pad, d), np.float32)
            emb[0, :t] = req.embeds
            emb = jnp.asarray(emb, self._cache_dtype)
            if req.position_ids is not None:
                # pad positions monotonically past the prompt (padded rows
                # write masked cache rows; their rope values are irrelevant)
                pid = np.zeros((3, 1, t_pad), np.int32)
                pid[:, 0, :t] = req.position_ids
                pid[:, 0, t:] = req.position_ids.max() + 1
                logits, mini = self._prefill_embeds_pos_jit(
                    self.params, emb, mini, jnp.asarray(pid),
                    jnp.asarray([req.adapter_id], jnp.int32), t_pad=t_pad,
                )
            else:
                logits, mini = self._prefill_embeds_jit(
                    self.params, emb, mini,
                    jnp.asarray([req.adapter_id], jnp.int32), t_pad=t_pad,
                )
        else:
            logits, mini = self._prefill_jit(
                self.params, jnp.asarray(prompt), mini,
                jnp.asarray([req.adapter_id], jnp.int32), t_pad=t_pad,
            )
        # splice the mini-cache into this slot's rows
        at = (0, slot, 0, 0, 0)
        if self.cache.quantized:
            from ..ops.paged import quant_rows

            kq, ks = quant_rows(mini.k)
            vq, vs = quant_rows(mini.v)
            self.cache = llama.KVCache(
                k=jax.lax.dynamic_update_slice(self.cache.k, kq, at),
                v=jax.lax.dynamic_update_slice(self.cache.v, vq, at),
                k_scales=jax.lax.dynamic_update_slice(self.cache.k_scales, ks, at),
                v_scales=jax.lax.dynamic_update_slice(self.cache.v_scales, vs, at),
            )
        else:
            self.cache = llama.KVCache(
                k=jax.lax.dynamic_update_slice(self.cache.k, mini.k, at),
                v=jax.lax.dynamic_update_slice(self.cache.v, mini.v, at),
            )
        self._key, sub = jax.random.split(self._key)
        first = sample_token(logits[:, t - 1], sub, ds, tk, tmp, tp)
        from ..utils.profiling import log_event

        log_event("request_admitted", uid=req.uid, slot=slot, prompt_len=t)
        req.slot = slot
        req.output = [int(first[0])]
        self.active[slot] = req
        self._tokens[slot] = int(first[0])
        self._pos[slot] = t
        self._live[slot] = True
        self._maybe_finish(slot)

    def _maybe_finish(self, slot: int) -> None:
        req = self.active.get(slot)
        if req is None:
            return
        last = req.output[-1] if req.output else None
        if (
            (self.eos is not None and last == self.eos)
            or (req.stop_token_ids and last in req.stop_token_ids)
            or len(req.output) >= req.max_new_tokens
            or int(self._pos[slot]) >= self.max_len - 1
        ):
            from ..utils.profiling import log_event

            log_event("request_finished", uid=req.uid, slot=slot,
                      n_tokens=len(req.output))
            req.done = True
            self.finished[req.uid] = req
            del self.active[slot]
            self._live[slot] = False

    def cancel(self, uid: int) -> bool:
        """Cancel a queued or running request. Returns True if found. A
        running request finishes immediately with the tokens produced so far
        (its slot frees on the next step)."""
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
                return True
        return False

    def _schedule(self) -> None:
        for slot in range(self.s):
            if not self._live[slot] and self.queue:
                self._admit(slot, self.queue.popleft())

    def step(self) -> int:
        """Admit pending requests, run one decode horizon. Returns #active."""
        self._schedule()
        if not self.active:
            return 0

        # horizon capped so no live slot can run past its cache
        h = self.horizon
        if h > 1:
            max_pos = max(int(self._pos[s]) for s in self.active)
            h = max(1, min(h, self.max_len - 1 - max_pos))

        if h == 1:
            nxt, self.cache, self._key = self._decode_jit(
                self.params,
                jnp.asarray(self._tokens),
                self.cache,
                jnp.asarray(self._pos),
                jnp.asarray(self._live),
                self._key,
                jnp.asarray(self._adapter),
                jnp.asarray(self._samp),
                jnp.asarray(self._pos_off) if self._mrope else None,
            )
            toks = np.asarray(nxt)[None]  # [1, slots]
        else:
            toks, self.cache, self._key = self._horizon_jit(
                self.params,
                jnp.asarray(self._tokens),
                self.cache,
                jnp.asarray(self._pos),
                self._key,
                jnp.asarray(self._adapter),
                jnp.asarray(self._samp),
                jnp.asarray(self._pos_off) if self._mrope else None,
                steps=h,
            )
            toks = np.asarray(toks)

        for slot in list(self.active):
            for j in range(toks.shape[0]):
                req = self.active.get(slot)
                if req is None:
                    break  # finished mid-horizon; drop remaining tokens
                req.output.append(int(toks[j, slot]))
                self._tokens[slot] = int(toks[j, slot])
                self._pos[slot] += 1
                self._maybe_finish(slot)
        return len(self.active)

    def run(self) -> Dict[int, List[int]]:
        """Drain the queue; returns {uid: generated token ids}."""
        while self.queue or self.active:
            self.step()
        return {uid: r.output for uid, r in self.finished.items()}
