# SPDX-License-Identifier: Apache-2.0
"""Speculative decoding — draft/verify generation, exact w.r.t. the target.

Greedy mode accepts the longest prefix matching the target's argmax choices;
sampling mode implements full rejection sampling (Leviathan et al. 2023) on
device, so the output DISTRIBUTION equals sampling from the target alone.

A cheap DRAFT model (e.g. the same network quantized to 2-bit, or a smaller
family member) proposes k tokens autoregressively; the TARGET model scores
the whole window in ONE forward, accepts a prefix, and supplies the next
token (greedy correction or residual-distribution sample). In greedy mode
the output sequence is bit-identical to the target's vanilla greedy decode —
the draft only changes wall-clock, never content.

Not in the reference library at all; natively cheap here because the static
KV caches are position-masked (stale entries past the current position are
never attended, so rejected speculative KV needs no rollback — it is simply
overwritten).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import llama
from .generate import next_power_of_2

__all__ = [
    "SpeculativeGenerator",
    "SpeculativeBatchingEngine",
    "SpeculativePagedEngine",
]


def _spec_accept(target_logits, draft_logits, proposals, key, temperature):
    """On-device rejection sampling (Leviathan et al.): returns
    (n_accepted, next_token). Guarantees the output distribution equals
    sampling from the target alone.

    target_logits [k+1, V] (positions pos..pos+k), draft_logits [k, V],
    proposals [k]."""
    k = proposals.shape[0]
    pt = jax.nn.softmax(target_logits.astype(jnp.float32) / temperature, axis=-1)
    pd = jax.nn.softmax(draft_logits.astype(jnp.float32) / temperature, axis=-1)

    keys = jax.random.split(key, k + 1)

    def body(carry, i):
        done, n_acc, nxt = carry
        d_i = proposals[i]
        ratio = pt[i, d_i] / jnp.maximum(pd[i, d_i], 1e-20)
        u = jax.random.uniform(keys[i])
        accept = jnp.logical_and(jnp.logical_not(done), u < ratio)
        # residual distribution on rejection
        resid = jnp.maximum(pt[i] - pd[i], 0.0)
        resid = resid / jnp.maximum(resid.sum(), 1e-20)
        rej_tok = jax.random.categorical(keys[i], jnp.log(resid + 1e-20))
        newly_rejected = jnp.logical_and(jnp.logical_not(done), jnp.logical_not(accept))
        nxt = jnp.where(newly_rejected, rej_tok, nxt)
        n_acc = n_acc + jnp.where(accept, 1, 0)
        done = jnp.logical_or(done, newly_rejected)
        return (done, n_acc, nxt), None

    (done, n_acc, nxt), _ = jax.lax.scan(
        body, (jnp.asarray(False), jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)),
        jnp.arange(k),
    )
    bonus = jax.random.categorical(keys[k], jnp.log(pt[k] + 1e-20))
    nxt = jnp.where(done, nxt, bonus)
    return n_acc, nxt.astype(jnp.int32)


class SpeculativeGenerator:
    """Greedy speculative decoding over two param trees sharing one config
    family (target and draft must use the same tokenizer/vocab)."""

    def __init__(
        self,
        target_params: Any,
        draft_params: Any,
        cfg: Any,
        k: int = 4,
        draft_cfg: Optional[Any] = None,
        forward_fn: Optional[Callable] = None,
        cache_dtype=jnp.bfloat16,
        do_sample: bool = False,
        temperature: float = 1.0,
        eos_token_id: Optional[int] = None,
        seed: int = 0,
    ):
        self.pt = target_params
        self.pd = draft_params
        self.cfg = cfg
        self.dcfg = draft_cfg or cfg
        self.k = int(k)
        self.cache_dtype = cache_dtype
        self.do_sample = do_sample
        self.temperature = float(temperature)
        self.eos = eos_token_id
        self._key = jax.random.PRNGKey(seed)
        fwd = forward_fn or llama.forward

        self._tgt_fwd = jax.jit(lambda p, t, c, s: fwd(p, self.cfg, t, c, s))
        self._drf_fwd = jax.jit(lambda p, t, c, s: fwd(p, self.dcfg, t, c, s))
        self._accept = jax.jit(
            lambda tl, dl, props, key: _spec_accept(tl, dl, props, key, self.temperature)
        )
        self._fwd_raw = fwd
        self._round = jax.jit(self._round_impl)

    def _round_impl(self, pt, pd, tc, dc, tok, pos, key):
        """ONE speculative round as a single on-device program: ingest `tok`
        into the draft at `pos`, chain k draft proposals with a lax.scan
        (each sampled/argmaxed on device and fed back), verify the
        [tok]+proposals window with one target forward, and resolve the
        accept count on device. Returns (tc, dc, packed [k+2] int32 of
        merged-tokens ++ n_acc) — the host fetches ONE tiny array per round
        instead of 2k+3 per-token round trips (measured 2.2 tok/s over the
        axon tunnel before; the tunnel's ~30 ms dispatch made every host
        sync a disaster — ≙ the CUDA-graph capture the reference gets from
        vLLM, done the XLA way)."""
        k = self.k
        fwd = self._fwd_raw

        def pick_dev(logits, key_i):
            if self.do_sample:
                return jax.random.categorical(
                    key_i, logits.astype(jnp.float32) / self.temperature
                ).astype(jnp.int32)
            return jnp.argmax(logits).astype(jnp.int32)

        dl0, dc = fwd(pd, self.dcfg, tok[None, None], dc, pos)

        def body(carry, key_i):
            prev_logits, dc, dpos = carry
            prop = pick_dev(prev_logits, key_i)
            dl, dc = fwd(pd, self.dcfg, prop[None, None], dc, dpos)
            return (dl[0, -1], dc, dpos + 1), (prop, prev_logits)

        keys = jax.random.split(key, k + 1)
        (_, dc, _), (props, dlog) = jax.lax.scan(
            body, (dl0[0, -1], dc, pos + 1), keys[:k]
        )

        window = jnp.concatenate([tok[None], props])[None]  # [1, k+1]
        tl, tc = fwd(pt, self.cfg, window, tc, pos)
        tl = tl[0]  # [k+1, V]

        if self.do_sample:
            n_acc, nxt = _spec_accept(tl, dlog, props, keys[k], self.temperature)
        else:
            greedy = jnp.argmax(tl, axis=-1).astype(jnp.int32)  # [k+1]
            matches = props == greedy[:k]
            n_acc = jnp.where(jnp.all(matches), k,
                              jnp.argmin(matches.astype(jnp.int32)))
            nxt = greedy[n_acc]
        merged = jnp.concatenate([props, jnp.zeros(1, jnp.int32)])
        merged = merged.at[n_acc].set(nxt)
        return tc, dc, jnp.concatenate([merged, n_acc[None].astype(jnp.int32)])

    def generate(self, input_ids, max_new_tokens: int = 128) -> np.ndarray:
        """Returns generated ids [1, <=max_new_tokens] — bit-identical to the
        target model's greedy decode."""
        ids = np.asarray(input_ids).reshape(1, -1).astype(np.int32)
        t0 = ids.shape[1]
        cache_len = next_power_of_2(t0 + max_new_tokens + self.k + 2)

        tc = llama.init_cache(self.cfg, 1, cache_len, self.cache_dtype)
        dc = llama.init_cache(self.dcfg, 1, cache_len, self.cache_dtype)

        t_pad = next_power_of_2(max(t0, 2))
        prompt = np.zeros((1, t_pad), np.int32)
        prompt[0, :t0] = ids[0]
        tl, tc = self._tgt_fwd(self.pt, jnp.asarray(prompt), tc, 0)
        _, dc = self._drf_fwd(self.pd, jnp.asarray(prompt), dc, 0)

        self._key, sub = jax.random.split(self._key)
        tok = self._pick(tl[0, t0 - 1], sub)
        out = [tok]
        pos = t0  # caches hold positions < pos; `tok` sits at pos next

        # Each round is ONE fused device program (_round_impl): draft-scan k
        # proposals, verify, accept — the host fetches a [k+2] int vector and
        # extends the output. Stale cache rows past the accept point are
        # overwritten as pos advances and masked until then.
        while len(out) < max_new_tokens:
            self._key, sub = jax.random.split(self._key)
            tc, dc, packed = self._round(
                self.pt, self.pd, tc, dc,
                jnp.asarray(tok, jnp.int32), jnp.asarray(pos, jnp.int32), sub,
            )
            res = np.asarray(packed)
            accepted = int(res[self.k + 1])
            new = res[: accepted + 1].tolist()
            out.extend(new)
            tok = new[-1]
            pos += len(new)
            if self.eos is not None and self.eos in new:
                cut = len(out) - len(new) + new.index(self.eos) + 1
                out = out[:cut]
                break

        return np.asarray(out[:max_new_tokens], np.int32)[None]

    def _pick(self, logits, key) -> int:
        if self.do_sample:
            return int(jax.random.categorical(key, logits.astype(jnp.float32) / self.temperature))
        return int(jnp.argmax(logits))


class SpeculativeBatchingEngine:
    """Continuous batching WITH batched speculative decoding (greedy-exact).

    Same public API as `ContinuousBatchingEngine` (add_request / step / run /
    cancel); each step drafts `k_draft` tokens per slot with the cheap draft
    model, verifies the whole window in ONE target forward of width k_draft,
    and commits the longest matching prefix plus the target's correction —
    1..k_draft tokens per slot per step, token-for-token identical to plain
    greedy decoding of the target (the draft only changes wall-clock).

    ≙ what vLLM's speculative decoding gives the reference's users, built on
    the same position-masked static KV trick as `SpeculativeGenerator`
    (rejected speculative KV needs no rollback — stale rows past each slot's
    position are never attended and get overwritten).
    """

    def __init__(
        self,
        params: Any,
        draft_params: Any,
        cfg: Any,
        draft_cfg: Optional[Any] = None,
        k_draft: int = 4,
        batch_slots: int = 8,
        max_len: int = 1024,
        eos_token_id: Optional[int] = None,
        cache_dtype=jnp.bfloat16,
        forward_fn: Optional[Callable] = None,
        draft_forward_fn: Optional[Callable] = None,
    ):
        from .batching import ContinuousBatchingEngine

        # reuse the dense engine for state + prefill/scheduling machinery
        self._eng = ContinuousBatchingEngine(
            params, cfg, batch_slots=batch_slots, max_len=max_len,
            eos_token_id=eos_token_id, do_sample=False,
            cache_dtype=cache_dtype, forward_fn=forward_fn,
        )
        self.dcfg = draft_cfg or cfg
        self.draft_params = draft_params
        self._dfwd = draft_forward_fn or (
            lambda p, toks, cache, pos: llama.forward(p, self.dcfg, toks, cache, pos)
        )
        self.dcache = llama.init_cache(self.dcfg, batch_slots, max_len, cache_dtype)
        self.k = int(k_draft)
        assert self.k >= 2
        self._spec_jit = jax.jit(self._spec_step_impl)
        self._dprefill_jit = jax.jit(
            lambda p, tk, c: self._dfwd(p, tk, c, 0)
        )

    def close(self):
        """Release device state promptly (see `ContinuousBatchingEngine.close`).
        Cascades to the inner dense engine. Idempotent."""
        for attr in ("_spec_jit", "_dprefill_jit", "_dfwd"):
            self.__dict__.pop(attr, None)
        self.dcache = None
        self.draft_params = None
        self._eng.close()

    # passthroughs ---------------------------------------------------------
    def add_request(self, prompt_ids, max_new_tokens: int = 128) -> int:
        return self._eng.add_request(prompt_ids, max_new_tokens)

    def cancel(self, uid: int) -> bool:
        return self._eng.cancel(uid)

    @property
    def finished(self):
        return self._eng.finished

    # ---------------------------------------------------------------------
    def _spec_step_impl(self, params, dparams, tokens, cache, dcache, pos):
        """One speculative step for all slots. Returns (committed [B, k],
        n_commit [B], caches)."""
        k = self.k

        def draft_body(carry, _):
            tok, dcache, p = carry
            dlogits, dcache = self._dfwd(dparams, tok[:, None], dcache, p)
            nxt = jnp.argmax(dlogits[:, -1], axis=-1).astype(jnp.int32)
            return (nxt, dcache, p + 1), nxt

        (_, dcache, _), drafts = jax.lax.scan(
            draft_body, (tokens, dcache, pos), None, length=k - 1
        )
        drafts = drafts.T  # [B, k-1]

        # target verifies the whole window in one forward of width k
        cand = jnp.concatenate([tokens[:, None], drafts], axis=1)  # [B, k]
        tlogits, cache = self._eng._fwd(params, cand, cache, pos)
        preds = jnp.argmax(tlogits, axis=-1).astype(jnp.int32)  # [B, k]

        # longest matching prefix: accept drafts[i] while preds[i]==drafts[i]
        match = preds[:, : k - 1] == drafts  # [B, k-1]
        n_acc = jnp.argmin(
            jnp.concatenate([match, jnp.zeros((match.shape[0], 1), bool)], axis=1),
            axis=1,
        )  # first mismatch index == number of accepted drafts
        # committed tokens: drafts[:n_acc] then the target's own pick
        idx = jnp.arange(k - 1)[None, :]
        committed = jnp.where(idx < n_acc[:, None], drafts, 0)
        correction = jnp.take_along_axis(preds, n_acc[:, None], axis=1)[:, 0]
        committed = jnp.concatenate([committed, jnp.zeros_like(correction)[:, None]], axis=1)
        committed = committed.at[jnp.arange(committed.shape[0]), n_acc].set(correction)
        return committed, n_acc + 1, cache, dcache

    def step(self) -> int:
        eng = self._eng
        eng._schedule()
        if not eng.active:
            return 0
        # prefill freshly admitted prompts (+ the first sampled token's
        # prefix) into the DRAFT cache — the target prefill happened in
        # the inner engine's _admit
        for slot, req in eng.active.items():
            if getattr(req, "_draft_done", False):
                continue
            ctx = np.concatenate([req.prompt, np.asarray(req.output[:-1], np.int32)])
            t = len(ctx)
            t_pad = next_power_of_2(max(t, 2))
            buf = np.zeros((1, t_pad), np.int32)
            buf[0, :t] = ctx
            mini = llama.init_cache(self.dcfg, 1, eng.max_len, self.dcache.k.dtype)
            _, mini = self._dprefill_jit(self.draft_params, jnp.asarray(buf), mini)
            self.dcache = llama.KVCache(
                k=jax.lax.dynamic_update_slice(self.dcache.k, mini.k, (0, slot, 0, 0, 0)),
                v=jax.lax.dynamic_update_slice(self.dcache.v, mini.v, (0, slot, 0, 0, 0)),
            )
            req._draft_done = True

        committed, n_commit, eng.cache, self.dcache = self._spec_jit(
            eng.params, self.draft_params,
            jnp.asarray(eng._tokens), eng.cache, self.dcache,
            jnp.asarray(eng._pos),
        )
        committed = np.asarray(committed)
        n_commit = np.asarray(n_commit)
        for slot in list(eng.active):
            req = eng.active.get(slot)
            if req is None:
                continue
            n = int(n_commit[slot])
            # never run past max_len
            n = min(n, eng.max_len - 1 - int(eng._pos[slot]))
            for j in range(n):
                req = eng.active.get(slot)
                if req is None:
                    break
                tok = int(committed[slot, j])
                req.output.append(tok)
                eng._tokens[slot] = tok
                eng._pos[slot] += 1
                eng._maybe_finish(slot)
        return len(eng.active)

    def run(self):
        while self._eng.queue or self._eng.active:
            self.step()
        return {uid: r.output for uid, r in self._eng.finished.items()}


class SpeculativePagedEngine:
    """Paged continuous batching WITH batched speculative decoding.

    The vLLM composition (paged KV + spec decode) the reference inherits,
    rebuilt TPU-native. Same public API as `PagedBatchingEngine`
    (add_request / step / run / cancel); each step drafts `k_draft` tokens
    per slot with the cheap draft model (dense draft cache), then the target
    verifies the whole window in ONE paged forward of width k_draft
    (`llama._attention_paged` writes all k candidate rows into the slot's
    pages first, then query j attends keys < pos+j+1 — exact causality).
    Token-for-token identical to plain greedy paged decoding of the target.

    Rollback-free on both sides: rejected candidate rows sit in page rows
    past the committed position and are overwritten by the next window
    (page allocation is monotonic per slot — the block table is fixed at
    admission, so a rejected window "allocates" nothing). Overflow writes
    past a slot's last page land on the reserved scratch page 0. A draft
    cache row can go stale after a plain-step fallback — that only lowers
    acceptance (wall-clock), never correctness, because verification is
    exact.
    """

    def __init__(
        self,
        params: Any,
        draft_params: Any,
        cfg: Any,
        draft_cfg: Optional[Any] = None,
        k_draft: int = 4,
        batch_slots: int = 8,
        num_pages: int = 512,
        page_size: int = 16,
        max_pages_per_seq: int = 64,
        eos_token_id: Optional[int] = None,
        cache_dtype=jnp.bfloat16,
        forward_fn: Optional[Callable] = None,
        draft_forward_fn: Optional[Callable] = None,
        **paged_kwargs,
    ):
        from .paged import PagedBatchingEngine

        # reuse the paged engine for pages + prefill/scheduling machinery
        self._eng = PagedBatchingEngine(
            params, cfg, batch_slots=batch_slots, num_pages=num_pages,
            page_size=page_size, max_pages_per_seq=max_pages_per_seq,
            eos_token_id=eos_token_id, do_sample=False,
            cache_dtype=cache_dtype, forward_fn=forward_fn, **paged_kwargs,
        )
        self.dcfg = draft_cfg or cfg
        self.draft_params = draft_params
        self._dfwd = draft_forward_fn or (
            lambda p, toks, cache, pos: llama.forward(p, self.dcfg, toks, cache, pos)
        )
        self._dmax = max_pages_per_seq * page_size
        self.dcache = llama.init_cache(self.dcfg, batch_slots, self._dmax, cache_dtype)
        self.k = int(k_draft)
        assert self.k >= 2
        self._spec_jit = jax.jit(self._spec_step_impl)
        self._dprefill_jit = jax.jit(lambda p, tk, c: self._dfwd(p, tk, c, 0))

    def close(self):
        """Release device state promptly (see `ContinuousBatchingEngine.close`).
        Cascades to the inner paged engine. Idempotent."""
        for attr in ("_spec_jit", "_dprefill_jit", "_dfwd"):
            self.__dict__.pop(attr, None)
        self.dcache = None
        self.draft_params = None
        self._eng.close()

    # passthroughs ---------------------------------------------------------
    def add_request(self, prompt_ids, max_new_tokens: int = 128) -> int:
        return self._eng.add_request(prompt_ids, max_new_tokens)

    def cancel(self, uid: int) -> bool:
        return self._eng.cancel(uid)

    @property
    def finished(self):
        return self._eng.finished

    # ---------------------------------------------------------------------
    def _spec_step_impl(self, params, dparams, tokens, cache, dcache, pos, page_tab):
        """One speculative step for all slots. Returns (committed [B, k],
        n_commit [B], paged cache, draft cache)."""
        k = self.k

        def draft_body(carry, _):
            tok, dcache, p = carry
            dlogits, dcache = self._dfwd(dparams, tok[:, None], dcache, p)
            nxt = jnp.argmax(dlogits[:, -1], axis=-1).astype(jnp.int32)
            return (nxt, dcache, p + 1), nxt

        (_, dcache, _), drafts = jax.lax.scan(
            draft_body, (tokens, dcache, pos), None, length=k - 1
        )
        drafts = drafts.T  # [B, k-1]

        # target verifies the whole window in one paged forward of width k
        cand = jnp.concatenate([tokens[:, None], drafts], axis=1)  # [B, k]
        tlogits, cache = self._eng._fwd(params, cand, cache, pos, page_tab)
        preds = jnp.argmax(tlogits, axis=-1).astype(jnp.int32)  # [B, k]

        match = preds[:, : k - 1] == drafts  # [B, k-1]
        n_acc = jnp.argmin(
            jnp.concatenate([match, jnp.zeros((match.shape[0], 1), bool)], axis=1),
            axis=1,
        )
        idx = jnp.arange(k - 1)[None, :]
        committed = jnp.where(idx < n_acc[:, None], drafts, 0)
        correction = jnp.take_along_axis(preds, n_acc[:, None], axis=1)[:, 0]
        committed = jnp.concatenate(
            [committed, jnp.zeros_like(correction)[:, None]], axis=1
        )
        committed = committed.at[jnp.arange(committed.shape[0]), n_acc].set(correction)
        return committed, n_acc + 1, cache, dcache

    def step(self) -> int:
        eng = self._eng
        eng._schedule()
        for slot in list(eng._prefilling):
            eng._advance_prefill(slot)
        if not eng.active:
            return len(eng._prefilling)

        # prefill freshly admitted prompts (+ already-emitted tokens) into
        # the DRAFT cache — target prefill happened in the engine's _admit
        for slot, req in eng.active.items():
            if getattr(req, "_draft_done", False):
                continue
            ctx = np.concatenate([req.prompt, np.asarray(req.output[:-1], np.int32)])
            t = len(ctx)
            t_pad = next_power_of_2(max(t, 2))
            buf = np.zeros((1, t_pad), np.int32)
            buf[0, :t] = ctx
            mini = llama.init_cache(self.dcfg, 1, self._dmax, self.dcache.k.dtype)
            _, mini = self._dprefill_jit(self.draft_params, jnp.asarray(buf), mini)
            self.dcache = llama.KVCache(
                k=jax.lax.dynamic_update_slice(self.dcache.k, mini.k, (0, slot, 0, 0, 0)),
                v=jax.lax.dynamic_update_slice(self.dcache.v, mini.v, (0, slot, 0, 0, 0)),
            )
            req._draft_done = True

        # a verify window needs room for k candidate rows + 1: slots near
        # page exhaustion fall back to ONE plain paged step (they retire via
        # _maybe_finish, then speculation resumes)
        room = min(
            len(eng.slot_pages[s]) * eng.pg - int(eng._pos[s]) for s in eng.active
        )
        if room < self.k + 1:
            from .paged import PagedBatchingEngine

            return PagedBatchingEngine.step(eng)

        committed, n_commit, eng.cache, self.dcache = self._spec_jit(
            eng.params, self.draft_params,
            jnp.asarray(eng._tokens), eng.cache, self.dcache,
            jnp.asarray(eng._pos), jnp.asarray(eng._page_tab),
        )
        committed = np.asarray(committed)
        n_commit = np.asarray(n_commit)
        for slot in list(eng.active):
            req = eng.active.get(slot)
            if req is None:
                continue
            page_room = len(eng.slot_pages[slot]) * eng.pg
            n = min(int(n_commit[slot]), page_room - 1 - int(eng._pos[slot]))
            for j in range(n):
                req = eng.active.get(slot)
                if req is None:
                    break
                tok = int(committed[slot, j])
                req.output.append(tok)
                eng._tokens[slot] = tok
                eng._pos[slot] += 1
                eng._maybe_finish(slot)
        return len(eng.active) + len(eng._prefilling)

    def run(self):
        eng = self._eng
        while eng.queue or eng.active or eng._prefilling:
            self.step()
        return {uid: r.output for uid, r in eng.finished.items()}
