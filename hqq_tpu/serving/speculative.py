# SPDX-License-Identifier: Apache-2.0
"""Speculative decoding — draft/verify generation with exact greedy outputs.

A cheap DRAFT model (e.g. the same network quantized to 2-bit, or a smaller
family member) proposes k tokens autoregressively; the TARGET model scores
the whole window in ONE forward and accepts the longest prefix that matches
its own greedy choices, plus one bonus token from the verifying pass. The
output sequence is therefore IDENTICAL to the target's vanilla greedy
decode — the draft only changes wall-clock, never content.

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

__all__ = ["SpeculativeGenerator"]


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
    ):
        self.pt = target_params
        self.pd = draft_params
        self.cfg = cfg
        self.dcfg = draft_cfg or cfg
        self.k = int(k)
        self.cache_dtype = cache_dtype
        fwd = forward_fn or llama.forward

        self._tgt_fwd = jax.jit(lambda p, t, c, s: fwd(p, self.cfg, t, c, s))
        self._drf_fwd = jax.jit(lambda p, t, c, s: fwd(p, self.dcfg, t, c, s))

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

        tok = int(jnp.argmax(tl[0, t0 - 1]))
        out = [tok]
        pos = t0  # caches hold positions < pos; `tok` sits at pos next
        # draft tokens not yet ingested by the draft cache (full-accept case)
        pending: list[int] = []

        while len(out) < max_new_tokens:
            # ---- draft proposes k tokens (greedy) --------------------------
            d_in = pending + [tok]
            d_pos = pos - len(pending)
            proposals = []
            cur = None
            for tkn in d_in:
                dl, dc = self._drf_fwd(
                    self.pd, jnp.asarray([[tkn]], jnp.int32), dc,
                    jnp.asarray(d_pos, jnp.int32),
                )
                d_pos += 1
                cur = int(jnp.argmax(dl[0, -1]))
            pending = []
            proposals.append(cur)
            while len(proposals) < self.k:
                dl, dc = self._drf_fwd(
                    self.pd, jnp.asarray([[proposals[-1]]], jnp.int32), dc,
                    jnp.asarray(d_pos, jnp.int32),
                )
                d_pos += 1
                proposals.append(int(jnp.argmax(dl[0, -1])))

            # ---- target verifies [tok, d1..dk] in one forward --------------
            window = np.asarray([[tok] + proposals], np.int32)  # [1, k+1]
            tl, tc = self._tgt_fwd(
                self.pt, jnp.asarray(window), tc, jnp.asarray(pos, jnp.int32)
            )
            greedy = np.asarray(jnp.argmax(tl[0], axis=-1))  # [k+1]

            accepted = 0
            while accepted < self.k and proposals[accepted] == int(greedy[accepted]):
                accepted += 1

            if accepted == self.k:
                # all proposals accepted + bonus token from the verify pass
                new = proposals + [int(greedy[self.k])]
                # draft cache hasn't ingested the LAST proposal yet
                pending = [proposals[-1]]
            else:
                new = proposals[:accepted] + [int(greedy[accepted])]
                pending = []

            out.extend(new)
            tok = new[-1]
            pos += len(new)

        return np.asarray(out[:max_new_tokens], np.int32)[None]
