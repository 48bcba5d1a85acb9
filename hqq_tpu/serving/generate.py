# SPDX-License-Identifier: Apache-2.0
"""Compiled generation runtime — the TPU-native `HFGenerator`.

≙ `/root/reference/hqq/utils/generation_hf.py:117-540`. The reference builds
a static KV cache sized to the next power of two, compiles separate prefill /
decode-one-token graphs, and manually captures a CUDA graph of the one-token
step. The TPU equivalents used here:

  * static cache / static shapes     -> `KVCache` pytree, prompt right-padded
                                        to a power-of-two bucket
  * torch.compile decode             -> jitted decode step
  * CUDA-graph capture/replay        -> the ENTIRE decode loop inside one XLA
                                        program (`lax.scan` over steps), so
                                        there is zero host round-trip per
                                        token ("full" mode; ≙ compile_args
                                        full vs partial, ref `:300-310`)
  * gumbel-trick top-k sampling      -> same math on jax.random keys
                                        (ref `:268-289`)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..models import llama

__all__ = ["Generator", "sample_token", "sample_token_batch", "next_power_of_2"]


def next_power_of_2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def sample_token(
    logits: Array,
    key: Optional[Array],
    do_sample: bool,
    top_k: int,
    temperature: float,
    top_p: float = 1.0,
) -> Array:
    """Greedy or top-k (+ optional nucleus/top-p) gumbel sampling
    (≙ ref `generation_hf.py:268-289`; top-p is beyond the reference)."""
    if not do_sample:
        return jnp.argmax(logits, axis=-1)
    logits = logits / jnp.maximum(temperature, 1e-5)
    vals, idxs = jax.lax.top_k(logits, top_k)
    if top_p < 1.0:
        # nucleus filter within the top-k candidates (already sorted desc)
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose CDF up to (and incl.) them minus own prob < top_p;
        # the first token is always kept
        keep = (cum - probs) < top_p
        vals = jnp.where(keep, vals, jnp.finfo(vals.dtype).min)
    g = jax.random.gumbel(key, vals.shape, dtype=vals.dtype)
    choice = jnp.argmax(vals + g, axis=-1)
    return jnp.take_along_axis(idxs, choice[..., None], axis=-1)[..., 0]


# static top-k width for the per-row sampler: requested top_k values are
# clamped to this, keeping the lax.top_k shape (and the compiled decode
# step) independent of any request's parameters
MAX_TOP_K = 64


def sample_token_batch(
    logits: Array,
    key: Array,
    do_sample: Array,
    top_k: Array,
    temperature: Array,
    top_p: Array,
) -> Array:
    """Per-ROW sampling parameters — each continuous-batching slot carries
    its own request's params inside one jitted step (the vLLM SamplingParams
    role behind `/root/reference/hqq/utils/vllm.py:578-868`; the reference
    itself has engine-wide settings only).

    logits [S, V]; do_sample bool[S]; top_k int32[S] (clamped to MAX_TOP_K);
    temperature f32[S]; top_p f32[S]. Greedy rows (do_sample False) are
    bit-identical to `jnp.argmax` regardless of the other params.
    """
    greedy = jnp.argmax(logits, axis=-1)
    lt = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-5)[:, None]
    k_eff = min(MAX_TOP_K, logits.shape[-1])
    vals, idxs = jax.lax.top_k(lt, k_eff)  # [S, k_eff] sorted desc
    pos = jnp.arange(k_eff)[None, :]
    neg = jnp.finfo(vals.dtype).min
    vals = jnp.where(pos < jnp.clip(top_k, 1, k_eff)[:, None], vals, neg)
    # nucleus filter within the top-k candidates (first token always kept;
    # rows masked by top_k have prob ~0 and stay masked)
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < top_p[:, None]
    vals = jnp.where(keep, vals, neg)
    g = jax.random.gumbel(key, vals.shape, dtype=vals.dtype)
    choice = jnp.argmax(vals + g, axis=-1)
    sampled = jnp.take_along_axis(idxs, choice[:, None], axis=-1)[:, 0]
    return jnp.where(do_sample, sampled, greedy)


class Generator:
    """Host-side harness around fully-jitted prefill + decode.

    forward_fn(params, tokens, cache, start_pos) -> (logits, cache) defaults
    to the Llama forward; any model with that signature works.
    """

    def __init__(
        self,
        params: Any,
        cfg: Any,
        max_new_tokens: int = 256,
        batch_size: int = 1,
        cache_len: Optional[int] = None,
        do_sample: bool = False,
        top_k: int = 20,
        temperature: float = 0.6,
        top_p: float = 1.0,
        eos_token_id: Optional[int] = None,
        compile_mode: str = "full",  # "full": whole decode loop on device
        forward_fn: Optional[Callable] = None,
        cache_dtype=jnp.bfloat16,
    ):
        self.params = params
        self.cfg = cfg
        self.max_new_tokens = max_new_tokens
        self.batch_size = batch_size
        self.do_sample = do_sample
        self.top_k = top_k
        self.temperature = temperature
        self.top_p = top_p
        self.eos_token_id = eos_token_id
        self.compile_mode = compile_mode
        self.cache_len = cache_len
        self.cache_dtype = cache_dtype
        fwd = forward_fn or (
            lambda p, toks, cache, pos: llama.forward(p, cfg, toks, cache, pos)
        )
        self._forward = fwd

        # jit once; shapes bucketed by (prompt_bucket, cache_len)
        self._prefill = jax.jit(fwd)
        self._decode_loop = jax.jit(
            self._decode_loop_impl, static_argnames=("steps",)
        )
        self._decode_step = jax.jit(self._decode_step_impl)

    # -- decode ------------------------------------------------------------
    def _sample(self, logits: Array, key: Array) -> Array:
        return sample_token(
            logits, key, self.do_sample, self.top_k, self.temperature,
            self.top_p,
        )

    def _decode_step_impl(self, params, tok, cache, pos, key):
        logits, cache = self._forward(params, tok[:, None], cache, pos)
        key, sub = jax.random.split(key)
        nxt = self._sample(logits[:, -1], sub)
        return nxt, cache, key

    def _decode_loop_impl(self, params, first_tok, cache, start_pos, key, *, steps):
        """The whole decode loop as ONE XLA program (≙ CUDA-graph replay)."""
        eos = self.eos_token_id

        def body(carry, _):
            tok, cache, pos, key, done = carry
            logits, cache = self._forward(params, tok[:, None], cache, pos)
            key, sub = jax.random.split(key)
            nxt = self._sample(logits[:, -1], sub)
            if eos is not None:
                nxt = jnp.where(done, jnp.full_like(nxt, eos), nxt)
                done = jnp.logical_or(done, nxt == eos)
            return (nxt, cache, pos + 1, key, done), tok

        done0 = jnp.zeros((first_tok.shape[0],), bool)
        (last, cache, _, _, _), toks = jax.lax.scan(
            body, (first_tok, cache, start_pos, key, done0), None, length=steps
        )
        toks = jnp.moveaxis(toks, 0, 1)  # [B, steps]
        return jnp.concatenate([toks, last[:, None]], axis=1), cache

    # -- public API ----------------------------------------------------------
    def generate(
        self,
        input_ids,
        max_new_tokens: Optional[int] = None,
        seed: int = 0,
        on_token=None,
    ) -> np.ndarray:
        """input_ids: [B, T] token ids (list / np / jnp). Returns generated
        ids [B, <=max_new_tokens] (prompt not included).

        on_token: optional callback(token_ids [B]) fired per decode step —
        per-token streaming (≙ HFGenerator's streaming print, ref
        `utils/generation_hf.py:471-505`); forces the "partial" compile mode
        for this call."""
        input_ids = np.asarray(input_ids)
        if input_ids.ndim == 1:
            input_ids = input_ids[None]
        b, t = input_ids.shape
        steps = max_new_tokens or self.max_new_tokens

        cache_len = self.cache_len or next_power_of_2(t + steps + 1)
        cache = llama.init_cache(self.cfg, b, cache_len, self.cache_dtype)

        # Right-pad the prompt to a power-of-two bucket: padded slots are
        # written to the cache but each is overwritten by a real token before
        # any query position can attend to it.
        t_pad = next_power_of_2(max(t, 2))
        prompt = np.zeros((b, t_pad), np.int32)
        prompt[:, :t] = input_ids
        logits, cache = self._prefill(
            self.params, jnp.asarray(prompt), cache, 0
        )
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        first = self._sample(logits[:, t - 1], sub)

        if on_token is not None:
            on_token(np.asarray(first))
        if self.compile_mode == "full" and on_token is None:
            toks, _ = self._decode_loop(
                self.params, first, cache, t, key, steps=steps - 1
            )
            out = np.asarray(toks)
        else:  # "partial": jitted one-token step, host loop (streaming-able)
            tok, pos = first, t
            outs = [np.asarray(first)]
            for _ in range(steps - 1):
                tok, cache, key = self._decode_step(self.params, tok, cache, pos, key)
                pos += 1
                tok_np = np.asarray(tok)
                outs.append(tok_np)
                if on_token is not None:
                    on_token(tok_np)
            out = np.stack(outs, axis=1)

        if self.eos_token_id is not None:
            # truncate rows at first EOS
            trimmed = []
            for row in out:
                idx = np.where(row == self.eos_token_id)[0]
                trimmed.append(row[: idx[0] + 1] if len(idx) else row)
            if b == 1:
                return trimmed[0][None]
        return out
