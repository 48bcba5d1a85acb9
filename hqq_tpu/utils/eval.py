# SPDX-License-Identifier: Apache-2.0
"""Perplexity evaluation harness.

≙ `/root/reference/examples/llama2_benchmark/eval_model.py:12-52`: WikiText-2
sliding-window PPL with max_length=1024 / stride=512 and
``ppl = exp(sum(loglik) / end_loc)`` — the exact protocol the reference's
published quality numbers use, reproduced here so quantized-vs-fp PPL deltas
are directly comparable.

This environment has no network egress, so the harness takes pre-tokenized
ids (or raw text + a tokenizer); wire it to
`datasets.load_dataset('wikitext', 'wikitext-2-raw-v1', split='test')` where
the dataset is locally available.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama

__all__ = ["perplexity", "loglikelihood"]


def loglikelihood(params, cfg, tokens: jnp.ndarray, forward_fn=None):
    """Sum log p(t_i | t_<i) over one window [1, T] (fp32 softmax)."""
    forward_fn = forward_fn or llama.forward
    logits, _ = forward_fn(params, cfg, tokens[:, :-1])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return ll.sum()


def perplexity(
    params,
    cfg,
    token_ids: np.ndarray,
    max_length: int = 1024,
    stride: int = 512,
    forward_fn: Optional[Callable] = None,
    verbose: bool = False,
) -> float:
    """Sliding-window perplexity over a 1-D token stream.

    Mirrors the reference protocol exactly (eval_model.py:24-49): windows of
    `max_length` advanced by `stride`; only the last `trg_len` targets of
    each window contribute; the normalizer is the final `end_loc` (the
    reference's convention, kept for comparability). Windows are right-padded
    to a fixed shape with a host-built target mask, so the whole eval uses
    ONE compiled program.
    """
    token_ids = np.asarray(token_ids).reshape(-1)
    seq_len = token_ids.shape[0]
    forward_fn = forward_fn or llama.forward

    def _window_ll(params, tokens, mask):
        logits, _ = forward_fn(params, cfg, tokens[:, :-1])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = tokens[:, 1:]
        ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0][0]
        return jnp.sum(ll * mask)

    ll_fn = jax.jit(_window_ll)

    nll_sum = 0.0
    prev_end = 0
    end_loc = 0
    for begin in range(0, seq_len, stride):
        end_loc = min(begin + max_length, seq_len)
        window = token_ids[begin:end_loc]
        if len(window) < 2:
            break
        trg_len = end_loc - prev_end
        n_tgt = min(trg_len, len(window) - 1)

        padded = np.zeros(max_length, token_ids.dtype)
        padded[: len(window)] = window
        mask = np.zeros(max_length - 1, np.float32)
        t_valid = len(window) - 1  # real targets in this window
        mask[t_valid - n_tgt : t_valid] = 1.0

        nll_sum += float(
            ll_fn(params, jnp.asarray(padded[None], jnp.int32), jnp.asarray(mask))
        )
        prev_end = end_loc
        if verbose:
            print(f"  ppl@{end_loc}: {np.exp(-nll_sum / end_loc):.4f}")
        if end_loc == seq_len:
            break

    return float(np.exp(-nll_sum / end_loc))
