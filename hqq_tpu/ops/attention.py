# SPDX-License-Identifier: Apache-2.0
"""Attention kernels: flash attention for prefill/training.

The naive path materializes [B, H, T, S] scores — fine for decode (T=1) but
O(T^2) HBM for prefill. On TPU we dispatch long-sequence prefill to the
production Pallas flash-attention kernel (`jax.experimental.pallas.ops.tpu.
flash_attention` — tiled online-softmax, scores never leave VMEM); elsewhere
(CPU tests, short sequences where kernel overhead dominates) the naive path
is used. See the JAX Pallas TPU attention kernels for the kernel
design background.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

__all__ = ["prefill_attention", "FLASH_MIN_SEQ"]

# below this sequence length the naive path is faster (kernel launch + tiling
# overhead) and numerically identical
FLASH_MIN_SEQ = 256


def _naive(q: Array, k: Array, v: Array, mask: Optional[Array], scale: float) -> Array:
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v)


def prefill_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    causal: bool = True,
    mask: Optional[Array] = None,
    scale: Optional[float] = None,
) -> Array:
    """Self-attention over full sequences [B, H, T, hd] -> [B, H, T, hd].

    Uses the Pallas flash kernel on TPU for T >= FLASH_MIN_SEQ when the mask
    is pure-causal (the kernel applies causality internally); any explicit
    `mask` forces the naive path.
    """
    t = q.shape[2]
    hd = q.shape[3]
    scale = scale if scale is not None else hd**-0.5

    on_tpu = jax.default_backend() == "tpu"
    use_flash = (
        on_tpu
        and mask is None
        and t >= FLASH_MIN_SEQ
        and t == k.shape[2]
        and t % 128 == 0
        and hd >= 128
    )
    if use_flash:
        from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal, sm_scale=scale).astype(q.dtype)

    if mask is None and causal:
        neg = jnp.finfo(jnp.float32).min
        mask = jnp.where(jnp.tril(jnp.ones((t, k.shape[2]), bool)), 0.0, neg)[None, None]
    return _naive(q, k, v, mask, scale)
