# SPDX-License-Identifier: Apache-2.0
"""Sequence-parallel paged DECODE: the KV page pool sharded across chips.

Tensor parallelism shards the pool's HEAD axis (`tp.tp_paged_forward_fn`) —
per-chip KV scales 1/tp but a single sequence is still bounded by one chip's
page budget times tp. This module shards the pool's PAGE axis instead:
device r owns global pages [r·P_local, (r+1)·P_local), each layer's decode
attention computes an online-softmax partial over its own pages, and the
partials merge with one pmax + two psums on the mesh axis
(`ops.paged.paged_attention_sp`) — a context limited only by the SUM of the
chips' pools, the decode-side completion of the ring-attention prefill story
(`parallel/ring.py`; SURVEY §5.7, VERDICT r4 item 10).

Weights are replicated over the axis (combine with TP by nesting meshes —
the page axis composes with any weight strategy because it only touches the
pool and the attention merge). The engines plug this in through their
ordinary `forward_fn` injection point; the host-side allocator needs no
change — page ids are global.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..models import llama
from ..ops.paged import PagedKVCache
from .tp import _shard_map

__all__ = ["sp_paged_forward_fn"]


def sp_paged_forward_fn(mesh: Mesh, cfg: Any, page_size: int = 16,
                        axis: str = "model", quantize_kv: bool = False,
                        forward: Any = None):
    """Jitted sequence-parallel paged decode step: (params, tokens [B,1],
    paged_cache, lengths [B], page_indices [B,MP]) -> (logits, cache).

    The pool shards its PAGE axis over `axis` ([L, H, P/n, pg, hd] per
    device); params/tokens/tables are replicated. The global page count must
    be divisible by the axis size (engines: pick num_pages % n == 0)."""
    fwd_impl = forward if forward is not None else llama.forward
    pool = P(None, None, axis, None, None)
    meta = pool if quantize_kv else None
    cache_spec = PagedKVCache(
        k=pool, v=pool, k_scales=meta, v_scales=meta, page_size=page_size
    )

    def body(params, tokens, cache, lengths, page_indices):
        return fwd_impl(
            params, cfg, tokens, cache, lengths, page_indices=page_indices,
            seq_axis=axis,
        )

    paged = jax.jit(_shard_map(
        body,
        mesh,
        in_specs=(P(), P(), cache_spec, P(), P()),
        out_specs=(P(), cache_spec),
    ))

    # engines feed the SAME injection point their dense prefill (mini cache)
    # and their paged decode — dispatch on the cache type like
    # tp.tp_serving_forward_fn. Weights are replicated here, so prefill just
    # runs the plain forward.
    def dispatch(params, tokens, cache, pos, page_indices=None):
        if isinstance(cache, PagedKVCache):
            return paged(params, tokens, cache, pos, page_indices)
        return fwd_impl(params, cfg, tokens, cache, pos)

    return dispatch
