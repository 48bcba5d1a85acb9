# SPDX-License-Identifier: Apache-2.0
"""Ring attention — context parallelism over the device mesh.

The sequence dimension is sharded across the "model" axis; K/V shards rotate
around the ring with `ppermute` while every device keeps an online-softmax
accumulator for its local Q shard, so communication overlaps compute and no
device ever materializes the full sequence (blockwise ring attention;
the reference library has nothing in this space — SURVEY §5.7 calls it out
as the required TPU-native addition for long-context scaling).

Causality across shards: with sequence blocks laid out in ring order, the
block arriving at rotation step s on device d originated on device
(d - s) mod n, i.e. holds key positions of global block (d - s) mod n. A
query block at index i attends fully to key blocks j < i, causally within
j == i, and not at all to j > i.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

__all__ = ["ring_attention", "ring_attention_sharded"]

_NEG = jnp.finfo(jnp.float32).min


def _block_attend(q, k, v, rel, t_loc, scale):
    """Scores + masking for one (q-block, kv-block) pair.

    rel: +1 kv block strictly earlier (full attention), 0 same block
    (causal), -1 kv block later (fully masked).
    q [B,H,Tq,hd], k/v [B,H,Tk,hd] -> (scores_exp-less raw scores [B,H,Tq,Tk])
    """
    s = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    tq = q.shape[2]
    tk = k.shape[2]
    causal = jnp.tril(jnp.ones((tq, tk), bool))
    mask = jnp.where(
        rel > 0,
        jnp.zeros((tq, tk), jnp.float32),
        jnp.where(rel == 0, jnp.where(causal, 0.0, _NEG), jnp.full((tq, tk), _NEG)),
    )
    return s + mask[None, None]


def ring_attention(
    q: Array,
    k: Array,
    v: Array,
    axis_name: str,
    scale: Optional[float] = None,
) -> Array:
    """Causal self-attention with sequence sharded over `axis_name`.

    Call INSIDE shard_map: q/k/v are the local shards [B, H, T_local, hd] of a
    global [B, H, T, hd] laid out contiguously along the axis. Returns the
    local output shard. Online-softmax accumulation in fp32.
    """
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    hd = q.shape[-1]
    scale = scale if scale is not None else hd**-0.5
    t_loc = q.shape[2]

    qf = q.astype(jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]  # kv travels to the NEXT device

    def step(carry, s):
        k_cur, v_cur, m, l, o = carry
        src = (my - s) % n  # global block index of the kv currently held
        rel = jnp.sign(my - src)  # +1 earlier block, 0 self, -1 later
        scores = _block_attend(qf, k_cur.astype(jnp.float32), v_cur, rel, t_loc, scale)

        m_new = jnp.maximum(m, scores.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        o = o * alpha[..., None] + jnp.einsum(
            "bhts,bhsd->bhtd", p, v_cur.astype(jnp.float32)
        )
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, m_new, l, o), None

    # derive the accumulators from qf so shard_map marks them device-varying
    m0 = jnp.full_like(qf[..., 0], _NEG)
    l0 = jnp.zeros_like(qf[..., 0])
    o0 = jnp.zeros_like(qf)
    (k_f, v_f, m, l, o), _ = jax.lax.scan(
        step, (k, v, m0, l0, o0), jnp.arange(n)
    )
    return (o / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def ring_attention_sharded(mesh, q, k, v, axis_name: str = "model"):
    """Convenience wrapper: shard global q/k/v [B, H, T, hd] over the sequence
    dim and run ring attention via shard_map."""
    from jax.sharding import PartitionSpec as P

    spec = P(None, None, axis_name, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    def run(ql, kl, vl):
        return ring_attention(ql, kl, vl, axis_name)

    return run(q, k, v)
