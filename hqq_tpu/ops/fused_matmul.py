# SPDX-License-Identifier: Apache-2.0
"""Fused dequant+matmul Pallas kernels — the TPU-native analogue of the
reference CUDA extension (`/root/reference/hqq/kernels/hqq_aten_cuda_kernel.cu`)
and its fused inference backends (`/root/reference/hqq/backends/*.py`).

Design (TPU-first, not a translation):

* **Kernel storage layout** (`KernelQTensor`): the weight is kept transposed
  as W^T `[K, N]` so the matmul is `x[M,K] @ W^T[K,N]` with N on the lane
  dimension. Codes are bit-packed *per group along K*: each group of
  ``g`` codes is chunk-split into ``r = 8/container_bits`` bitfields of its
  own ``g/r`` packed rows, so ANY K-tile that is a multiple of ``g`` unpacks
  locally inside the kernel — a few shift/mask ops plus one sublane concat,
  no cross-tile gather.
* **Dequant in the MXU prologue**: `w = codes * scale - zs` where
  ``zs = zero * scale`` is precomputed at conversion time, making dequant a
  single fused multiply-sub on the VPU before the MXU consumes the tile.
* **Grid**: `(M/TM, N/TN, K/TK)` with a float32 VMEM accumulator revisited
  across the K dimension (output block index is k-invariant, k iterates
  fastest), double-buffered packed-weight DMA handled by the Pallas pipeline.

Supported containers: 8/4/2/1-bit (r = 1/2/4/8). 3-bit weights are widened
into the 4-bit container at conversion time (the canonical `QTensor` keeps
true 3-bit storage); 6/5-bit ride the 8-bit container — mirroring how the
reference's fused backends restrict bit-widths and repack
(`backends/bitblas.py:39`, `backends/torchao.py:23`).
Only `axis=1` grouping is fused (same restriction as every reference fused
backend); `axis=0` falls back to the XLA path.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quantize import QTensor, resolve_meta, unpack_codes

__all__ = [
    "KernelQTensor",
    "KernelQTensor0",
    "to_kernel_layout",
    "to_kernel_layout_ax0",
    "supports_kernel_layout_ax0",
    "quant_matmul_pallas",
    "quant_matmul_pallas_a8",
    "quant_matmul_pallas_a8_lora",
    "quant_matmul_pallas_lora",
    "quantize_activations_int8",
    "dequant_pallas",
    "register_a8_plan",
]

# nbits (canonical) -> container bits used by the kernel layout
_KERNEL_CONTAINER_BITS = {8: 8, 6: 8, 5: 8, 4: 4, 3: 4, 2: 2, 1.58: 2, 1: 1}


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@struct.dataclass
class KernelQTensor:
    """Inference-prepared quantized weight in kernel layout (see module doc).

    Arrays (N padded up to a multiple of 128 lanes):
      wq:    uint8 [K // r, N_pad]   per-group chunk-split packed codes of W^T
      scale: [K // g, N_pad]         dequant scale (multiplicative)
      zs:    [K // g, N_pad]         zero * scale (dequant = c*scale - zs)
    """

    wq: Array
    scale: Array
    zs: Array

    nbits: float = struct.field(pytree_node=False, default=4)
    container_bits: int = struct.field(pytree_node=False, default=4)
    group_size: int = struct.field(pytree_node=False, default=64)
    shape: tuple = struct.field(pytree_node=False, default=())  # (K, N) logical
    compute_dtype: Any = struct.field(pytree_node=False, default=jnp.bfloat16)
    # True inside shard_map TP: the arrays are shard-LOCAL (unpadded — see
    # parallel.tp._kernel_tp_ok) while `shape` still records the global dims.
    # Set explicitly by the TP prep path; never inferred from array shapes.
    is_sharded: bool = struct.field(pytree_node=False, default=False)
    # BITCAST nibble order (4-bit container only): byte row i of wq holds
    # SIGNED codes (c - 8) for k rows 2i (low nibble) and 2i+1 (high nibble),
    # matching the TPU's `pltpu.bitcast(uint8 -> int4)` sublane expansion —
    # the in-kernel unpack is then a single zero-cost bitcast + widen instead
    # of per-chunk shift/mask VPU chains (measured r5: 4096² decode matmul
    # 24.7 -> ~18 µs, the shift/mask unpack was the serialized VPU cost that
    # held w4a8 at ~50% of the HBM byte roofline). The -8 offset rides the
    # affine dequant for free: zs is stored as (zero - 8)·scale, so every
    # kernel's `c·scale - zs` epilogue is unchanged.
    bc4: bool = struct.field(pytree_node=False, default=False)

    @property
    def k(self) -> int:
        return self.shape[0]

    @property
    def n(self) -> int:
        return self.shape[1]

    @property
    def r(self) -> int:
        return 8 // self.container_bits


def _pack_kernel_layout(codes_kn: Array, group_size: int, container_bits: int) -> Array:
    """Pack integer codes of W^T [K, N] per-group chunk-split along K."""
    k, n = codes_kn.shape
    g = group_size
    r = 8 // container_bits
    assert k % g == 0 and g % r == 0
    c3 = codes_kn.reshape(k // g, g, n).astype(jnp.uint8)
    step = g // r
    out = c3[:, :step, :] << (container_bits * (r - 1))
    for j in range(1, r):
        out = out | (c3[:, j * step : (j + 1) * step, :] << (container_bits * (r - 1 - j)))
    return out.reshape(k // r, n)


def _pack_bc4(codes_kn: Array) -> Array:
    """Pack integer codes of W^T [K, N] in TPU bitcast nibble order: byte
    row i = ((c[2i+1]-8) & 15) << 4 | ((c[2i]-8) & 15). The kernel-side
    inverse is exactly `pltpu.bitcast(wq, jnp.int4)` (sublane expansion,
    low nibble first — probed identical native and interpret)."""
    k, n = codes_kn.shape
    assert k % 2 == 0
    s4 = (codes_kn.astype(jnp.int32) - 8) & 15
    return ((s4[1::2] << 4) | s4[0::2]).astype(jnp.uint8)


def unpack_codes_host(kqt: "KernelQTensor") -> Array:
    """Eager (non-Pallas) unpack of ``kqt.wq`` to integer codes
    [K_pad, N_pad] in natural k row order. For bc4 layouts the values are the
    SIGNED codes (c - 8) the kernels consume (pair with the stored ``zs``,
    which carries the -8 fold); chunk-split layouts return the raw unsigned
    codes. Debug/inspection/interop helper — the hot path never calls this."""
    if kqt.bc4:
        p = kqt.wq.astype(jnp.int32)
        lo = ((p & 15) ^ 8) - 8          # signed int4 of the low nibble
        hi = (((p >> 4) & 15) ^ 8) - 8
        kr, n_pad = p.shape
        return jnp.stack([lo, hi], axis=1).reshape(kr * 2, n_pad)
    c3 = _unpack_tile(kqt.wq, kqt.group_size, kqt.container_bits,
                      kqt.wq.shape[1])
    ngroups, g, n_pad = c3.shape
    return c3.reshape(ngroups * g, n_pad)


def supports_kernel_layout(qt: QTensor) -> bool:
    """Whether this QTensor can be converted to the fused-kernel layout."""
    if qt.axis != 1 or not qt.channel_wise or qt.group_size is None:
        return False
    g = qt.group_size
    n_out, k = qt.shape  # original torch-convention [out, in]
    cb = _KERNEL_CONTAINER_BITS[qt.nbits]
    r = 8 // cb
    return k % g == 0 and g % r == 0 and g % 8 == 0


def to_kernel_layout(
    qt: QTensor, meta_dtype=jnp.float32, pad_k_groups: int = 8,
    bc4: Optional[bool] = None,
) -> KernelQTensor:
    """Convert a canonical group-space `QTensor` (axis=1) to kernel layout.

    ≙ the repacking the reference backends do at `prepare_for_inference`
    time (`/root/reference/hqq/backends/torchao.py:201-241`,
    `backends/bitblas.py:60-116`) — a one-time, jit-free transformation.

    meta_dtype: storage dtype for scale/zs. fp32 (default) dequantizes with
    full precision. bf16 halves meta MEMORY (useful when squeezing a model
    onto a chip) but measured ~30% SLOWER decode on v5e — Mosaic's bf16
    broadcast-multiply path underperforms fp32 — so it is a footprint
    option, not a speed option.

    bc4: use the BITCAST nibble order for the 4-bit container (see
    `KernelQTensor.bc4`). None (default) = auto: on for 4-bit containers
    (every kernel consumes it and it is strictly faster), off otherwise.
    Pass False to force the chunk-split order (layout A/B tests).

    pad_k_groups: K is zero-padded to a multiple of ``pad_k_groups·g``
    (padded rows dequantize to exactly 0). 8 is the minimum for the TPU
    8-sublane rule; 16/32 enable the deeper class-replication tiers of the
    M=1 decode kernel. Padding is WORK, not just storage — the w4a8 backend
    picks the deepest tier whose padding stays ≤5% (`_a8_pad_k_groups`):
    measured at k=11008, the old always-pad-to-32 policy (11.6% waste)
    ran 68.4→63.3µs slower than pad-8/s=16 (tools/kernel_lab_a8v2 pass3).
    """
    assert supports_kernel_layout(qt), (
        "kernel layout requires axis=1 grouped quantization with "
        "group_size % (8/container_bits) == 0"
    )
    assert pad_k_groups in (8, 16, 32)
    qt = resolve_meta(qt)  # fused kernels consume plain fp scale/zero
    n_out, k = qt.shape
    g = qt.group_size
    cb = _KERNEL_CONTAINER_BITS[qt.nbits]

    codes = unpack_codes(qt, jnp.int32)  # [N*K/g, g] group-space
    codes_kn = codes.reshape(n_out, k).T  # [K, N]
    scale_kn = qt.scale.reshape(n_out, k // g).T.astype(jnp.float32)  # [K/g, N]
    zero_kn = qt.zero.reshape(n_out, k // g).T.astype(jnp.float32)

    # Pad K so scale/zs tiles meet the TPU 8-sublane rule for any K-tiling
    # (padded rows dequantize to exactly 0: codes=0, scale=0, zero=0).
    k_pad = _round_up(k, pad_k_groups * g) if k > 8 * g else k
    if k_pad != k:
        codes_kn = jnp.pad(codes_kn, ((0, k_pad - k), (0, 0)))
        scale_kn = jnp.pad(scale_kn, ((0, (k_pad - k) // g), (0, 0)))
        zero_kn = jnp.pad(zero_kn, ((0, (k_pad - k) // g), (0, 0)))

    n_pad = _round_up(n_out, 128)
    if n_pad != n_out:
        codes_kn = jnp.pad(codes_kn, ((0, 0), (0, n_pad - n_out)))
        scale_kn = jnp.pad(scale_kn, ((0, 0), (0, n_pad - n_out)), constant_values=1.0)
        zero_kn = jnp.pad(zero_kn, ((0, 0), (0, n_pad - n_out)))

    if bc4 is None:
        bc4 = cb == 4
    bc4 = bool(bc4) and cb == 4
    if bc4:
        wq = _pack_bc4(codes_kn)
        # signed codes (c-8): fold the offset into zs so the kernels'
        # `c·scale - zs` dequant is unchanged. Padded K rows keep scale=0
        # (dequant to 0); padded N columns get zs=-8·1 matching codes=-8.
        zs_kn = (zero_kn - 8.0) * scale_kn
    else:
        wq = _pack_kernel_layout(codes_kn, g, cb)
        zs_kn = zero_kn * scale_kn
    dtype = qt.compute_dtype
    return KernelQTensor(
        wq=wq,
        scale=scale_kn.astype(meta_dtype),
        zs=zs_kn.astype(meta_dtype),
        nbits=qt.nbits,
        container_bits=cb,
        group_size=g,
        shape=(k, n_out),
        compute_dtype=dtype,
        bc4=bc4,
    )


def _logical_dims(kqt: KernelQTensor) -> tuple:
    """(K_logical, N_logical) for the arrays at hand.

    Global layouts may carry storage padding (K to 8/32 groups, N to 128
    lanes) beyond the logical `shape`; shard-local arrays inside shard_map
    are exact (TP prep rejects padded layouts, `parallel.tp._kernel_tp_ok`)
    but their dims are a 1/tp slice of the global `shape`. The `is_sharded`
    flag set by the TP prep path decides explicitly — a shard whose local
    dims happen to coincide with a padded global size is NOT misread."""
    if kqt.is_sharded:
        return (kqt.wq.shape[0] * kqt.r, kqt.wq.shape[1])
    return (kqt.k, kqt.n)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _unpack_bc4_2d(p: Array) -> Array:
    """Unpack a BITCAST-ordered packed tile [TK//2, TN] -> int8 signed codes
    (c - 8) [TK, TN] in NATURAL k row order. The bitcast is a register
    relabeling (zero VPU cost); the int4->int8 widen is the only vector op —
    vs 2 shift/mask chains + a concat for the chunk-split order."""
    return pltpu.bitcast(p, jnp.int4).astype(jnp.int8)


def _unpack_tile(p: Array, g: int, container_bits: int, tn: int,
                 bc4: bool = False) -> Array:
    """Unpack a packed tile [TK//r, TN] -> 3-D codes [TK//g, g, TN] (int32).

    Works in int32: Mosaic has no uint8->float cast, and int32 shifts/masks
    lower to native VPU ops. bc4 tiles hold SIGNED codes (c-8) in natural
    row order — a plain reshape groups them (zs carries the -8 fold)."""
    if bc4:
        c = pltpu.bitcast(p, jnp.int4).astype(jnp.int32)  # [TK, TN]
        return c.reshape(c.shape[0] // g, g, tn)
    r = 8 // container_bits
    mask = (1 << container_bits) - 1
    tkr, _ = p.shape
    n_groups = tkr * r // g
    p3 = p.reshape(n_groups, g // r, tn).astype(jnp.int32)
    if r == 1:
        return p3
    cb = container_bits
    # top chunk needs no mask: p3 is uint8-ranged, so p3 >> (cb*(r-1)) < 2^cb
    chunks = [p3 >> (cb * (r - 1))] + [
        (p3 >> (cb * (r - 1 - j))) & mask for j in range(1, r)
    ]
    return jnp.concatenate(chunks, axis=1)  # [n_groups, g, TN]


def _qmm_kernel(x_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, *, g, cb,
                out_dtype, bc4=False):
    """One (TM, TN) output tile, accumulating over the K grid dimension."""
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tn = wq_ref.shape[-1]
    c3 = _unpack_tile(wq_ref[:], g, cb, tn, bc4)  # [TK//g, g, TN]
    compute_dtype = scale_ref.dtype
    w3 = c3.astype(compute_dtype) * scale_ref[:][:, None, :] - zs_ref[:][:, None, :]
    w = w3.reshape(c3.shape[0] * g, tn)  # [TK, TN]

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:],
        w.astype(x_ref.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _pick_tile_k(k: int, g: int, target: int = 2048) -> int:
    """K-tile: a multiple of 8*g dividing K (so scale/zs tiles satisfy the
    8-sublane rule), capped near `target`; falls back to a single full-K tile
    (block == array dim is always legal) for shard-local odd sizes."""
    best = None
    t = 8 * g
    while t <= min(k, target):
        if k % t == 0:
            best = t
        t += 8 * g
    return best if best is not None else k


@functools.partial(
    jax.jit,
    static_argnames=("nbits", "container_bits", "group_size", "k", "n",
                     "interpret", "bc4"),
)
def _qmm_call(
    x: Array,
    wq: Array,
    scale: Array,
    zs: Array,
    *,
    nbits,
    container_bits: int,
    group_size: int,
    k: int,
    n: int,
    interpret: bool = False,
    bc4: bool = False,
) -> Array:
    g = group_size
    cb = container_bits
    r = 8 // cb
    m = x.shape[0]
    n_pad = wq.shape[1]

    # Tile sizes: sublane-aligned M, lane-aligned N, K multiple of g.
    tm = min(_round_up(m, 16), 256)
    tn = min(n_pad, 256)
    while n_pad % tn:
        tn //= 2
    tk = _pick_tile_k(k, g)

    m_pad = _round_up(m, tm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    grid = (m_pad // tm, n_pad // tn, k // tk)

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, g=g, cb=cb, out_dtype=x.dtype, bc4=bc4),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // r, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // g, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // g, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k,
            bytes_accessed=(
                m_pad * k * x.dtype.itemsize
                + wq.size
                + scale.size * scale.dtype.itemsize * 2
                + m_pad * n_pad * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, wq, scale, zs)

    return out[:m, :n]


def _auto_interpret() -> bool:
    """Run Mosaic kernels natively on TPU, interpreted elsewhere (so the same
    model code runs in CPU tests / virtual-device sharding validation)."""
    return jax.default_backend() != "tpu"


def quant_matmul_pallas(
    x: Array, kqt: "KernelQTensor | KernelQTensor0", interpret: Optional[bool] = None
) -> Array:
    """`x @ W_dq` for a kernel-layout quantized weight (either axis).

    x: [..., K]  ->  [..., N] in x's dtype (accumulation in fp32).
    """
    if isinstance(kqt, KernelQTensor0):
        return _quant_matmul_pallas_ax0(x, kqt, interpret)
    if interpret is None:
        interpret = _auto_interpret()
    # Derive dims from the arrays, not the static metadata: inside shard_map
    # the struct carries its global `shape` but the arrays are local shards.
    # K may also be storage-padded (to a multiple of 8*g) by to_kernel_layout.
    k_arr = kqt.wq.shape[0] * kqt.r  # storage K (incl. padding)
    k_logical, n = _logical_dims(kqt)

    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_logical)
    if k_arr != k_logical:  # zero-pad activations over the padded K rows
        x2 = jnp.pad(x2, ((0, 0), (0, k_arr - k_logical)))
    out = _qmm_call(
        x2,
        kqt.wq,
        kqt.scale,
        kqt.zs,
        nbits=kqt.nbits,
        container_bits=kqt.container_bits,
        group_size=kqt.group_size,
        k=k_arr,
        n=n,
        interpret=interpret,
        bc4=kqt.bc4,
    )
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# W4A8 kernels: true 4-bit HBM storage feeding int8 MXU operands.
#
# The bf16 kernel above is floored at the MXU's bf16 weight-feed rate (~44 µs
# for 4096² at decode M on v5e): dequantizing to bf16 can never beat a dense
# bf16 matmul. These variants never materialize bf16 weights — codes unpack
# in-register to *int8* and the MXU runs int8×int8→int32 dots (v5e feeds int8
# operands ~1.5-2× faster). Per-group scale/zero fold into the fp32 epilogue:
#
#   y[m,n] = sx[m] · Σ_g ( s[g,n] · (x8_g @ c_g)[m,n]  −  xsum[m,g] · zs[g,n] )
#
# where x8 = round(x/sx) is the dynamically int8-quantized activation, c_g
# the raw codes of group g (int8), xsum per-group activation sums, and
# zs = zero·scale. Weight-side arithmetic is EXACT (bit-identical to HQQ
# dequant); the only approximation is the per-token activation quantization —
# the same one the int8 backend makes, but at 4-bit HBM bytes and with NO
# weight requantization error.
#
# The per-group partial sums would naively need one (shallow) MXU dot per
# group — measured ~2× slower than one deep dot on v5e (MXU drain between
# dots). The decode kernel instead uses CLASS REPLICATION: at decode the
# int8 operand tile forces TM ≥ 32 rows while M ≤ 8, so the activation row
# is replicated into S = TM/M "class" rows, class q masked to groups
# ≡ q within the K-tile (block-diagonal lhs, built by XLA outside). ONE deep
# int8 dot of depth S·g then yields every per-group partial in its own
# output row; scales apply on the small [TM, TN] output and a sublane
# reshape-sum folds classes back into M rows. For M > 32 (prefill) a
# batched per-group-dot variant keeps coverage (prefill-heavy serving runs
# the int8 or bf16 path anyway).
#
# ≙ the reference's "make quantized *fast*" layer (marlin's symmetric int4
# kernel + rank-1 zero trick, `/root/reference/hqq/backends/marlin.py:84-107`)
# re-imagined for the TPU MXU.
# ---------------------------------------------------------------------------


def _unpack_chunks_2d(p: Array, cb: int) -> list:
    """Bitfield chunks of a packed tile [TK/r, TN] as r separate int8 tiles
    (high field first). Extraction runs in int32 LANES over the bitcast view
    — 4 packed bytes per VPU op instead of widening every byte to its own
    int32 lane (measured: the widened unpack was ~2.5-3 VPU ops/weight,
    serializing ~30µs against the MXU dot at 7B shapes; this form plus
    one-dot-per-chunk took w4a8 from 66-75% to 85-108% of the same-run
    dense-int8 ceiling, tools/kernel_lab_a8v2.py). The shift+mask acts
    per-byte, so the result is byte-order-agnostic: bitcast∘bitcast is the
    identity and each output byte keeps only its own nibble/crumb bits."""
    r = 8 // cb
    if r == 1:
        return [p.astype(jnp.int8)]
    q32 = pltpu.bitcast(p, jnp.int32)
    m = jnp.int32(((1 << cb) - 1) * 0x01010101)
    chunks = []
    for j in range(r):
        sh = cb * (r - 1 - j)
        w = jax.lax.shift_right_logical(q32, sh) if sh else q32
        chunks.append(pltpu.bitcast(w & m, jnp.int8))
    return chunks


def _unpack_tile_2d(p: Array, cb: int) -> Array:
    """Unpack a packed tile [TK/r, TN] -> int8 codes [TK, TN] in chunk-concat
    row order: row (c·TK/r + p) holds the chunk-c bitfield of packed row p.
    In-group k order is (c, b, i) — consumers permute activations to match."""
    chunks = _unpack_chunks_2d(p, cb)
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)


def _qmm_a8_decode_kernel(
    xp_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, *, g, cb, s, meff,
    split=True, bc4=False
):
    """Class-replicated deep-dot decode kernel (see section comment).

    xp: [meff·s, TK] int8 — row (m·s + q) is slot m's activations masked to
        the lanes of in-tile group q; lanes in chunk-concat order for the
        chunk-split pack, NATURAL k order for bc4.
    meff == 1 accumulates partial class sums in 8 acc rows (summed by the
    caller); meff ≥ 8 folds classes in-kernel.
    """
    kidx = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tn = wq_ref.shape[-1]
    tkr = wq_ref.shape[0]
    if bc4:
        # bitcast-order pack: unpack is one register relabel + widen, then a
        # single deep int8 dot — no shift/mask chains on the weight path
        part = jax.lax.dot_general(
            xp_ref[:],
            _unpack_bc4_2d(wq_ref[:]),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    elif split:
        # one dot per bitfield chunk, lhs lane-sliced to the chunk's
        # positions (xp lane order within a tile is chunk-major): no
        # [TK, TN] concat ever materializes, and the per-chunk
        # shift/mask -> dot chains give Mosaic independent VPU/MXU work
        # to overlap
        part = None
        for j, cj in enumerate(_unpack_chunks_2d(wq_ref[:], cb)):
            pj = jax.lax.dot_general(
                xp_ref[:, j * tkr:(j + 1) * tkr],
                cj,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            part = pj if part is None else part + pj
    else:
        # concat + ONE deep dot: wins at shapes where the whole-N tile fits
        # and dot depth dominates (see _A8_PLANS)
        part = jax.lax.dot_general(
            xp_ref[:],
            _unpack_tile_2d(wq_ref[:], cb),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    # part [meff·s, TN]; the class mask makes row (m·s+q) = group-q partial
    # fp32 epilogue on the VPU (an MXU fp32 dot would run at bf16 operand
    # precision); xsum rows are already class-masked so the zero term needs
    # no per-group bookkeeping
    xsum = jnp.sum(xp_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    if meff == 1:
        contrib = part.astype(jnp.float32) * scale_ref[:] - xsum * zs_ref[:]
        acc_ref[:] += jnp.sum(contrib.reshape(8, s // 8, tn), axis=1)
    else:
        part4 = part.reshape(meff, s, tn).astype(jnp.float32)
        contrib = part4 * scale_ref[:][None] - xsum.reshape(meff, s, 1) * zs_ref[:][None]
        acc_ref[:] += jnp.sum(contrib, axis=1)

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _pick_tile_n(n_pad: int, target: int) -> int:
    """Largest multiple of 128 dividing n_pad, capped at `target`; falls back
    to the whole array (always a legal block) for odd/shard-local widths."""
    t = min(target, n_pad)
    t -= t % 128
    while t >= 128:
        if n_pad % t == 0:
            return t
        t -= 128
    return n_pad


def _a8_tile_plan(n_pad: int, target: int = 4096) -> tuple:
    """(tn, n_grid) for the a8 decode kernels. Large N tiles amortize the
    per-step xp load / xsum / epilogue (4096-class tiles measured 10-25%
    faster than 2048 at 7B/13B shapes). When n_pad has no good 128-multiple
    divisor (11008 = 2^8·43 -> best divisor 256), use a RAGGED last tile —
    Pallas clamps out-of-range blocks — instead of tiny tiles (256-wide ran
    at 62-66% of ceiling; ragged 4096 at 82-88%)."""
    tn = _pick_tile_n(n_pad, target)
    if tn >= 1024 or tn == n_pad:
        return tn, n_pad // tn
    tn = min(target, n_pad)
    return tn, -(-n_pad // tn)


# ---------------------------------------------------------------------------
# Decode-kernel tile plans. The best (dot structure, N-tile) combination is
# shape-dependent (measured, tools/kernel_lab_a8v2.py pass3, % of same-run
# dense-int8 ceiling): chunk-split dots win at most shapes (4096²: 92%,
# k=11264: 108%, k=5120: 111%) but the concat+deep-dot form with a whole-N
# tile wins at k=14336/n=5120 (95% vs 80%). `register_a8_plan` installs
# measured winners (the gemlite-autotune role in the reference's backend
# stack, `/root/reference/hqq/backends/gemlite.py`); unknown shapes take the
# chunk-split heuristic. tools/autotune_a8.py measures and registers plans
# for a model's shapes on the real chip.
# ---------------------------------------------------------------------------

# (k_arr, n_pad, group_size, container_bits, bc4) ->
#     {"s": int, "split": bool, "tn": int}
# s is part of the PLAN now (the tuner may prefer a deeper class tier, e.g.
# s=64 one-shot K for 4096-deep shapes) — dispatch validates divisibility.
_A8_PLANS: dict = {}


def register_a8_plan(k_arr: int, n_pad: int, group_size: int,
                     container_bits: int, *, s: int, split: bool = True,
                     tn: int, bc4: bool = True):
    """Install a measured decode-kernel plan; clears the call caches so a
    re-registered plan takes effect on the next trace."""
    _A8_PLANS[(k_arr, n_pad, group_size, container_bits, bool(bc4))] = dict(
        s=int(s), split=bool(split), tn=int(tn)
    )
    _qmm_a8_decode_call.clear_cache()
    _qmm_a8_lora_decode_call.clear_cache()


def _a8_decode_plan(k_arr: int, n_pad: int, g: int, cb: int, bc4: bool):
    """(s, split, tn) for an M=1 decode-kernel shape: the registered plan if
    valid, else the measured heuristic (deepest class tier dividing K, big
    ragged N tiles)."""
    p = _A8_PLANS.get((k_arr, n_pad, g, cb, bc4))
    if p is not None and k_arr % (p["s"] * g) == 0 and p["s"] % 8 == 0:
        return p["s"], p["split"], min(p["tn"], n_pad)
    s = 32 if k_arr % (32 * g) == 0 else (16 if k_arr % (16 * g) == 0 else 8)
    tn, _ = _a8_tile_plan(n_pad, 4096)
    return s, True, tn


def _load_default_plans() -> None:
    """Install the checked-in autotuned plans (`a8_plans_v5e.json`, written by
    `tools/autotune_a8.py` on the real chip). Plans only steer tiling — every
    (s, split, tn) choice is numerically identical — so installing them on a
    non-v5e backend (CPU tests) is harmless."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "a8_plans_v5e.json")
    if not os.path.exists(path):
        return
    try:
        with open(path) as f:
            data = json.load(f)
        for p in data.get("plans", []):
            _A8_PLANS[(p["k_arr"], p["n_pad"], p["g"], p["cb"], bool(p["bc4"]))] = (
                dict(s=int(p["s"]), split=bool(p["split"]), tn=int(p["tn"]))
            )
    except (OSError, ValueError, KeyError):  # never let a bad file break import
        pass


# lab-measured winners for the LLaMA-class 7B/13B shapes (g=64, 4-bit,
# chunk-split order — kept for bc4=False layouts; bc4 plans are installed by
# `tools/autotune_a8.py` via `a8_plans_v5e.json` below)
for _k, _n, _s, _split, _tn in [
    (4096, 4096, 32, True, 4096),
    (11264, 4096, 16, True, 4096),
    (4096, 11008, 32, True, 4096),   # ragged tail over 11008
    (14336, 5120, 32, False, 5120),  # concat + whole-N deep dot
    (5120, 13824, 16, True, 1536),
]:
    _A8_PLANS[(_k, _n, 64, 4, False)] = dict(s=_s, split=_split, tn=_tn)

_load_default_plans()


@functools.partial(
    jax.jit,
    static_argnames=("container_bits", "group_size", "k", "n", "s", "meff",
                     "interpret", "split", "tn", "bc4"),
)
def _qmm_a8_decode_call(
    x8: Array,
    wq: Array,
    scale: Array,
    zs: Array,
    *,
    container_bits: int,
    group_size: int,
    k: int,
    n: int,
    s: int,
    meff: int,
    interpret: bool = False,
    split: bool = True,
    tn: int = 0,
    bc4: bool = False,
) -> Array:
    g, cb = group_size, container_bits
    r = 8 // cb
    m = x8.shape[0]
    n_pad = wq.shape[1]
    tk = s * g
    nt = k // tk
    if m != meff:
        x8 = jnp.pad(x8, ((0, meff - m), (0, 0)))

    # Build the class-replicated block-diagonal lhs (XLA, off the hot loop's
    # weight path); row (m·s + q) masks to in-tile group b == q. Lane order
    # within a tile: NATURAL k for bc4 (the bitcast unpack preserves row
    # order), (chunk c, group b, offset i) matching _unpack_tile_2d's concat
    # otherwise.
    eye = jnp.eye(s, dtype=jnp.int8)
    if bc4:
        xg = x8.reshape(meff, nt, s, g).transpose(1, 0, 2, 3)  # [t,m,b,i]
        xp = xg[:, None] * eye[None, :, None, :, None]  # [t,q,m,b,i]
        xp = xp.transpose(2, 1, 0, 3, 4).reshape(meff * s, k)
    else:
        xg = x8.reshape(meff, nt, s, r, g // r).transpose(1, 0, 3, 2, 4)  # [t,m,c,b,i]
        xp = xg[:, None] * eye[None, :, None, None, :, None]  # [t,q,m,c,b,i]
        xp = xp.transpose(2, 1, 0, 3, 4, 5).reshape(meff * s, k)

    if not tn:
        tn, _ = _a8_tile_plan(n_pad, 4096 if meff == 1 else 2048)
    tn = min(tn, n_pad)
    grid = (-(-n_pad // tn), nt)
    acc_rows = 8 if meff == 1 else meff
    out = pl.pallas_call(
        functools.partial(_qmm_a8_decode_kernel, g=g, cb=cb, s=s, meff=meff,
                          split=split, bc4=bc4),
        grid=grid,
        in_specs=[
            pl.BlockSpec((meff * s, tk), lambda j, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // r, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((acc_rows, tn), lambda j, kk: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((acc_rows, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((acc_rows, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * meff * s * n_pad * k,
            bytes_accessed=meff * s * k + wq.size + scale.size * 8 + acc_rows * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wq, scale, zs)
    if meff == 1:
        return jnp.sum(out, axis=0, keepdims=True)[:, :n]  # fold partial class rows
    return out[:m, :n]


def _qmm_a8_kernel(x3_ref, xsum_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, *, g, cb,
                   bc4=False):
    """Batched per-group-dot fallback (any M): one (TM, TN) fp32 output tile
    accumulating over the K grid dim. Activations arrive pre-grouped
    [K/g, M, g] (Mosaic cannot split the lane dim in-kernel) with per-group
    sums precomputed [K/g, M]. ~2× off the decode kernel at small M (MXU
    drain between the shallow per-group dots) — used only where class
    replication doesn't apply (M > 32)."""
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tn = wq_ref.shape[-1]
    if bc4:
        c8 = _unpack_bc4_2d(wq_ref[:])  # [TK, TN] int8 signed, natural order
        c8 = c8.reshape(c8.shape[0] // g, g, tn)
    else:
        c3 = _unpack_tile(wq_ref[:], g, cb, tn)  # [B, g, TN] int32, < 2^cb
        c8 = c3.astype(jnp.int8)

    # int8×int8 → int32 on the MXU, one dot per group (batched)
    part = jax.lax.dot_general(
        x3_ref[:],
        c8,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [B, TM, TN]
    # scale + zero-point correction fused on the VPU in full fp32 (an MXU
    # fp32 dot would silently run at bf16 operand precision):
    #   Σ_b part[b]·s[b]  −  xsum[b] ⊗ zs[b]
    acc_ref[:] += jnp.sum(
        part.astype(jnp.float32) * scale_ref[:][:, None, :]
        - xsum_ref[:][:, :, None] * zs_ref[:][:, None, :].astype(jnp.float32),
        axis=0,
    )

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("container_bits", "group_size", "k", "n", "interpret",
                     "bc4"),
)
def _qmm_a8_call(
    x8: Array,
    wq: Array,
    scale: Array,
    zs: Array,
    *,
    container_bits: int,
    group_size: int,
    k: int,
    n: int,
    interpret: bool = False,
    bc4: bool = False,
) -> Array:
    g, cb = group_size, container_bits
    r = 8 // cb
    m = x8.shape[0]
    n_pad = wq.shape[1]

    tm = min(_round_up(m, 32), 256)  # int8 sublane tile is 32
    tn = min(n_pad, 512)
    while n_pad % tn:
        tn //= 2
    # B = TK//g groups per tile: keep the [B, TM, TN] int32 partial modest
    tk = _pick_tile_k(k, g, target=max(8 * g, 512))

    m_pad = _round_up(m, tm)
    if m_pad != m:
        x8 = jnp.pad(x8, ((0, m_pad - m), (0, 0)))

    # Pre-group activations (Mosaic cannot split the lane dim in-kernel):
    # [M, K] -> [K/g, M, g], plus per-group sums [K/g, M] for the zero term.
    x3 = x8.reshape(m_pad, k // g, g).transpose(1, 0, 2)
    xsum = jnp.sum(x3.astype(jnp.float32), axis=2)  # [K/g, M]

    grid = (m_pad // tm, n_pad // tn, k // tk)
    out = pl.pallas_call(
        functools.partial(_qmm_a8_kernel, g=g, cb=cb, bc4=bc4),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk // g, tm, g), lambda i, j, kk: (kk, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // g, tm), lambda i, j, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // r, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // g, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // g, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k,
            bytes_accessed=(
                m_pad * k
                + wq.size
                + scale.size * scale.dtype.itemsize * 2
                + m_pad * n_pad * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x3, xsum, wq, scale, zs)
    return out[:m, :n]


def quantize_activations_int8(
    x2: Array, reduce_axis: Optional[str] = None
) -> tuple[Array, Array]:
    """Per-row symmetric int8 activation quantization: x ≈ x8 * sx.

    reduce_axis: mesh axis name to pmax the row amax over (shard_map TP,
    K-sharded rows) — every rank then uses the GLOBAL-K scale, so the
    per-rank int8 codes are exactly the single-device codes restricted to
    the local K slice and the psum of partials reproduces the single-device
    result (no shard-dependent requantization error)."""
    xf = x2.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    if reduce_axis is not None:
        amax = jax.lax.pmax(amax, reduce_axis)
    sx = jnp.maximum(amax / 127.0, 1e-8)
    x8 = jnp.round(xf / sx).astype(jnp.int8)
    return x8, sx


def quant_matmul_pallas_a8(
    x: Array, kqt: KernelQTensor, interpret: Optional[bool] = None,
    reduce_axis: Optional[str] = None,
) -> Array:
    """`x @ W_dq` from true 4-bit storage via int8 MXU dots (see kernel doc).

    x: [..., K] -> [..., N] in x's dtype. Weight-side exact; activations are
    dynamically int8-quantized per token (≙ the int8 backend's activation
    path, `backends/int8_backend.py`). Routes to the class-replicated decode
    kernel for M <= 32, the batched per-group variant otherwise.

    reduce_axis: mesh axis to pmax the activation amax over (K-sharded TP —
    see `quantize_activations_int8`); the bf16-operand fallback routes are
    full-precision and need no reduction."""
    if isinstance(kqt, KernelQTensor0):
        # axis=0 scales vary along the contraction dim per output row, so
        # they cannot factor out of an int8 dot — the fused bf16-operand
        # kernel is the fast axis=0 path (MXU bf16-feed floor, ~26× faster
        # than XLA dequant-then-matmul at decode M).
        return _quant_matmul_pallas_ax0(x, kqt, interpret)
    if interpret is None:
        interpret = _auto_interpret()
    if kqt.nbits == 8:
        # true 8-bit codes (0..255) cannot ride int8 MXU operands (the
        # in-register cast would wrap); the bf16-operand kernel serves them
        return quant_matmul_pallas(x, kqt, interpret=interpret)
    g = kqt.group_size
    k_arr = kqt.wq.shape[0] * kqt.r
    k_logical, n = _logical_dims(kqt)

    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_logical)
    m = x2.shape[0]
    if m > 32:
        # Prefill regime: at large M the MXU is compute-bound, not
        # weight-feed-bound, so the bf16-operand kernel wins (measured 2.2×
        # at M=512) AND skips the activation quantization entirely.
        return quant_matmul_pallas(x, kqt, interpret=interpret)
    x8, sx = quantize_activations_int8(x2, reduce_axis)
    if k_arr != k_logical:
        x8 = jnp.pad(x8, ((0, 0), (0, k_arr - k_logical)))
    n_pad = kqt.wq.shape[1]
    common = dict(
        container_bits=kqt.container_bits,
        group_size=kqt.group_size,
        k=k_arr,
        n=n,
        interpret=interpret,
        bc4=kqt.bc4,
    )
    if m == 1 and k_arr % (8 * g) == 0:
        s, split, tn = _a8_decode_plan(k_arr, n_pad, g, kqt.container_bits,
                                       kqt.bc4)
        if s >= 16:
            out = _qmm_a8_decode_call(x8, kqt.wq, kqt.scale, kqt.zs,
                                      s=s, meff=1, split=split, tn=tn, **common)
        else:
            out = _qmm_a8_decode_call(x8, kqt.wq, kqt.scale, kqt.zs,
                                      s=8, meff=8, split=split, tn=tn, **common)
    elif k_arr % (8 * g) == 0:
        out = _qmm_a8_decode_call(
            x8, kqt.wq, kqt.scale, kqt.zs, s=8, meff=_round_up(m, 8), **common
        )
    else:
        # odd shard-local K: batched per-group-dot fallback
        out = _qmm_a8_call(x8, kqt.wq, kqt.scale, kqt.zs, **common)
    out = (out * sx).astype(x.dtype)
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# Standalone dequantization kernel (≙ reference `hqq_aten.dequantize`)
# ---------------------------------------------------------------------------


def _dq_kernel(wq_ref, scale_ref, zs_ref, out_ref, *, g, cb, bc4=False):
    tn = wq_ref.shape[-1]
    c3 = _unpack_tile(wq_ref[:], g, cb, tn, bc4)
    w3 = c3.astype(scale_ref.dtype) * scale_ref[:][:, None, :] - zs_ref[:][:, None, :]
    out_ref[:] = w3.reshape(out_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("container_bits", "group_size", "k", "n",
                              "interpret", "bc4")
)
def _dq_call(wq, scale, zs, *, container_bits, group_size, k, n, interpret=False,
             bc4=False):
    g, cb = group_size, container_bits
    r = 8 // cb
    n_pad = wq.shape[1]
    tn = min(n_pad, 512)
    while n_pad % tn:
        tn //= 2
    tk = _pick_tile_k(k, g, target=1024)
    grid = (k // tk, n_pad // tn)
    out = pl.pallas_call(
        functools.partial(_dq_kernel, g=g, cb=cb, bc4=bc4),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk // r, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // g, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // g, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n_pad), scale.dtype),
        interpret=interpret,
    )(wq, scale, zs)
    return out[:, :n]


def dequant_pallas(
    kqt: "KernelQTensor | KernelQTensor0", interpret: Optional[bool] = None
) -> Array:
    """Dequantize a kernel-layout weight to W^T [K, N] via a Pallas kernel."""
    if isinstance(kqt, KernelQTensor0):
        return _dequant_pallas_ax0(kqt, interpret)
    if interpret is None:
        interpret = _auto_interpret()
    k_arr = kqt.wq.shape[0] * kqt.r
    k_logical, n = _logical_dims(kqt)
    out = _dq_call(
        kqt.wq,
        kqt.scale,
        kqt.zs,
        container_bits=kqt.container_bits,
        group_size=kqt.group_size,
        k=k_arr,
        n=n,
        interpret=interpret,
        bc4=kqt.bc4,
    )
    return out[:k_logical]


# ---------------------------------------------------------------------------
# Axis=0 kernel path — the quality-mode grouping the reference's ENTIRE native
# layer serves (`/root/reference/hqq/kernels/hqq_aten_cuda_kernel.cu:110-122`;
# `hqq_aten_cuda.cpp:42` asserts axis==0). BASELINE config 3 names 2/3-bit
# axis=0 explicitly; without this, axis=0 decode pays XLA's
# dequantize-then-matmul (~26× the fused kernel's time at decode M).
#
# Layout (SURVEY §7's "handle axis duality via layout transposition at pack
# time", realized): the reference's axis=0 grouping of W [N, K] is STRIDED —
# `W.reshape(g, -1)` puts the g members of group (b, k) at rows
# {b, b+P, b+2P, ...} of column k (P = N/g). A pack-time row PERMUTATION
# p = b·g + a  (for n = a·P + b) makes every group a contiguous run of g
# rows, so scale/zero become [P, K] indexed by (row-block, column):
#
#     W'[p, k] = codes'[p, k] · scale[p//g, k] − zs[p//g, k]
#
# The kernel keeps W' row-major [N, K] (NOT transposed like the axis=1
# layout): the group axis lands on SUBLANES, where Mosaic supports the 3-D
# broadcast dequant (lane-dim expansion crashes Mosaic — probed). The matmul
# computes y'^T = W'_dq @ x^T with the weight as the streamed lhs, and the
# caller un-permutes with a pure reshape/transpose (no gather):
#     y[m, a·P + b] = y'[m, b·g + a].
#
# Packing reuses the per-group chunk-split scheme along N, so any N-tile that
# is a multiple of g unpacks locally — `_unpack_tile` and the dequant
# broadcast are shared with the axis=1 kernel verbatim.
#
# CHUNK-MAJOR variant (g//r < 8): the shared scheme's unpack chunks are
# [n_groups, g//r, TK] — when the within-group chunk height g//r drops below
# the native 8-sublane tile (2-bit g16, 1-bit g16/g32), Mosaic relayouts the
# sub-tile concat and the kernel goes compute-bound (measured 110 µs vs the
# ~45 µs stream floor at 4096², tools/kernel_lab_ax0.py). For those configs
# the pack instead orders packed rows chunk-POSITION-major across all groups
# (row c·NG + gi packs logical rows gi·g + j·step + c), so in-kernel:
#   - shift/mask chunks stay full-tile 2-D [TNR, TK],
#   - scale/zs expand by CONCAT-style `pltpu.repeat` (row p → scale[p mod NG],
#     which IS the group id in this order) — no sub-8-sublane interleave,
#   - each chunk j gets its own dot into a contiguous accumulator slice,
# and the chunk-major row order is un-permuted outside the kernel by a pure
# reshape/transpose on the (decode-tiny) output. Measured 110 → ~52 µs for
# 2-bit g16 (stream-bound), identical results.
# ---------------------------------------------------------------------------


@struct.dataclass
class KernelQTensor0:
    """Axis=0 kernel layout (see section comment).

    Arrays (N padded to a multiple of 8·g with whole zero groups appended in
    permuted space; K padded to a multiple of 128 lanes):
      wq:    uint8 [N_pad // r, K_pad]  per-group chunk-split packed codes of
                                        the row-PERMUTED weight W' [N, K]
                                        (chunk_major: rows ordered c·NG + gi
                                        instead of gi·step + c — see section
                                        comment)
      scale: [N_pad // g, K_pad]        dequant scale (multiplicative)
      zs:    [N_pad // g, K_pad]        zero · scale
    """

    wq: Array
    scale: Array
    zs: Array

    nbits: float = struct.field(pytree_node=False, default=4)
    container_bits: int = struct.field(pytree_node=False, default=4)
    group_size: int = struct.field(pytree_node=False, default=64)
    shape: tuple = struct.field(pytree_node=False, default=())  # (N, K) logical
    compute_dtype: Any = struct.field(pytree_node=False, default=jnp.bfloat16)
    chunk_major: bool = struct.field(pytree_node=False, default=False)

    @property
    def k(self) -> int:  # in_features
        return self.shape[1]

    @property
    def n(self) -> int:  # out_features
        return self.shape[0]

    @property
    def r(self) -> int:
        return 8 // self.container_bits


def supports_kernel_layout_ax0(qt: QTensor) -> bool:
    """Whether an axis=0 QTensor can convert to the fused-kernel layout.

    Needs g | N (so the strided groups permute to contiguous row blocks —
    holds for every practical (dim, group) combination; odd cases fall back
    to the XLA path, the same graceful degradation the reference's backends
    apply to unsupported configs)."""
    if qt.axis != 0 or not qt.channel_wise or qt.group_size is None:
        return False
    g = qt.group_size
    n_out, _ = qt.shape
    cb = _KERNEL_CONTAINER_BITS[qt.nbits]
    r = 8 // cb
    return n_out % g == 0 and g % r == 0 and g % 8 == 0


def to_kernel_layout_ax0(qt: QTensor, meta_dtype=jnp.float32) -> KernelQTensor0:
    """Convert a canonical group-space axis=0 `QTensor` to kernel layout.

    One-time, jit-free — the same role `to_kernel_layout` plays for axis=1
    (≙ the reference backends' repack at prepare_for_inference time).

    meta_dtype: scale/zs storage dtype. For the sub-8-step CHUNK-MAJOR
    configs fp32 meta dominates HBM traffic (2b g16: ~2/3 of all bytes) and
    bf16 measured 52.6→44.9 µs at 4096² M=1 (1b g32: 43.7→38.5, BELOW the
    ax1-4b floor) with ~5e-3 relative weight drift — noise against 1-2-bit
    quantization error. For ≥8-step configs bf16 measured ~25% SLOWER (same
    Mosaic bf16-broadcast deficiency as the ax1 note in `to_kernel_layout`).
    The serving backends apply this policy automatically
    (`backends.pallas_backend._ax0_meta_dtype`); this function keeps an
    explicit fp32 default so direct callers get bit-exactness unless they
    opt in. Measured: tools/kernel_lab_ax0_meta.py."""
    assert supports_kernel_layout_ax0(qt), (
        "axis=0 kernel layout requires g | out_features and g % 8 == 0"
    )
    qt = resolve_meta(qt)
    n_out, k = qt.shape
    g = qt.group_size
    cb = _KERNEL_CONTAINER_BITS[qt.nbits]
    p_blocks = n_out // g

    codes = unpack_codes(qt, jnp.int32)  # [g, P*K] group space
    # permute rows: codes'[b·g + a, k] = codes[a, b·K + k]
    codes_nk = codes.reshape(g, p_blocks, k).transpose(1, 0, 2).reshape(n_out, k)
    scale_pk = qt.scale.reshape(p_blocks, k).astype(jnp.float32)
    zero_pk = qt.zero.reshape(p_blocks, k).astype(jnp.float32)

    # pad N with whole zero groups (IN permuted space — the un-permute slices
    # them off as trailing b-blocks) and K to the 128-lane rule
    n_pad = _round_up(n_out, 8 * g)
    if n_pad != n_out:
        codes_nk = jnp.pad(codes_nk, ((0, n_pad - n_out), (0, 0)))
        scale_pk = jnp.pad(scale_pk, ((0, (n_pad - n_out) // g), (0, 0)))
        zero_pk = jnp.pad(zero_pk, ((0, (n_pad - n_out) // g), (0, 0)))
    k_pad = _round_up(k, 128)
    if k_pad != k:
        codes_nk = jnp.pad(codes_nk, ((0, 0), (0, k_pad - k)))
        scale_pk = jnp.pad(scale_pk, ((0, 0), (0, k_pad - k)))
        zero_pk = jnp.pad(zero_pk, ((0, 0), (0, k_pad - k)))

    r = 8 // cb
    chunk_major = r > 1 and (g // r) < 8
    if chunk_major:
        wq = _pack_kernel_layout_ax0_cm(codes_nk, g, cb)
    else:
        wq = _pack_kernel_layout(codes_nk, g, cb)  # groups run along dim 0
    return KernelQTensor0(
        wq=wq,
        scale=scale_pk.astype(meta_dtype),
        zs=(zero_pk * scale_pk).astype(meta_dtype),
        nbits=qt.nbits,
        container_bits=cb,
        group_size=g,
        shape=(n_out, k),
        compute_dtype=qt.compute_dtype,
        chunk_major=chunk_major,
    )


def _pack_kernel_layout_ax0_cm(codes_nk: Array, g: int, cb: int) -> Array:
    """Chunk-position-major packing for sub-8-sublane-step configs.

    codes_nk [N_pad, K] (groups = contiguous row blocks of g) → packed
    [step·NG, K] where packed row c·NG + gi ORs logical rows gi·g + j·step + c
    over chunks j (step = g // r, NG = N_pad // g). The in-kernel unpack of
    any packed-row tile is then pure full-tile shift/mask — no sub-tile
    interleave (see section comment)."""
    n_pad, k = codes_nk.shape
    r = 8 // cb
    step = g // r
    ng = n_pad // g
    c4 = codes_nk.reshape(ng, r, step, k).astype(jnp.uint8)
    packed = c4[:, 0] << (cb * (r - 1))
    for j in range(1, r):
        packed = packed | (c4[:, j] << (cb * (r - 1 - j)))
    return packed.transpose(1, 0, 2).reshape(step * ng, k)


def _qmm_ax0_kernel(xt_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, *, g, cb, out_dtype):
    """One (TN, TM) output tile of y'^T = W'_dq @ x^T, accumulating over the
    K grid dimension. Identical dequant structure to `_qmm_kernel` — the
    group axis is just on sublanes instead of the contraction dim."""
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tk = wq_ref.shape[-1]
    c3 = _unpack_tile(wq_ref[:], g, cb, tk)  # [TN//g, g, TK]
    compute_dtype = scale_ref.dtype
    w3 = c3.astype(compute_dtype) * scale_ref[:][:, None, :] - zs_ref[:][:, None, :]
    w = w3.reshape(c3.shape[0] * g, tk)  # [TN, TK]

    acc_ref[:] += jax.lax.dot_general(
        w.astype(xt_ref.dtype),
        xt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _pick_tile_ax0(dim: int, unit: int, target: int) -> int:
    """Largest multiple of `unit` dividing `dim`, capped near `target`;
    whole-dim fallback."""
    best = None
    t = unit
    while t <= min(dim, target):
        if dim % t == 0:
            best = t
        t += unit
    return best if best is not None else dim


@functools.partial(
    jax.jit,
    static_argnames=("container_bits", "group_size", "n_pad", "k_pad", "interpret"),
)
def _qmm_ax0_call(
    xt: Array,  # [K_pad, M_pad]
    wq: Array,
    scale: Array,
    zs: Array,
    *,
    container_bits: int,
    group_size: int,
    n_pad: int,
    k_pad: int,
    interpret: bool = False,
) -> Array:
    g, cb = group_size, container_bits
    r = 8 // cb
    m_pad = xt.shape[1]

    tn = _pick_tile_ax0(n_pad, 8 * g, 2048)
    tk = _pick_tile_ax0(k_pad, 128, 1024)
    # M is gridded (middle dim) above 256 lanes — a whole-M block at prefill
    # lengths would blow the VMEM budget (acc is fp32 [TN, TM])
    tm = min(m_pad, 256)

    grid = (n_pad // tn, m_pad // tm, k_pad // tk)
    out = pl.pallas_call(
        functools.partial(_qmm_ax0_kernel, g=g, cb=cb, out_dtype=xt.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk, tm), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn // r, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn // g, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn // g, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), xt.dtype),
        scratch_shapes=[pltpu.VMEM((tn, tm), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=(
                m_pad * k_pad * xt.dtype.itemsize
                + wq.size
                + scale.size * scale.dtype.itemsize * 2
                + m_pad * n_pad * xt.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xt, wq, scale, zs)
    return out


def _qmm_ax0_cm_kernel(
    xt_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, *, g, cb, f_rep, out_dtype
):
    """Chunk-major tile: packed rows stay full-tile 2-D through shift/mask;
    scale/zs expand by concat-repeat (row p → scale[p mod NG] = its group);
    chunk j dots into accumulator slice [j·TNR, (j+1)·TNR)."""
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    r = 8 // cb
    mask = (1 << cb) - 1
    p = wq_ref[:].astype(jnp.int32)  # [TNR, TK]
    tnr = p.shape[0]
    if f_rep > 1:
        s_rep = pltpu.repeat(scale_ref[:], f_rep, axis=0)
        zs_rep = pltpu.repeat(zs_ref[:], f_rep, axis=0)
    else:
        s_rep = scale_ref[:]
        zs_rep = zs_ref[:]

    for j in range(r):
        # top chunk (j=0) needs no mask: p is uint8-ranged
        cj = (p >> (cb * (r - 1))) if j == 0 else (p >> (cb * (r - 1 - j))) & mask
        wj = cj.astype(jnp.float32) * s_rep - zs_rep
        acc_ref[j * tnr : (j + 1) * tnr] += jax.lax.dot_general(
            wj.astype(xt_ref.dtype),
            xt_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("container_bits", "group_size", "n_pad", "k_pad", "interpret"),
)
def _qmm_ax0_cm_call(
    xt: Array,  # [K_pad, M_pad]
    wq: Array,  # [step*NG, K_pad] chunk-major
    scale: Array,
    zs: Array,
    *,
    container_bits: int,
    group_size: int,
    n_pad: int,
    k_pad: int,
    interpret: bool = False,
) -> Array:
    g, cb = group_size, container_bits
    r = 8 // cb
    step = g // r
    ng = n_pad // g  # multiple of 8 (N padded to 8·g)
    m_pad = xt.shape[1]

    # Tile = f chunk-positions × gblk groups of packed rows (TNR = f·gblk).
    # Either all groups fit one tile (f ≥ 1 positions, concat-repeat f) or a
    # tile is one position × a divisor-slice of groups (f = 1, direct block).
    target = 1024
    if ng <= target:
        gblk = ng
        f = 1
        for cand in range(step, 0, -1):
            if step % cand == 0 and cand * ng <= target:
                f = cand
                break
    else:
        gblk = _pick_tile_ax0(ng, 8, target)
        f = 1
    tnr = f * gblk
    tk = _pick_tile_ax0(k_pad, 128, 1024)
    n_tiles = (step // f) * (ng // gblk)
    ngb = ng // gblk
    tm = min(m_pad, 256)  # M gridded above 256 lanes (VMEM, as group-major)

    grid = (n_tiles, m_pad // tm, k_pad // tk)
    out = pl.pallas_call(
        functools.partial(
            _qmm_ax0_cm_kernel, g=g, cb=cb, f_rep=tnr // gblk, out_dtype=xt.dtype
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk, tm), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tnr, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((gblk, tk), lambda i, j, kk: (i % ngb, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((gblk, tk), lambda i, j, kk: (i % ngb, kk), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r * tnr, tm), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), xt.dtype),
        scratch_shapes=[pltpu.VMEM((r * tnr, tm), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=(
                m_pad * k_pad * xt.dtype.itemsize
                + wq.size
                + scale.size * scale.dtype.itemsize * 2
                + m_pad * n_pad * xt.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xt, wq, scale, zs)
    # Rows arrive as (c_blk, g_blk, j, c', gi'); permuted-space row is
    # (g_blk·gblk + gi')·g + j·step + c_blk·f + c' — pure reshape/transpose.
    o6 = out.reshape(step // f, ngb, r, f, gblk, m_pad)
    return o6.transpose(1, 4, 2, 0, 3, 5).reshape(n_pad, m_pad)


def _unpermute_ax0(y_perm: Array, n_out: int, g: int) -> Array:
    """[..., N_pad] permuted-space outputs -> [..., N] logical order:
    y[..., a·P + b] = y'[..., b·g + a]. Pure reshape/transpose — no gather."""
    p_blocks = n_out // g
    lead = y_perm.shape[:-1]
    y3 = y_perm.reshape(*lead, y_perm.shape[-1] // g, g)[..., :p_blocks, :]
    return jnp.swapaxes(y3, -1, -2).reshape(*lead, n_out)


def _quant_matmul_pallas_ax0(
    x: Array, kqt: KernelQTensor0, interpret: Optional[bool] = None
) -> Array:
    if interpret is None:
        interpret = _auto_interpret()
    n_out, k = kqt.shape
    g = kqt.group_size
    n_pad = kqt.wq.shape[0] * kqt.r
    k_pad = kqt.wq.shape[1]

    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if k_pad != k:
        x2 = jnp.pad(x2, ((0, 0), (0, k_pad - k)))
    # above one 256-lane M tile, pad M so the grid divides evenly
    m_pad = _round_up(m, 8) if m <= 256 else _round_up(m, 256)
    xt = jnp.zeros((k_pad, m_pad), x2.dtype).at[:, :m].set(x2.T)

    call = _qmm_ax0_cm_call if kqt.chunk_major else _qmm_ax0_call
    out_t = call(
        xt,
        kqt.wq,
        kqt.scale,
        kqt.zs,
        container_bits=kqt.container_bits,
        group_size=g,
        n_pad=n_pad,
        k_pad=k_pad,
        interpret=interpret,
    )  # [N_pad, M_pad]
    y = _unpermute_ax0(out_t.T[:m], n_out, g)
    return y.reshape(*lead, n_out)


def _dequant_pallas_ax0(kqt: KernelQTensor0, interpret: Optional[bool] = None) -> Array:
    """Dequantize an axis=0 kernel-layout weight to W^T [K, N] (matching
    `dequant_pallas`'s convention so callers are layout-agnostic)."""
    if interpret is None:
        interpret = _auto_interpret()
    n_out, k = kqt.shape
    n_pad = kqt.wq.shape[0] * kqt.r
    wq = kqt.wq
    if kqt.chunk_major:
        # un-shuffle chunk-position-major rows (c·NG + gi) back to the
        # group-major order (gi·step + c) the shared dequant kernel expects —
        # dequant is a cold path, the transpose is one-time
        g, r = kqt.group_size, kqt.r
        step = g // r
        ng = n_pad // g
        kp = wq.shape[1]
        wq = wq.reshape(step, ng, kp).transpose(1, 0, 2).reshape(step * ng, kp)
    # reuse the axis=1 dequant kernel: its row-grouped unpack/affine is
    # exactly this layout's (groups along dim 0 of a [rows, lanes] matrix)
    w_perm = _dq_call(
        wq,
        kqt.scale,
        kqt.zs,
        container_bits=kqt.container_bits,
        group_size=kqt.group_size,
        k=n_pad,
        n=kqt.wq.shape[1],
        interpret=interpret,
    )[:, :k]  # [N_pad, K] permuted rows
    w = _unpermute_ax0(w_perm.T, n_out, kqt.group_size)  # [K, N]
    return w


# ---------------------------------------------------------------------------
# Fused dequant-matmul + LoRA epilogue (HQQ+ in ONE kernel):
#     out = x @ W_dq + (x @ A) @ B
# The rank-r partial (x @ A) accumulates alongside the main accumulator over
# the K grid; the final K step applies B in the epilogue — the adapter never
# costs a second pass over x (≙ BASELINE "low-rank adapters fused into
# dequant-matmul"; the reference merges zeros into adapters instead,
# `utils/patching.py:193-257`).
# ---------------------------------------------------------------------------


def _qmm_lora_kernel(
    x_ref, wq_ref, scale_ref, zs_ref, a_ref, b_ref, out_ref, acc_ref, p_ref,
    *, g, cb, out_dtype, bc4=False
):
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        p_ref[:] = jnp.zeros_like(p_ref)

    tn = wq_ref.shape[-1]
    c3 = _unpack_tile(wq_ref[:], g, cb, tn, bc4)
    compute_dtype = scale_ref.dtype
    w3 = c3.astype(compute_dtype) * scale_ref[:][:, None, :] - zs_ref[:][:, None, :]
    w = w3.reshape(c3.shape[0] * g, tn)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w.astype(x_ref.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # rank-r partial: p += x_tile @ A_tile   (A blocked over K)
    p_ref[:] += jax.lax.dot_general(
        x_ref[:], a_ref[:].astype(x_ref.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kidx == nk - 1)
    def _():
        lora = jax.lax.dot_general(
            p_ref[:].astype(jnp.float32), b_ref[:].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[:] = (acc_ref[:] + lora).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("container_bits", "group_size", "k", "n", "interpret",
                     "bc4"),
)
def _qmm_lora_call(
    x, wq, scale, zs, a, b, *, container_bits, group_size, k, n, interpret=False,
    bc4=False
):
    g, cb = group_size, container_bits
    r = 8 // cb
    m = x.shape[0]
    n_pad = wq.shape[1]
    r_pad = a.shape[1]

    tm = min(_round_up(m, 16), 256)
    tn = min(n_pad, 256)
    while n_pad % tn:
        tn //= 2
    tk = _pick_tile_k(k, g)
    m_pad = _round_up(m, tm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    grid = (m_pad // tm, n_pad // tn, k // tk)
    out = pl.pallas_call(
        functools.partial(_qmm_lora_kernel, g=g, cb=cb, out_dtype=x.dtype,
                          bc4=bc4),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // r, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // g, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // g, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, r_pad), lambda i, j, kk: (kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, tn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, tn), jnp.float32),
            pltpu.VMEM((tm, r_pad), jnp.float32),
        ],
        interpret=interpret,
    )(x, wq, scale, zs, a, b)
    return out[:m, :n]


def _qmm_a8_lora_decode_kernel(
    xp_ref, wq_ref, scale_ref, zs_ref, xa_ref, b_ref, out_ref, acc_ref,
    *, g, cb, s, meff, bc4=False
):
    """Class-replicated a8 decode kernel + LoRA epilogue (BASELINE config 4:
    adapters fused into the fast dequant-matmul). The rank-r partial
    xa = (x @ A) / sx is precomputed at FULL precision outside (the adapter
    must not see the int8 activation rounding); the final K step adds
    xa @ B_tile to the accumulator — the caller's `· sx` then restores
    base·sx + (x@A)@B exactly."""
    kidx = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tn = wq_ref.shape[-1]
    tkr = wq_ref.shape[0]
    if bc4:
        part = jax.lax.dot_general(
            xp_ref[:], _unpack_bc4_2d(wq_ref[:]),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        part = None  # chunk-split dots, same as _qmm_a8_decode_kernel
        for j, cj in enumerate(_unpack_chunks_2d(wq_ref[:], cb)):
            pj = jax.lax.dot_general(
                xp_ref[:, j * tkr:(j + 1) * tkr], cj,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            part = pj if part is None else part + pj
    xsum = jnp.sum(xp_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    if meff == 1:
        contrib = part.astype(jnp.float32) * scale_ref[:] - xsum * zs_ref[:]
        acc_ref[:] += jnp.sum(contrib.reshape(8, s // 8, tn), axis=1)
    else:
        part4 = part.reshape(meff, s, tn).astype(jnp.float32)
        contrib = part4 * scale_ref[:][None] - xsum.reshape(meff, s, 1) * zs_ref[:][None]
        acc_ref[:] += jnp.sum(contrib, axis=1)

    @pl.when(kidx == nk - 1)
    def _():
        lora = jax.lax.dot_general(
            xa_ref[:], b_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [acc_rows, TN]; rows past M are zero (xa zero-padded)
        out_ref[:] = acc_ref[:] + lora


@functools.partial(
    jax.jit,
    static_argnames=("container_bits", "group_size", "k", "n", "s", "meff",
                     "interpret", "split", "tn", "bc4"),
)
def _qmm_a8_lora_decode_call(
    x8: Array,
    wq: Array,
    scale: Array,
    zs: Array,
    xa: Array,  # [M, r_pad] fp32, pre-divided by sx
    b: Array,  # [r_pad, N_pad] fp32 (scaling folded)
    *,
    container_bits: int,
    group_size: int,
    k: int,
    n: int,
    s: int,
    meff: int,
    interpret: bool = False,
    split: bool = True,
    tn: int = 0,
    bc4: bool = False,
) -> Array:
    g, cb = group_size, container_bits
    r = 8 // cb
    m = x8.shape[0]
    n_pad = wq.shape[1]
    tk = s * g
    nt = k // tk
    if m != meff:
        x8 = jnp.pad(x8, ((0, meff - m), (0, 0)))

    # identical block-diagonal class-replicated lhs as _qmm_a8_decode_call
    # (natural k lane order for bc4, chunk-major otherwise)
    eye = jnp.eye(s, dtype=jnp.int8)
    if bc4:
        xg = x8.reshape(meff, nt, s, g).transpose(1, 0, 2, 3)
        xp = xg[:, None] * eye[None, :, None, :, None]
        xp = xp.transpose(2, 1, 0, 3, 4).reshape(meff * s, k)
    else:
        xg = x8.reshape(meff, nt, s, r, g // r).transpose(1, 0, 3, 2, 4)
        xp = xg[:, None] * eye[None, :, None, None, :, None]
        xp = xp.transpose(2, 1, 0, 3, 4, 5).reshape(meff * s, k)

    acc_rows = 8 if meff == 1 else meff
    r_pad = b.shape[0]
    xa_p = jnp.zeros((acc_rows, r_pad), jnp.float32).at[: xa.shape[0]].set(xa)

    if not tn:
        tn, _ = _a8_tile_plan(n_pad, 4096 if meff == 1 else 2048)
    tn = min(tn, n_pad)
    grid = (-(-n_pad // tn), nt)
    out = pl.pallas_call(
        functools.partial(_qmm_a8_lora_decode_kernel, g=g, cb=cb, s=s, meff=meff,
                          bc4=bc4),
        grid=grid,
        in_specs=[
            pl.BlockSpec((meff * s, tk), lambda j, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // r, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((acc_rows, r_pad), lambda j, kk: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, tn), lambda j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((acc_rows, tn), lambda j, kk: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((acc_rows, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((acc_rows, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * meff * s * n_pad * k + 2 * acc_rows * r_pad * n_pad,
            bytes_accessed=meff * s * k + wq.size + scale.size * 8
            + r_pad * n_pad * 4 + acc_rows * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wq, scale, zs, xa_p, b)
    if meff == 1:
        return jnp.sum(out, axis=0, keepdims=True)[:, :n]
    return out[:m, :n]


def quant_matmul_pallas_a8_lora(
    x: Array, kqt: KernelQTensor, a: Array, b: Array,
    interpret: Optional[bool] = None,
) -> Array:
    """`x @ W_dq + (x @ a) @ b` with the base on the int8-operand decode path
    (w4a8) and the adapter fused into the SAME kernel (BASELINE config 4 on
    the 115-tok/s path; ≙ reference gemlite + merged adapters,
    `/root/reference/hqq/utils/patching.py:193-257`).

    a: [K, r], b: [r, N] with scaling folded into b. The adapter dot runs at
    full activation precision (xa is computed before int8 rounding); the
    weight-side base is exact, so only the base's activation quantization
    approximates. Falls back to the fused bf16-operand LoRA kernel for
    prefill M or non-class-replicable K."""
    if interpret is None:
        interpret = _auto_interpret()
    g = kqt.group_size
    k_arr = kqt.wq.shape[0] * kqt.r
    n_arr = kqt.wq.shape[1]
    k_logical, n = _logical_dims(kqt)

    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_logical)
    m = x2.shape[0]
    if m > 32 or kqt.nbits == 8 or k_arr % (8 * g) != 0:
        return quant_matmul_pallas_lora(x, kqt, a, b, interpret=interpret)

    x8, sx = quantize_activations_int8(x2)
    # full-precision rank-r partial, pre-divided by the activation scale so
    # the caller's single `· sx` restores base·sx + (x@A)@B
    xa = (x2.astype(jnp.float32) @ a.astype(jnp.float32)) / sx
    if k_arr != k_logical:
        x8 = jnp.pad(x8, ((0, 0), (0, k_arr - k_logical)))
    r_pad = _round_up(a.shape[1], 128)
    b_p = jnp.zeros((r_pad, n_arr), jnp.float32).at[: b.shape[0], : b.shape[1]].set(
        b.astype(jnp.float32)
    )
    xa_p = jnp.zeros((m, r_pad), jnp.float32).at[:, : a.shape[1]].set(xa)

    common = dict(
        container_bits=kqt.container_bits, group_size=g,
        k=k_arr, n=n, interpret=interpret, bc4=kqt.bc4,
    )
    if m == 1 and k_arr % (8 * g) == 0:
        s, split, tn = _a8_decode_plan(k_arr, n_arr, g, kqt.container_bits,
                                       kqt.bc4)
        if s >= 16:
            out = _qmm_a8_lora_decode_call(
                x8, kqt.wq, kqt.scale, kqt.zs, xa_p, b_p, s=s, meff=1,
                split=split, tn=tn, **common
            )
        else:
            out = _qmm_a8_lora_decode_call(
                x8, kqt.wq, kqt.scale, kqt.zs, xa_p, b_p, s=8, meff=8,
                split=split, tn=tn, **common
            )
    else:
        out = _qmm_a8_lora_decode_call(
            x8, kqt.wq, kqt.scale, kqt.zs, xa_p, b_p, s=8,
            meff=_round_up(m, 8), **common
        )
    out = (out * sx).astype(x.dtype)
    return out.reshape(*lead, n)


def quant_matmul_pallas_lora(
    x: Array, kqt: KernelQTensor, a: Array, b: Array,
    interpret: Optional[bool] = None,
) -> Array:
    """`x @ W_dq + (x @ a) @ b` in one fused kernel.

    a: [K, r] (K = kqt logical in-features), b: [r, N]. Scaling must already
    be folded into `b`. r is padded to 128 lanes internally.
    """
    if interpret is None:
        interpret = _auto_interpret()
    k_arr = kqt.wq.shape[0] * kqt.r
    n_arr = kqt.wq.shape[1]
    k_logical, n = _logical_dims(kqt)

    r_pad = _round_up(a.shape[1], 128)
    a_p = jnp.zeros((k_arr, r_pad), jnp.float32).at[: a.shape[0], : a.shape[1]].set(
        a.astype(jnp.float32)
    )
    b_p = jnp.zeros((r_pad, n_arr), jnp.float32).at[: b.shape[0], : b.shape[1]].set(
        b.astype(jnp.float32)
    )

    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_logical)
    if k_arr != k_logical:
        x2 = jnp.pad(x2, ((0, 0), (0, k_arr - k_logical)))
    out = _qmm_lora_call(
        x2, kqt.wq, kqt.scale, kqt.zs, a_p, b_p,
        container_bits=kqt.container_bits, group_size=kqt.group_size,
        k=k_arr, n=n, interpret=interpret, bc4=kqt.bc4,
    )
    return out.reshape(*lead, n)
