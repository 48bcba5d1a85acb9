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
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quantize import QTensor, resolve_meta, unpack_codes

__all__ = ["KernelQTensor", "to_kernel_layout", "quant_matmul_pallas", "quant_matmul_pallas_lora", "dequant_pallas"]

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


def supports_kernel_layout(qt: QTensor) -> bool:
    """Whether this QTensor can be converted to the fused-kernel layout."""
    if qt.axis != 1 or not qt.channel_wise or qt.group_size is None:
        return False
    g = qt.group_size
    n_out, k = qt.shape  # original torch-convention [out, in]
    cb = _KERNEL_CONTAINER_BITS[qt.nbits]
    r = 8 // cb
    return k % g == 0 and g % r == 0 and g % 8 == 0


def to_kernel_layout(qt: QTensor, meta_dtype=jnp.float32) -> KernelQTensor:
    """Convert a canonical group-space `QTensor` (axis=1) to kernel layout.

    ≙ the repacking the reference backends do at `prepare_for_inference`
    time (`/root/reference/hqq/backends/torchao.py:201-241`,
    `backends/bitblas.py:60-116`) — a one-time, jit-free transformation.

    meta_dtype: storage dtype for scale/zs. fp32 (default) dequantizes with
    full precision. bf16 halves meta MEMORY (useful when squeezing a model
    onto a chip) but measured ~30% SLOWER decode on v5e — Mosaic's bf16
    broadcast-multiply path underperforms fp32 — so it is a footprint
    option, not a speed option.
    """
    assert supports_kernel_layout(qt), (
        "kernel layout requires axis=1 grouped quantization with "
        "group_size % (8/container_bits) == 0"
    )
    qt = resolve_meta(qt)  # fused kernels consume plain fp scale/zero
    n_out, k = qt.shape
    g = qt.group_size
    cb = _KERNEL_CONTAINER_BITS[qt.nbits]

    codes = unpack_codes(qt, jnp.int32)  # [N*K/g, g] group-space
    codes_kn = codes.reshape(n_out, k).T  # [K, N]
    scale_kn = qt.scale.reshape(n_out, k // g).T.astype(jnp.float32)  # [K/g, N]
    zero_kn = qt.zero.reshape(n_out, k // g).T.astype(jnp.float32)

    # Pad K to a multiple of 8*g so scale/zs tiles meet the TPU 8-sublane
    # rule for any K-tiling (padded rows dequantize to exactly 0: codes=0,
    # scale=0, zero=0 -> w = 0*0 - 0*0).
    k_pad = _round_up(k, 8 * g) if k > 8 * g else k
    if k_pad != k:
        codes_kn = jnp.pad(codes_kn, ((0, k_pad - k), (0, 0)))
        scale_kn = jnp.pad(scale_kn, ((0, (k_pad - k) // g), (0, 0)))
        zero_kn = jnp.pad(zero_kn, ((0, (k_pad - k) // g), (0, 0)))

    n_pad = _round_up(n_out, 128)
    if n_pad != n_out:
        codes_kn = jnp.pad(codes_kn, ((0, 0), (0, n_pad - n_out)))
        scale_kn = jnp.pad(scale_kn, ((0, 0), (0, n_pad - n_out)), constant_values=1.0)
        zero_kn = jnp.pad(zero_kn, ((0, 0), (0, n_pad - n_out)))

    wq = _pack_kernel_layout(codes_kn, g, cb)
    dtype = qt.compute_dtype
    return KernelQTensor(
        wq=wq,
        scale=scale_kn.astype(meta_dtype),
        zs=(zero_kn * scale_kn).astype(meta_dtype),
        nbits=qt.nbits,
        container_bits=cb,
        group_size=g,
        shape=(k, n_out),
        compute_dtype=dtype,
    )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _unpack_tile(p: Array, g: int, container_bits: int, tn: int) -> Array:
    """Unpack a packed tile [TK//r, TN] -> 3-D codes [TK//g, g, TN] (int32).

    Works in int32: Mosaic has no uint8->float cast, and int32 shifts/masks
    lower to native VPU ops."""
    r = 8 // container_bits
    mask = (1 << container_bits) - 1
    tkr, _ = p.shape
    n_groups = tkr * r // g
    p3 = p.reshape(n_groups, g // r, tn).astype(jnp.int32)
    if r == 1:
        return p3
    chunks = [
        (p3 >> (container_bits * (r - 1 - j))) & mask for j in range(r)
    ]
    return jnp.concatenate(chunks, axis=1)  # [n_groups, g, TN]


def _qmm_kernel(x_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, *, g, cb, out_dtype):
    """One (TM, TN) output tile, accumulating over the K grid dimension."""
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tn = wq_ref.shape[-1]
    c3 = _unpack_tile(wq_ref[:], g, cb, tn)  # [TK//g, g, TN] uint8
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
    static_argnames=("nbits", "container_bits", "group_size", "k", "n", "interpret"),
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
        functools.partial(_qmm_kernel, g=g, cb=cb, out_dtype=x.dtype),
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
    x: Array, kqt: KernelQTensor, interpret: Optional[bool] = None
) -> Array:
    """`x @ W_dq` for a kernel-layout quantized weight.

    x: [..., K]  ->  [..., N] in x's dtype (accumulation in fp32).
    """
    if interpret is None:
        interpret = _auto_interpret()
    # Derive dims from the arrays, not the static metadata: inside shard_map
    # the struct carries its global `shape` but the arrays are local shards.
    # K may also be storage-padded (to a multiple of 8*g) by to_kernel_layout.
    g = kqt.group_size
    k_arr = kqt.wq.shape[0] * kqt.r  # storage K (incl. padding)
    n_arr = kqt.wq.shape[1]  # storage N (incl. padding)
    k_store_global = _round_up(kqt.k, 8 * g) if kqt.k > 8 * g else kqt.k
    is_global = k_arr == k_store_global and n_arr == _round_up(kqt.n, 128)
    k_logical = kqt.k if is_global else k_arr
    n = kqt.n if is_global else n_arr

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
    )
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# Standalone dequantization kernel (≙ reference `hqq_aten.dequantize`)
# ---------------------------------------------------------------------------


def _dq_kernel(wq_ref, scale_ref, zs_ref, out_ref, *, g, cb):
    tn = wq_ref.shape[-1]
    c3 = _unpack_tile(wq_ref[:], g, cb, tn)
    w3 = c3.astype(scale_ref.dtype) * scale_ref[:][:, None, :] - zs_ref[:][:, None, :]
    out_ref[:] = w3.reshape(out_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("container_bits", "group_size", "k", "n", "interpret")
)
def _dq_call(wq, scale, zs, *, container_bits, group_size, k, n, interpret=False):
    g, cb = group_size, container_bits
    r = 8 // cb
    n_pad = wq.shape[1]
    tn = min(n_pad, 512)
    while n_pad % tn:
        tn //= 2
    tk = _pick_tile_k(k, g, target=1024)
    grid = (k // tk, n_pad // tn)
    out = pl.pallas_call(
        functools.partial(_dq_kernel, g=g, cb=cb),
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


def dequant_pallas(kqt: KernelQTensor, interpret: Optional[bool] = None) -> Array:
    """Dequantize a kernel-layout weight to W^T [K, N] via a Pallas kernel."""
    if interpret is None:
        interpret = _auto_interpret()
    g = kqt.group_size
    k_arr = kqt.wq.shape[0] * kqt.r
    n_arr = kqt.wq.shape[1]
    k_store_global = _round_up(kqt.k, 8 * g) if kqt.k > 8 * g else kqt.k
    is_global = k_arr == k_store_global and n_arr == _round_up(kqt.n, 128)
    k_logical = kqt.k if is_global else k_arr
    n = kqt.n if is_global else n_arr
    out = _dq_call(
        kqt.wq,
        kqt.scale,
        kqt.zs,
        container_bits=kqt.container_bits,
        group_size=kqt.group_size,
        k=k_arr,
        n=n,
        interpret=interpret,
    )
    return out[:k_logical]


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
    *, g, cb, out_dtype
):
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        p_ref[:] = jnp.zeros_like(p_ref)

    tn = wq_ref.shape[-1]
    c3 = _unpack_tile(wq_ref[:], g, cb, tn)
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
    static_argnames=("container_bits", "group_size", "k", "n", "interpret"),
)
def _qmm_lora_call(
    x, wq, scale, zs, a, b, *, container_bits, group_size, k, n, interpret=False
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
        functools.partial(_qmm_lora_kernel, g=g, cb=cb, out_dtype=x.dtype),
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
    g = kqt.group_size
    k_arr = kqt.wq.shape[0] * kqt.r
    n_arr = kqt.wq.shape[1]
    k_store_global = _round_up(kqt.k, 8 * g) if kqt.k > 8 * g else kqt.k
    is_global = k_arr == k_store_global and n_arr == _round_up(kqt.n, 128)
    k_logical = kqt.k if is_global else k_arr
    n = kqt.n if is_global else n_arr

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
        k=k_arr, n=n, interpret=interpret,
    )
    return out.reshape(*lead, n)
