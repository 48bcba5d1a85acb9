# SPDX-License-Identifier: Apache-2.0
"""Core HQQ quantizer — pure-functional, TPU-native.

A quantized weight is an immutable pytree (`QTensor`) holding bit-packed
integer codes plus per-group scale/zero-point; quantization and
dequantization are pure, jittable functions. This replaces the reference's
mutable `Quantizer` classmethods + meta dict
(`/root/reference/hqq/core/quantize.py:36-248`) with a functional design that
composes with `jax.jit` / `vmap` / `pjit`.

Math (affine, asymmetric, per-group; reference `core/quantize.py:102-180`):

    W grouped along axis: [-1, g] (axis=1) or [g, -1] (axis=0)
    s_inv = (2^n - 1) / (max - min)       # guarded & clamped
    zero  = -min * s_inv                   # optionally rounded (nbits==4)
    W_q   = round(W * s_inv + zero).clip(0, 2^n - 1)   # optionally HQQ-optimized
    stored scale = 1 / s_inv               # dequant is a multiply
    dequant: (W_q - zero) * scale, reshaped to the original shape
"""

from __future__ import annotations

import dataclasses
import functools
import warnings
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import Array

from . import bitpack
from .optimize import optimize_weights_proximal

__all__ = [
    "QTensor",
    "Quantizer",
    "HQQBackend",
    "quantize",
    "dequantize",
    "resolve_meta",
    "BaseQuantizeConfig",
    "SUPPORTED_BITS",
    "BIT_TO_PACKING",
]

SUPPORTED_BITS = (8, 6, 5, 4, 3, 2, 1.58, 1)

# Sub-byte widths without a dedicated container are stored in the next
# available container (6/5 -> 8-bit, 1.58 -> 2-bit), matching the reference
# (`core/quantize.py:40-49`).
BIT_TO_PACKING = {
    8: "8bit_u8",
    6: "8bit_u8",
    5: "8bit_u8",
    4: "4bit_u8",
    3: "3bit_32",
    2: "2bit_u8",
    1.58: "2bit_u8",
    1: "1bit_u8",
}


def _canon_bits(nbits) -> float:
    """Normalize an nbits value (int or float) to the canonical key."""
    for b in SUPPORTED_BITS:
        if float(nbits) == float(b):
            return b
    raise ValueError(f"nbits={nbits} not supported; choose from {SUPPORTED_BITS}")


@struct.dataclass
class QTensor:
    """Bit-packed quantized tensor (a pytree; static metadata is hashable).

    Arrays live in "group space": ``wq`` is the packed code matrix of the
    grouped weight ([num_groups, g] for axis=1 / [g, num_groups] for axis=0),
    and ``scale``/``zero`` broadcast against the *unpacked* grouped matrix.
    """

    wq: Array  # packed codes (uint8 / int32), or raw codes if packing is None
    scale: Array  # dequant scale (multiplicative), group-space broadcast shape
    zero: Array  # zero-point, same shape as scale

    nbits: float = struct.field(pytree_node=False, default=4)
    group_size: Optional[int] = struct.field(pytree_node=False, default=64)
    axis: int = struct.field(pytree_node=False, default=1)
    shape: tuple = struct.field(pytree_node=False, default=())
    packing: Optional[str] = struct.field(pytree_node=False, default="4bit_u8")
    compute_dtype: Any = struct.field(pytree_node=False, default=jnp.bfloat16)
    channel_wise: bool = struct.field(pytree_node=False, default=True)
    # >1: wq packed block-locally (`bitpack.pack(blocks=...)`) so contiguous
    # dim-0 shards decode independently — set by `regroup_packed` for GSPMD
    # column sharding. 1 = reference-compatible layout.
    pack_blocks: int = struct.field(pytree_node=False, default=1)

    @property
    def out_features(self) -> int:
        return self.shape[0]

    @property
    def in_features(self) -> int:
        return self.shape[1]

    @property
    def nbytes(self) -> int:
        def nb(a):
            if isinstance(a, QTensor):
                return a.nbytes
            return int(np.prod(a.shape)) * a.dtype.itemsize

        return nb(self.wq) + nb(self.scale) + nb(self.zero)

    @property
    def is_meta_quantized(self) -> bool:
        """True when scale and/or zero are themselves quantized (nested
        QTensor) — ≙ reference `quant_scale`/`quant_zero`
        (`/root/reference/hqq/core/quantize.py:808-828`)."""
        return isinstance(self.scale, QTensor) or isinstance(self.zero, QTensor)

    def dequantize(self, dtype=None) -> Array:
        return dequantize(self, dtype=dtype)

    def astype(self, compute_dtype) -> "QTensor":
        return dataclasses.replace(self, compute_dtype=compute_dtype)


def _grouped_view(w: Array, group_size: Optional[int], channel_wise: bool, axis: int):
    """Reshape to group space (reference `core/quantize.py:105-111`)."""
    if group_size is not None and channel_wise:
        return w.reshape(-1, group_size) if axis == 1 else w.reshape(group_size, -1)
    return w


@functools.partial(
    jax.jit,
    static_argnames=(
        "nbits",
        "channel_wise",
        "group_size",
        "optimize",
        "round_zero",
        "axis",
        "bitpack_weights",
        "meta_dtype",
        "lp_norm",
        "beta",
        "kappa",
        "iters",
    ),
)
def _quantize_impl(
    w: Array,
    *,
    nbits: float,
    channel_wise: bool,
    group_size: Optional[int],
    optimize: bool,
    round_zero: bool,
    axis: int,
    bitpack_weights: bool,
    meta_dtype,
    lp_norm: float,
    beta: float,
    kappa: float,
    iters: int,
):
    """Single fused quantization graph: grouping, min/max, scale/zero init,
    proximal solve, and bit-packing all stay on-device in one XLA program."""
    w_f = _grouped_view(w.astype(jnp.float32), group_size, channel_wise, axis)

    max_v = float(round(2**nbits - 1))
    min_v = 0.0

    if not channel_wise:
        _min = w_f.min().reshape(1, 1)
        _max = w_f.max().reshape(1, 1)
        optimize = False
    else:
        _min = w_f.min(axis=axis, keepdims=True)
        _max = w_f.max(axis=axis, keepdims=True)

    denom = _max - _min
    scale = max_v / denom
    scale = jnp.where(jnp.abs(denom) <= 1e-4, jnp.ones_like(scale), scale)
    scale = jnp.clip(scale, max=2e4)  # half-precision safety (ref :129)
    zero = -_min * scale

    if round_zero:
        zero = jnp.round(zero)

    if optimize:
        w_q, scale, zero = optimize_weights_proximal(
            w_f,
            scale,
            zero,
            (min_v, max_v),
            axis=axis,
            opt_params=dict(lp_norm=lp_norm, beta=beta, kappa=kappa, iters=iters),
        )
    else:
        w_q = jnp.clip(jnp.round(w_f * scale + zero), min_v, max_v)

    # Store the inverse so dequantization is a fused multiply (ref :154).
    scale = (1.0 / scale).astype(meta_dtype)
    zero = zero.astype(meta_dtype)

    if bitpack_weights:
        wq = bitpack.pack(w_q.astype(jnp.int32), BIT_TO_PACKING[nbits])
    else:
        wq = w_q
    return wq, scale, zero


def quantize(
    w: Array,
    nbits: float = 4,
    channel_wise: bool = True,
    group_size: Optional[int] = 64,
    optimize: bool = True,
    round_zero: bool = False,
    axis: int = 1,
    bitpack_weights: bool = True,
    compute_dtype=jnp.bfloat16,
    meta_dtype=jnp.float32,
    opt_params: Optional[dict] = None,
    scale_quant_params: Optional[dict] = None,
    zero_quant_params: Optional[dict] = None,
) -> QTensor:
    """Quantize a 2-D weight matrix to an HQQ `QTensor`.

    Mirrors `Quantizer.quantize` (`/root/reference/hqq/core/quantize.py:75-180`)
    with the scale guard (denominator <= 1e-4 -> scale 1.0) and the 2e4 clamp,
    but runs as ONE jitted XLA program per (shape, config) — grouping, solver
    and packing never leave the device.

    Args:
      meta_dtype: storage dtype for scale/zero. fp32 by default — on TPU the
        matmul runs in bf16 whose 8-bit mantissa would add avoidable error to
        the dequant affine if the meta were also bf16.
    """
    nbits = _canon_bits(nbits)
    assert axis in (0, 1), "axis must be 0 or 1"
    if group_size is not None:
        assert w.size % group_size == 0, (
            f"tensor size {w.shape} not divisible by group_size={group_size}"
        )

    shape = tuple(w.shape)
    p = dict(lp_norm=0.7, beta=1e1, kappa=1.01, iters=20, **(opt_params or {}))

    wq, scale, zero = _quantize_impl(
        jnp.asarray(w),
        nbits=nbits,
        channel_wise=channel_wise,
        group_size=group_size,
        optimize=optimize,
        round_zero=round_zero,
        axis=axis,
        bitpack_weights=bitpack_weights,
        meta_dtype=jnp.dtype(meta_dtype),
        lp_norm=float(p["lp_norm"]),
        beta=float(p["beta"]),
        kappa=float(p["kappa"]),
        iters=int(p["iters"]),
    )

    packing: Optional[str] = BIT_TO_PACKING[nbits]
    if not bitpack_weights:
        wq = wq.astype(compute_dtype)
        packing = None

    if zero_quant_params is not None:
        zero = _quantize_meta(zero, zero_quant_params)
    if scale_quant_params is not None:
        scale = _quantize_meta(scale, scale_quant_params)

    return QTensor(
        wq=wq,
        scale=scale,
        zero=zero,
        nbits=nbits,
        group_size=group_size,
        axis=axis,
        shape=shape,
        packing=packing,
        compute_dtype=compute_dtype,
        channel_wise=channel_wise,
    )


def _quantize_meta(arr: Array, params: dict) -> QTensor:
    """Quantize a scale/zero tensor itself (meta-quantization), ≙ reference
    `HQQLinear.quantize`'s `zero_q`/`scale_q` (`core/quantize.py:810-828`).
    Defaults mirror `hqq_base_quant_config` (`core/quantize.py:1102-1144`):
    8-bit, no solver, axis=0."""
    p = dict(
        nbits=8,
        channel_wise=True,
        group_size=128,
        optimize=False,
        round_zero=False,
        axis=0,
    )
    p.update(params or {})
    if p["group_size"] is not None and arr.size % p["group_size"] != 0:
        # Meta tensors can be small/odd-shaped; fall back to tensor-wise.
        p["channel_wise"] = False
        p["group_size"] = None
    return quantize(
        arr,
        nbits=p["nbits"],
        channel_wise=p["channel_wise"],
        group_size=p["group_size"],
        optimize=bool(p["optimize"]),
        round_zero=bool(p["round_zero"]),
        axis=p["axis"],
        compute_dtype=jnp.float32,
        meta_dtype=jnp.float32,
    )


def resolve_meta(qt: QTensor) -> QTensor:
    """Return an equivalent QTensor whose scale/zero are plain arrays
    (dequantizing nested meta-QTensors if present)."""
    if not qt.is_meta_quantized:
        return qt
    scale = qt.scale
    zero = qt.zero
    if isinstance(scale, QTensor):
        scale = dequantize(scale, jnp.float32)
    if isinstance(zero, QTensor):
        zero = dequantize(zero, jnp.float32)
    return dataclasses.replace(qt, scale=scale, zero=zero)


def _logical_rows(qt: QTensor) -> int:
    """Row count of the unpacked group-space matrix (pre-3-bit-padding)."""
    if qt.group_size is None or not qt.channel_wise:
        return qt.shape[0]
    if qt.axis == 0:
        return qt.group_size
    return int(np.prod(qt.shape)) // qt.group_size


def unpack_codes(qt: QTensor, dtype=jnp.float32) -> Array:
    """Unpack `wq` to integer codes in group space (padding removed)."""
    if qt.packing is None:
        return qt.wq.astype(dtype)
    w_r = bitpack.unpack(qt.wq, qt.packing, dtype, blocks=qt.pack_blocks)
    rows = _logical_rows(qt)
    if w_r.shape[0] != rows:  # 3-bit zero-padding (ref :190-195)
        w_r = w_r[:rows]
    return w_r


def regroup_packed(qt: QTensor, blocks: int) -> QTensor:
    """Repack `wq` block-locally into ``blocks`` contiguous row-blocks so a
    dim-0 (out-feature) shard is a self-contained packed matrix — the TPU
    equivalent of the reference's unpack→shard→repack loaders for vLLM TP
    ranks (`/root/reference/hqq/utils/vllm.py:119-150`), done once before
    `device_put`. Returns `qt` unchanged when the layout can't regroup
    (3-bit container, row count not divisible)."""
    if blocks <= 1 or qt.pack_blocks == blocks:
        return qt
    if qt.packing in (None, "8bit_u8"):  # identity containers shard as-is
        return dataclasses.replace(qt, pack_blocks=1)
    if qt.packing == "3bit_32":  # per-block padding would change row counts
        return qt
    r = bitpack.VALS_PER_WORD[qt.packing]
    rows = _logical_rows(qt)
    if rows % (blocks * r) != 0:
        return qt
    codes = unpack_codes(qt, jnp.int32)
    wq = bitpack.pack(codes, qt.packing, blocks=blocks)
    return dataclasses.replace(qt, wq=wq, pack_blocks=blocks)


def dequantize(qt: QTensor, dtype=None) -> Array:
    """(W_q - zero) * scale, reshaped to the original weight shape
    (≙ `Quantizer.dequantize`, `/root/reference/hqq/core/quantize.py:183-199`);
    meta-quantized scale/zero are dequantized on the fly."""
    qt = resolve_meta(qt)
    out_dtype = dtype if dtype is not None else qt.compute_dtype
    w_r = unpack_codes(qt, qt.scale.dtype)
    w_r = (w_r - qt.zero) * qt.scale
    return w_r.reshape(qt.shape).astype(out_dtype)


import enum


class HQQBackend(str, enum.Enum):
    """Inference backend selector (≙ reference `HQQBackend` enum,
    `/root/reference/hqq/core/quantize.py:269-285` — the torch variants
    PYTORCH/PYTORCH_COMPILE/ATEN collapse to these TPU implementations;
    all are backprop-capable through `dequant_matmul`'s custom VJP)."""

    XLA = "xla"          # dequant -> matmul, XLA-fused (≙ PYTORCH[_COMPILE])
    PALLAS = "pallas"    # fused in-register dequant+matmul (≙ ATEN/fused)
    INT8 = "int8"        # dynamic A8W8 on the MXU (≙ ATEN_FORWARD_INT8)


class Quantizer:
    """Namespace mirroring the reference `Quantizer` classmethod API
    (`/root/reference/hqq/core/quantize.py:36`) for familiarity; all methods
    are pure functions on `QTensor`."""

    SUPPORTED_BITS = SUPPORTED_BITS
    bit_to_packing = BIT_TO_PACKING
    quantize = staticmethod(quantize)
    dequantize = staticmethod(dequantize)
    unpack_codes = staticmethod(unpack_codes)


def BaseQuantizeConfig(
    nbits: float = 4,
    group_size: Optional[int] = 64,
    quant_zero: bool = False,
    quant_scale: bool = False,
    offload_meta: bool = False,
    view_as_float: bool = False,
    axis: int = 1,
    round_zero: Optional[bool] = None,
    optimize: bool = True,
    compute_dtype=jnp.bfloat16,
) -> dict:
    """Build a quant config dict (≙ `/root/reference/hqq/core/quantize.py:1076-1155`).

    `quant_zero`/`quant_scale` quantize the zero/scale tensors themselves to
    8-bit (deprecated in the reference but supported here for parity);
    `offload_meta` (pinned-host meta streaming) and `view_as_float` (a torch
    FSDP workaround) have no TPU analogue — packed arrays are first-class
    pytree leaves — and are accepted-and-ignored.
    """
    nbits = _canon_bits(nbits)
    if group_size is not None:
        assert group_size % 8 == 0, "group_size must be a multiple of 8 (or None)"
    if quant_zero or quant_scale:
        warnings.warn(
            "quant_zero/quant_scale (meta-quantization) are deprecated in "
            "reference HQQ; supported here for parity.",
            DeprecationWarning,
            stacklevel=2,
        )
    if offload_meta:
        warnings.warn("offload_meta has no effect on TPU; ignored.", stacklevel=2)

    weight_quant_params = {
        "nbits": nbits,
        "channel_wise": True,
        "group_size": group_size,
        "optimize": optimize,
        "round_zero": (nbits == 4) if round_zero is None else round_zero,
        "axis": axis,
        "compute_dtype": compute_dtype,
    }
    # Meta-quant parameterization mirrors `hqq_base_quant_config`
    # (ref `core/quantize.py:1122-1144`).
    scale_quant_params = (
        {"nbits": 8, "channel_wise": True, "group_size": 128, "optimize": False}
        if quant_scale
        else None
    )
    zero_quant_params = (
        {"nbits": 8, "channel_wise": False, "group_size": None, "optimize": False}
        if quant_zero
        else None
    )
    return {
        "weight_quant_params": weight_quant_params,
        "scale_quant_params": scale_quant_params,
        "zero_quant_params": zero_quant_params,
        "offload_meta": False,
    }
