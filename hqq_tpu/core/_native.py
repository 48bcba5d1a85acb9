# SPDX-License-Identifier: Apache-2.0
"""ctypes bindings for the native host-side pack/unpack library.

Builds `csrc/libhqqpack.so` on first use (cached) and exposes
numpy-array pack/unpack that bit-match `hqq_tpu.core.bitpack`. Falls back to
None when no C++ toolchain is available — callers must keep a pure-JAX path
(same graceful-degradation contract as the reference's optional hqq_aten
extension, `/root/reference/hqq/core/quantize.py:251-267`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CSRC = os.path.join(_REPO_ROOT, "csrc")
_LIB_PATH = os.path.join(_CSRC, "libhqqpack.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _CSRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        u8 = ctypes.POINTER(ctypes.c_uint8)
        i32 = ctypes.POINTER(ctypes.c_int32)
        f32 = ctypes.POINTER(ctypes.c_float)
        i64 = ctypes.c_int64
        ci = ctypes.c_int
        lib.hqq_pack_u8.argtypes = [u8, u8, i64, i64, ci, ci]
        lib.hqq_unpack_u8.argtypes = [u8, u8, i64, i64, ci, ci]
        lib.hqq_pack_3bit_i32.argtypes = [i32, i32, i64, i64, ci]
        lib.hqq_unpack_3bit_i32.argtypes = [i32, i32, i64, i64, ci]
        lib.hqq_dequant_f32.argtypes = [u8, f32, f32, f32, i64, i64, ci, ci]
        lib.hqq_pack_version.restype = ci
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


_BITS = {"8bit_u8": 8, "4bit_u8": 4, "2bit_u8": 2, "1bit_u8": 1}


def pack_np(w: np.ndarray, packing: str, threads: int = 0) -> Optional[np.ndarray]:
    """Native pack of a 2-D uint8/int32 code matrix; None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    w = np.ascontiguousarray(w)
    rows, cols = w.shape
    if packing == "3bit_32":
        rows_padded = -(-rows // 10) * 10
        wp = np.zeros((rows_padded, cols), np.int32)
        wp[:rows] = w
        out = np.empty((rows_padded // 10, cols), np.int32)
        lib.hqq_pack_3bit_i32(
            wp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rows_padded, cols, threads,
        )
        return out
    bits = _BITS[packing]
    if bits == 8:
        return w.astype(np.uint8)
    w8 = w.astype(np.uint8)
    r = 8 // bits
    out = np.empty((rows // r, cols), np.uint8)
    lib.hqq_pack_u8(
        w8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows, cols, bits, threads,
    )
    return out


def unpack_np(p: np.ndarray, packing: str, threads: int = 0) -> Optional[np.ndarray]:
    """Native unpack; output includes 3-bit padding rows (like bitpack.unpack)."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(p)
    rows_packed, cols = p.shape
    if packing == "3bit_32":
        out = np.empty((rows_packed * 10, cols), np.int32)
        lib.hqq_unpack_3bit_i32(
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rows_packed, cols, threads,
        )
        return out
    bits = _BITS[packing]
    if bits == 8:
        return p.astype(np.uint8)
    r = 8 // bits
    out = np.empty((rows_packed * r, cols), np.uint8)
    lib.hqq_unpack_u8(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows_packed, cols, bits, threads,
    )
    return out


def dequant_np(
    packed: np.ndarray, scale: np.ndarray, zero: np.ndarray, packing: str,
    threads: int = 0,
) -> Optional[np.ndarray]:
    """Native fused dequant (group-space, per-row scale/zero) to float32."""
    lib = get_lib()
    if lib is None or packing not in _BITS:
        return None
    packed = np.ascontiguousarray(packed)
    rows_packed, cols = packed.shape
    bits = _BITS[packing]
    r = 8 // bits
    rows = rows_packed * r
    scale = np.ascontiguousarray(np.broadcast_to(scale.reshape(-1), (rows,)), np.float32)
    zero = np.ascontiguousarray(np.broadcast_to(zero.reshape(-1), (rows,)), np.float32)
    out = np.empty((rows, cols), np.float32)
    lib.hqq_dequant_f32(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        zero.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows_packed, cols, bits, threads,
    )
    return out
