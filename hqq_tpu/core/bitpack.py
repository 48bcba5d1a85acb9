# SPDX-License-Identifier: Apache-2.0
"""Bit-packing for quantized weights (TPU-native, pure JAX).

Packs integer codes of a 2-D "group-space" matrix into dense uint8 / int32
containers. The layout is *chunk-split along axis 0*: the matrix is split into
``r`` equal row-chunks (r = values per container word) and chunk ``k`` occupies
bitfield ``k`` (most-significant first). Unpacking is therefore a handful of
shift/mask ops followed by a single concatenate along axis 0 — no interleaving,
which maps cleanly onto the TPU VPU (sublane concat) and keeps lanes contiguous.

This container format is bit-compatible with the reference HQQ formats
(`/root/reference/hqq/core/bitpack.py:13-144`), so checkpoints round-trip
between the two frameworks:

    4bit_u8: 2 vals/byte,   p = W[:s]<<4 | W[s:]
    2bit_u8: 4 vals/byte,   bitfields 6,4,2,0
    1bit_u8: 8 vals/byte,   bitfields 7..0
    3bit_32: 10 vals/int32, rows zero-padded to a multiple of 10, bitfields 27..0
    8bit_u8: identity cast

All functions are pure and jittable; they operate on 2-D arrays
[rows, cols] and pack/unpack along axis 0.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = [
    "pack",
    "unpack",
    "packed_rows",
    "unpacked_rows",
    "PACKING_CONTAINER",
    "VALS_PER_WORD",
]

# packing name -> container dtype
PACKING_CONTAINER = {
    "8bit_u8": jnp.uint8,
    "4bit_u8": jnp.uint8,
    "3bit_32": jnp.int32,
    "2bit_u8": jnp.uint8,
    "1bit_u8": jnp.uint8,
}

# packing name -> number of values per container word
VALS_PER_WORD = {
    "8bit_u8": 1,
    "4bit_u8": 2,
    "3bit_32": 10,
    "2bit_u8": 4,
    "1bit_u8": 8,
}

# packing name -> bits per bitfield
_FIELD_BITS = {
    "8bit_u8": 8,
    "4bit_u8": 4,
    "3bit_32": 3,
    "2bit_u8": 2,
    "1bit_u8": 1,
}


def packed_rows(n_rows: int, packing: str) -> int:
    """Number of container rows used to store ``n_rows`` unpacked rows."""
    r = VALS_PER_WORD[packing]
    return -(-n_rows // r)  # ceil-div (3-bit pads, others divide exactly)


def unpacked_rows(n_packed_rows: int, packing: str) -> int:
    """Number of rows produced by ``unpack`` (includes 3-bit padding)."""
    return n_packed_rows * VALS_PER_WORD[packing]


def _pack_chunked(w_q: Array, packing: str) -> Array:
    """Split rows into r chunks; chunk k goes to bitfield k (MSB first)."""
    r = VALS_PER_WORD[packing]
    bits = _FIELD_BITS[packing]
    container = PACKING_CONTAINER[packing]

    n = w_q.shape[0]
    pad = (-n) % r
    if pad:
        w_q = jnp.concatenate(
            [w_q, jnp.zeros((pad,) + w_q.shape[1:], dtype=w_q.dtype)], axis=0
        )
    step = w_q.shape[0] // r
    w_q = w_q.astype(container)
    out = w_q[:step] << (bits * (r - 1))
    for k in range(1, r):
        out = out | (w_q[k * step : (k + 1) * step] << (bits * (r - 1 - k)))
    return out


def _unpack_chunked(p: Array, packing: str, dtype) -> Array:
    """Inverse of `_pack_chunked`; output has packed_rows*r rows (incl. pad)."""
    r = VALS_PER_WORD[packing]
    bits = _FIELD_BITS[packing]
    mask = (1 << bits) - 1
    chunks = [((p >> (bits * (r - 1 - k))) & mask) for k in range(r)]
    return jnp.concatenate(chunks, axis=0).astype(dtype)


def pack(w_q: Array, packing: str, blocks: int = 1) -> Array:
    """Pack integer codes (2-D, values in [0, 2^nbits)) along axis 0.

    blocks > 1 chunk-splits each of ``blocks`` contiguous row-blocks
    independently (BLOCK-LOCAL packing): a dim-0 slice at a block boundary
    is then a self-contained packed matrix — what makes packed weights
    column-shardable under GSPMD (`parallel/sharding.py`). blocks=1 is the
    reference-compatible layout."""
    if packing == "8bit_u8":
        return w_q.astype(jnp.uint8)
    if blocks == 1:
        return _pack_chunked(w_q, packing)
    n = w_q.shape[0]
    r = VALS_PER_WORD[packing]
    assert n % (blocks * r) == 0, (n, blocks, r)
    cols = w_q.shape[1:]
    w4 = w_q.reshape(blocks, n // blocks, *cols)
    bits = _FIELD_BITS[packing]
    container = PACKING_CONTAINER[packing]
    step = (n // blocks) // r
    w4 = w4.astype(container)
    out = w4[:, :step] << (bits * (r - 1))
    for k in range(1, r):
        out = out | (w4[:, k * step : (k + 1) * step] << (bits * (r - 1 - k)))
    return out.reshape(n // r, *cols)


def unpack(p: Array, packing: str, dtype=jnp.uint8, blocks: int = 1) -> Array:
    """Unpack along axis 0 into ``dtype``. 3-bit output keeps zero-padding
    rows; callers truncate to the logical row count (see
    `hqq_tpu.core.quantize.dequantize`)."""
    if packing == "8bit_u8":
        return p.astype(dtype)
    if blocks == 1:
        return _unpack_chunked(p, packing, dtype)
    r = VALS_PER_WORD[packing]
    bits = _FIELD_BITS[packing]
    mask = (1 << bits) - 1
    n_p = p.shape[0]
    assert n_p % blocks == 0
    p4 = p.reshape(blocks, n_p // blocks, *p.shape[1:])
    chunks = [((p4 >> (bits * (r - 1 - k))) & mask) for k in range(r)]
    out = jnp.concatenate(chunks, axis=1).astype(dtype)
    return out.reshape(n_p * r, *p.shape[1:])


def pack_host(w_q, packing: str):
    """Host-side pack of a numpy code matrix, using the native C++ library
    when available (multithreaded, checkpoint-I/O speed), else the JAX path.
    Bit-identical to `pack`."""
    import numpy as np

    from . import _native

    w_np = np.asarray(w_q)
    out = _native.pack_np(w_np, packing)
    if out is not None:
        return out
    return np.asarray(pack(jnp.asarray(w_np.astype(np.int32)), packing))


def unpack_host(p, packing: str):
    """Host-side unpack (native C++ when available); includes 3-bit padding
    rows like `unpack`."""
    import numpy as np

    from . import _native

    p_np = np.asarray(p)
    out = _native.unpack_np(p_np, packing)
    if out is not None:
        return out
    return np.asarray(unpack(jnp.asarray(p_np), packing, jnp.int32))
