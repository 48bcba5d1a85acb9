# SPDX-License-Identifier: Apache-2.0
"""Pack/unpack roundtrip tests (≙ reference `tests/test_bitpack.py`): random
codes in [0, 2^n) over many shapes, exact equality after roundtrip; 3-bit
compares the unpadded prefix. Plus bit-compatibility vs the reference torch
implementation when it is importable."""

import numpy as np
import pytest
import jax.numpy as jnp

from hqq_tpu.core import bitpack

SHAPES = [
    (8, 8),
    (16, 16),
    (32, 32),
    (64, 64),
    (128, 128),
    (256, 256),
    (80, 32),
    (40, 128),
    (120, 16),
    (960, 64),
    (1024, 96),
]

PACKINGS = {
    "8bit_u8": 8,
    "4bit_u8": 4,
    "3bit_32": 3,
    "2bit_u8": 2,
    "1bit_u8": 1,
}


@pytest.mark.parametrize("packing,nbits", PACKINGS.items())
@pytest.mark.parametrize("shape", SHAPES)
def test_roundtrip(packing, nbits, shape, rng):
    if packing == "3bit_32" and shape[0] % 10 == 0:
        pass  # exercised below via padding anyway
    w = rng.integers(0, 2**nbits, size=shape).astype(np.int32)
    p = bitpack.pack(jnp.asarray(w), packing)
    assert p.dtype == bitpack.PACKING_CONTAINER[packing]
    u = np.asarray(bitpack.unpack(p, packing, jnp.int32))
    assert np.array_equal(u[: shape[0]], w)
    # padding rows (3-bit) must be zero
    assert np.array_equal(u[shape[0]:], np.zeros_like(u[shape[0]:]))


@pytest.mark.parametrize("packing", ["4bit_u8", "2bit_u8", "1bit_u8"])
def test_packed_size(packing, rng):
    r = bitpack.VALS_PER_WORD[packing]
    w = rng.integers(0, 2, size=(r * 16, 32)).astype(np.int32)
    p = bitpack.pack(jnp.asarray(w), packing)
    assert p.shape == (16, 32)


def _reference_bitpack():
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from hqq.core.bitpack import BitPack  # type: ignore

        return BitPack
    except Exception:
        return None
    finally:
        sys.path.pop(0)


@pytest.mark.parametrize("packing,nbits", PACKINGS.items())
def test_reference_bit_compat(packing, nbits, rng):
    """Container format is bit-identical to the reference, so checkpoints
    round-trip between frameworks."""
    torch = pytest.importorskip("torch")
    BitPack = _reference_bitpack()
    if BitPack is None:
        pytest.skip("reference hqq not importable")
    fn = {
        "8bit_u8": BitPack.pack_8bit_u8,
        "4bit_u8": BitPack.pack_4bit_u8,
        "3bit_32": BitPack.pack_3bit_32,
        "2bit_u8": BitPack.pack_2bit_u8,
        "1bit_u8": BitPack.pack_1bit_u8,
    }[packing]
    w = rng.integers(0, 2**nbits, size=(160, 64)).astype(np.int32)
    ours = np.asarray(bitpack.pack(jnp.asarray(w), packing))
    theirs = fn(torch.from_numpy(w)).numpy()
    assert ours.dtype == theirs.dtype
    assert np.array_equal(ours.astype(np.int64), theirs.astype(np.int64))
