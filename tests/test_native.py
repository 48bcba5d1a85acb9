# SPDX-License-Identifier: Apache-2.0
"""Native C++ pack/unpack library: bit-compat with the JAX bitpack and the
fused host dequant (≙ reference hqq_aten CPU fallback tests)."""

import numpy as np
import pytest
import jax.numpy as jnp

from hqq_tpu.core import bitpack
from hqq_tpu.core import _native


pytestmark = pytest.mark.skipif(
    not _native.available(), reason="C++ toolchain unavailable"
)

PACKINGS = {"8bit_u8": 8, "4bit_u8": 4, "3bit_32": 3, "2bit_u8": 2, "1bit_u8": 1}


@pytest.mark.parametrize("packing,nbits", PACKINGS.items())
def test_native_matches_jax(packing, nbits, rng):
    w = rng.integers(0, 2**nbits, size=(320, 64)).astype(
        np.int32 if packing == "3bit_32" else np.uint8
    )
    p_native = _native.pack_np(w, packing)
    p_jax = np.asarray(bitpack.pack(jnp.asarray(w.astype(np.int32)), packing))
    assert p_native.dtype == p_jax.dtype
    np.testing.assert_array_equal(p_native, p_jax)

    u_native = _native.unpack_np(p_native, packing)
    u_jax = np.asarray(bitpack.unpack(jnp.asarray(p_jax), packing, jnp.int32))
    np.testing.assert_array_equal(u_native.astype(np.int32), u_jax)


def test_native_dequant(rng):
    w = rng.integers(0, 16, size=(256, 64)).astype(np.uint8)
    p = _native.pack_np(w, "4bit_u8")
    scale = rng.standard_normal(256).astype(np.float32) * 0.1
    zero = rng.standard_normal(256).astype(np.float32)
    out = _native.dequant_np(p, scale, zero, "4bit_u8")
    expected = (w.astype(np.float32) - zero[:, None]) * scale[:, None]
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_native_threads(rng):
    w = rng.integers(0, 16, size=(4096, 512)).astype(np.uint8)
    a = _native.pack_np(w, "4bit_u8", threads=1)
    b = _native.pack_np(w, "4bit_u8", threads=8)
    np.testing.assert_array_equal(a, b)
