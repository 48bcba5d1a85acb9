# SPDX-License-Identifier: Apache-2.0
"""Probe Mosaic primitives needed by the w4a8 pipelined-unpack experiments:

1. pltpu.bitcast int8 <-> int32 in-kernel (shape semantics + roundtrip),
2. int32-lane nibble extraction equivalence with the per-byte unpack,
3. dynamic leading-index scratch access (double-buffer slot selection),
4. jnp.int4 on axon (standing CLAUDE.md retest item).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_bitcast.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_bitcast():
    def kern(p_ref, c0_ref, c1_ref):
        q32 = pltpu.bitcast(p_ref[:], jnp.int32)
        m = jnp.int32(0x0F0F0F0F)
        c0 = pltpu.bitcast((q32 >> 4) & m, jnp.int8)
        c1 = pltpu.bitcast(q32 & m, jnp.int8)
        c0_ref[:] = c0
        c1_ref[:] = c1

    p = np.random.randint(0, 256, size=(256, 512), dtype=np.uint8)
    try:
        c0, c1 = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct(p.shape, jnp.int8),
                jax.ShapeDtypeStruct(p.shape, jnp.int8),
            ),
        )(jnp.asarray(p.view(np.int8)))
        c0, c1 = np.asarray(c0), np.asarray(c1)
        ok0 = np.array_equal(c0, (p >> 4).astype(np.int8))
        ok1 = np.array_equal(c1, (p & 0xF).astype(np.int8))
        print(f"bitcast nibble extraction: c0 {'OK' if ok0 else 'MISMATCH'}, c1 {'OK' if ok1 else 'MISMATCH'}")
        if not (ok0 and ok1):
            print("  c0 sample exp", (p >> 4)[:2, :8], "got", c0[:2, :8])
    except Exception as e:
        print(f"bitcast int8<->int32 FAILED: {type(e).__name__}: {str(e)[:300]}")


def probe_dynamic_scratch():
    def kern(x_ref, o_ref, scr):
        kidx = pl.program_id(0)
        slot = kidx % 2
        scr[slot] = x_ref[:] * (kidx + 1).astype(jnp.float32)
        o_ref[:] = scr[slot]

    x = jnp.ones((8, 128), jnp.float32)
    try:
        o = pl.pallas_call(
            kern,
            grid=(4,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, 8, 128), jnp.float32)],
        )(x)
        print(f"dynamic scratch slot: OK (out[0,0]={float(o[0,0])}, expect 4.0)")
    except Exception as e:
        print(f"dynamic scratch slot FAILED: {type(e).__name__}: {str(e)[:300]}")


def probe_int4():
    try:
        a = jnp.arange(16, dtype=jnp.int4).reshape(4, 4)
        b = jnp.ones((4, 4), jnp.int4)
        out = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        print(f"jnp.int4 dot: OK {np.asarray(out)[0]}")
    except Exception as e:
        print(f"jnp.int4 FAILED: {type(e).__name__}: {str(e)[:200]}")


def probe_nondivisible_block():
    # can a block shape not divide the array dim (ragged last tile)?
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((8, 384), jnp.float32)  # 384 = 3*128, block 256 doesn't divide
    try:
        o = pl.pallas_call(
            kern,
            grid=(2,),
            in_specs=[pl.BlockSpec((8, 256), lambda i: (0, i), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 256), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 384), jnp.float32),
        )(x)
        print(f"non-divisible block: OK (sum={float(o.sum())}, expect {8*384*2.0})")
    except Exception as e:
        print(f"non-divisible block FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    print(jax.devices())
    probe_bitcast()
    probe_dynamic_scratch()
    probe_int4()
    probe_nondivisible_block()
