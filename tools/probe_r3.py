# SPDX-License-Identifier: Apache-2.0
"""Round-3 TPU probes: Mosaic capabilities needed by the axis=0 kernels.

Run: PYTHONPATH=.:/root/.axon_site python tools/probe_r3.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        print(f"[ok]   {name}: {out}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return False


def main():
    print("backend:", jax.default_backend(), jax.devices())

    def int4_probe():
        x = jnp.arange(16, dtype=jnp.int4).reshape(4, 4)
        y = jax.jit(lambda a: (a.astype(jnp.int8) * 2).sum())(x)
        return np.asarray(y)


    def int4_dot():
        a = jnp.ones((8, 128), jnp.int4)
        b = jnp.ones((128, 128), jnp.int4)
        y = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))(a, b)
        return np.asarray(y)[0, 0]


    # 2. sublane repeat inside a Pallas kernel (axis=0 bf16 kernel needs it)
    def subl_repeat():
        def kern(s_ref, o_ref):
            s = s_ref[:]  # [8, 128]
            o_ref[:] = jnp.repeat(s, 8, axis=0)  # -> [64, 128]

        s = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        )(s)
        ref = np.repeat(np.asarray(s), 8, axis=0)
        assert np.array_equal(np.asarray(out), ref)
        return "elementwise-repeat ok"

    probe("pallas sublane jnp.repeat", subl_repeat)

    # 2b. sublane broadcast-reshape variant
    def subl_bcast():
        def kern(s_ref, o_ref):
            s = s_ref[:]  # [8, 128]
            s3 = jnp.broadcast_to(s[:, None, :], (8, 8, 128))
            o_ref[:] = s3.reshape(64, 128)

        s = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32)
        )(s)
        ref = np.repeat(np.asarray(s), 8, axis=0)
        assert np.array_equal(np.asarray(out), ref)
        return "broadcast-reshape ok"

    probe("pallas sublane broadcast+reshape", subl_bcast)

    # 3. lane repeat (elementwise) inside a kernel
    def lane_repeat():
        def kern(s_ref, o_ref):
            s = s_ref[:]  # [8, 128]
            o_ref[:] = jnp.repeat(s, 4, axis=1)  # -> [8, 512]

        s = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32)
        )(s)
        ref = np.repeat(np.asarray(s), 4, axis=1)
        assert np.array_equal(np.asarray(out), ref)
        return "elementwise lane repeat ok"

    probe("pallas lane jnp.repeat", lane_repeat)

    # 4. transpose f32 inside kernel
    def kern_transpose():
        def kern(s_ref, o_ref):
            o_ref[:] = s_ref[:].T

        s = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32)
        )(s)
        assert np.array_equal(np.asarray(out), np.asarray(s).T)
        return "ok"

    probe("pallas f32 transpose", kern_transpose)

    # 5. int8 dot with narrow rhs lanes (32) — axis=0 a8 slab design
    def narrow_rhs():
        def kern(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        a = jnp.ones((256, 512), jnp.int8)
        b = jnp.ones((512, 32), jnp.int8)
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((256, 32), jnp.int32)
        )(a, b)
        assert int(np.asarray(out)[0, 0]) == 512
        return "ok"

    probe("pallas int8 dot rhs-lanes=32", narrow_rhs)

    # 6. small-sublane int8 lhs block (8 rows) in a grid
    def small_sublane_block():
        def kern(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        a = jnp.ones((32, 512), jnp.int8)  # block (8, 512)
        b = jnp.ones((512, 256), jnp.int8)
        out = pl.pallas_call(
            kern,
            grid=(4,),
            in_specs=[
                pl.BlockSpec((8, 512), lambda i: (i, 0)),
                pl.BlockSpec((512, 256), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((8, 256), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((32, 256), jnp.int32),
        )(a, b)
        assert int(np.asarray(out)[0, 0]) == 512
        return "ok"

    probe("pallas int8 8-sublane lhs block", small_sublane_block)

    # LAST: jnp.int4 retest (known to hang/crash on axon — keep after the
    # capability probes so a hang doesn't mask them)
    probe("jnp.int4 basic", int4_probe)
    probe("jnp.int4 dot", int4_dot)


if __name__ == "__main__":
    main()
