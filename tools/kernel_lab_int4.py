# SPDX-License-Identifier: Apache-2.0
"""Lab: int4 MXU operands for the w4a8 decode kernel.

jnp.int4 is broken at the XLA/axon boundary (RecursionError on any int4
array) but WORKS inside Pallas kernels (Mosaic) — retested r5. This lab
measures whether feeding the MXU int4 weight operands (via a zero-cost
`pltpu.bitcast(uint8 -> int4)` unpack of bitcast-ordered packed nibbles)
beats the int8-operand feed rate that currently floors every w4a8 shape
(~600-680 GB/s effective; BENCH_r04 byte roofline 42-52%).

Candidates at M=1-decode geometry (lhs [32, K] int8 class-replicated):
  int8dense : dense int8 rhs dot — the current ceiling
  a8prod    : production quant_matmul_pallas_a8 (chunk-split int8 unpack)
  int4рhs   : packed uint8 streamed, in-kernel bitcast to int4 rhs,
              int8 lhs x int4 rhs -> int32 dot
  int4both  : same rhs, lhs cast to int4 in-kernel

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab_int4.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hqq_tpu.utils.profiling import enable_compile_cache
from tools.bench_kernels import time_scan

enable_compile_cache()

HBM_BW = 819e9


def _int4_kernel(x_ref, wq_ref, out_ref, acc_ref, *, cast_lhs):
    kidx = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    c4 = pltpu.bitcast(wq_ref[:], jnp.int4)  # [2*TKr, TN] == [TK, TN]
    lhs = x_ref[:].astype(jnp.int4) if cast_lhs else x_ref[:]
    acc_ref[:] += jax.lax.dot_general(
        lhs, c4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("k", "n", "tn", "tk", "cast_lhs"))
def int4_call(x8, wq, *, k, n, tn, tk, cast_lhs=False):
    m = x8.shape[0]
    grid = (-(-n // tn), k // tk)
    return pl.pallas_call(
        functools.partial(_int4_kernel, cast_lhs=cast_lhs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, tk), lambda j, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tn), lambda j, kk: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((m, tn), jnp.float32) if False else pltpu.VMEM((m, tn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + wq.size + m * n * 4,
            transcendentals=0,
        ),
    )(x8, wq)


def main():
    print(f"[{jax.devices()[0].device_kind}]")
    rng = np.random.default_rng(0)
    shapes = [(4096, 4096), (28672, 8192), (4096, 11008), (22016, 4096)]
    if len(sys.argv) > 1:
        shapes = [tuple(int(v) for v in a.split("x")) for a in sys.argv[1:]]

    from hqq_tpu.core.quantize import quantize
    from hqq_tpu.ops import fused_matmul as fm
    from hqq_tpu.backends.pallas_backend import _a8_pad_k_groups

    for (n, k) in shapes:
        L = max(6, int(48 * 4096 * 4096 / (n * k)))
        print(f"=== {k}x{n} (L={L}) ===")
        x32 = jnp.asarray(
            rng.integers(-100, 100, (32, k)).astype(np.int8), jnp.int8
        )
        x1bf = jnp.asarray(rng.standard_normal((1, k), dtype=np.float32) / 10,
                           jnp.bfloat16)

        # --- dense int8 ceiling
        w8 = jnp.stack([jnp.asarray(
            rng.integers(-8, 8, (k, n)).astype(np.int8))] * L)

        def int8_step(w, x):
            acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            accp = acc[:, :k] if n >= k else jnp.pad(acc, ((0, 0), (0, k - n)))
            return (x ^ (accp & 1).astype(jnp.int8)).astype(x.dtype)

        t8 = time_scan(int8_step, w8, x32, iters=4)
        print(f"  int8 dense [32,{k}]x[{k},{n}]: {t8*1e6:.1f}us "
              f"({k*n/t8/1e9:.0f} GB/s feed)")
        del w8

        # --- production w4a8
        w_np = rng.standard_normal((n, k), dtype=np.float32) / 20
        qt = quantize(jnp.asarray(w_np), nbits=4, group_size=64, axis=1,
                      round_zero=True, compute_dtype=jnp.bfloat16)
        kqt = fm.to_kernel_layout(qt, pad_k_groups=_a8_pad_k_groups(qt))
        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)
        bytes_q = kqt.wq.size + kqt.scale.size * 8

        def a8_step(w, x):
            y = fm.quant_matmul_pallas_a8(x, w)
            mm = min(k, y.shape[-1])
            return (x + jnp.pad(y[:, :mm] * 1e-6, ((0, 0), (0, k - mm)))).astype(x.dtype)

        t = time_scan(a8_step, stacked, x1bf, iters=4)
        print(f"  a8 production: {t*1e6:.1f}us ({t8/t*100:.0f}% of int8 ceiling, "
              f"{bytes_q/HBM_BW/t*100:.0f}% byte roofline)")
        del stacked

        # --- int4 rhs (bitcast unpack), pure dot (no scales — feed-rate probe)
        kp = fm._round_up(k, 2048)
        wp = jnp.stack([jnp.asarray(
            rng.integers(0, 256, (kp // 2, n)).astype(np.uint8))] * L)
        for tn in sorted({min(n, 2048), min(n, 4096)}):
            for cast_lhs in (False, True):
                try:
                    def i4_step(w, x, tn=tn, cast_lhs=cast_lhs):
                        xpad = jnp.pad(x, ((0, 0), (0, kp - k))) if kp != k else x
                        acc = int4_call(xpad, w, k=kp, n=n, tn=tn, tk=2048,
                                        cast_lhs=cast_lhs)
                        accp = acc[:, :k] if n >= k else jnp.pad(acc, ((0, 0), (0, k - n)))
                        return (x ^ (accp & 1).astype(jnp.int8)).astype(x.dtype)

                    t4 = time_scan(i4_step, wp, x32, iters=4)
                    eff = (kp * n / 2) / HBM_BW / t4 * 100
                    print(f"  int4 rhs tn={tn} cast_lhs={cast_lhs}: {t4*1e6:.1f}us "
                          f"({t8/t4*100:.0f}% vs int8 ceiling, {eff:.0f}% byte roofline)")
                except Exception as e:
                    print(f"  int4 rhs tn={tn} cast_lhs={cast_lhs} FAIL: "
                          f"{type(e).__name__}: {str(e)[:160]}")
        del wp


if __name__ == "__main__":
    main()
