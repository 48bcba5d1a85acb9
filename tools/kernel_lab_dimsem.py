# SPDX-License-Identifier: Apache-2.0
"""Lab: does declaring grid dimension_semantics (("parallel","arbitrary"))
improve the a8 decode kernel's DMA pipelining? The production grid is
(n_tiles, k_tiles) with the accumulator carried over K — N tiles are
independent ("parallel"), K is a reduction ("arbitrary"). Mosaic may
schedule prefetches differently when told so.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab_dimsem.py
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


def _kernel(xp_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, *, g, s):
    kidx = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tn = wq_ref.shape[-1]
    part = jax.lax.dot_general(
        xp_ref[:], pltpu.bitcast(wq_ref[:], jnp.int4).astype(jnp.int8),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
    )
    xsum = jnp.sum(xp_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    contrib = part.astype(jnp.float32) * scale_ref[:] - xsum * zs_ref[:]
    acc_ref[:] += jnp.sum(contrib.reshape(8, s // 8, tn), axis=1)

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("g", "s", "k", "n", "tn", "dimsem"))
def call(xp, wq, scale, zs, *, g, s, k, n, tn, dimsem):
    tk = s * g
    grid = (-(-n // tn), k // tk)
    kwargs = {}
    if dimsem:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    return pl.pallas_call(
        functools.partial(_kernel, g=g, s=s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, tk), lambda j, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda j, kk: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * s * n * k, bytes_accessed=s * k + wq.size + scale.size * 8,
            transcendentals=0),
        **kwargs,
    )(xp, wq, scale, zs)


def main():
    print(f"[{jax.devices()[0].device_kind}]")
    rng = np.random.default_rng(0)
    from hqq_tpu.core.quantize import quantize
    from hqq_tpu.ops import fused_matmul as fm
    from hqq_tpu.backends.pallas_backend import _a8_pad_k_groups

    g = 64
    # shape -> the autotuned (s, tn) winner
    cases = [(4096, 4096, 64, 4096), (22016, 4096, 32, 1536),
             (28672, 8192, 16, 8192), (13824, 5120, 16, 2560)]
    for (n, k, s, tn) in cases:
        L = max(6, int(48 * 4096 * 4096 / (n * k)))
        w_np = rng.standard_normal((n, k), dtype=np.float32) / 20
        qt = quantize(jnp.asarray(w_np), nbits=4, group_size=g, axis=1,
                      round_zero=True, compute_dtype=jnp.bfloat16)
        kqt = fm.to_kernel_layout(qt, pad_k_groups=_a8_pad_k_groups(qt))
        k_arr = kqt.wq.shape[0] * 2
        n_pad = kqt.wq.shape[1]
        if k_arr % (s * g):
            s2 = 32 if k_arr % (32 * g) == 0 else 16
            print(f"(s {s}->{s2} for k_arr {k_arr})")
            s = s2
        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)
        x8 = jnp.asarray(rng.integers(-100, 100, (1, k_arr)).astype(np.int8))
        eye = jnp.eye(s, dtype=jnp.int8)
        nt = k_arr // (s * g)
        xg = x8.reshape(1, nt, s, g).transpose(1, 0, 2, 3)
        xp = (xg[:, None] * eye[None, :, None, :, None]).transpose(
            2, 1, 0, 3, 4).reshape(s, k_arr)

        print(f"=== {k}x{n} s={s} tn={min(tn, n_pad)} (L={L}) ===")
        for dimsem in (False, True):
            def step(w, xv, dimsem=dimsem):
                y = call(xv, w.wq, w.scale, w.zs, g=g, s=s, k=k_arr,
                         n=n_pad, tn=min(tn, n_pad), dimsem=dimsem)
                # keep a real data dependency or XLA DCEs the kernel
                return (xv ^ (jnp.sum(y).astype(jnp.int32) & 1).astype(xv.dtype))

            try:
                t = time_scan(step, stacked, xp, iters=4)
                print(f"  dimsem={dimsem}: {t*1e6:7.1f}us")
            except Exception as e:
                print(f"  dimsem={dimsem}: FAIL {type(e).__name__}: {str(e)[:120]}")
        del stacked


if __name__ == "__main__":
    main()
