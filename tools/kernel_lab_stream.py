# SPDX-License-Identifier: Apache-2.0
"""Lab: what is the real achievable HBM stream rate in the decode regime?

Every w4a8 shape measures 42-55% of the 819 GB/s spec roofline, and so does a
bare int4 dot with no epilogue (kernel_lab_i4split.py) — suggesting the cap
is the achievable DMA stream rate in the lax.scan-over-stacked-weights
regime, not the kernels. This lab measures:

  stream  : Pallas kernel that DMAs the packed wq blocks into VMEM and does
            near-zero work (copy 8 rows to the output) — pure read rate.
  stream2 : same with double-size K tiles (fewer grid steps).
  xlaread : XLA-level reduction over the same stacked array (jnp.sum of a
            8-row slice per layer) — no Pallas at all.
  a8prod  : the production kernel, same run, for the ratio.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab_stream.py [NxK ...]
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


def _stream_kernel(wq_ref, out_ref, acc_ref):
    kidx = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # touch the block so the DMA is not dead-code-eliminated; 8 rows of
    # int8->int32 adds are ~free next to the block DMA
    acc_ref[:] += wq_ref[0:8, :].astype(jnp.int32)

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tkr", "tn"))
def stream_call(wq, *, tkr, tn):
    kr, n = wq.shape
    grid = (n // tn, kr // tkr)
    return pl.pallas_call(
        _stream_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tkr, tn), lambda j, kk: (kk, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, tn), lambda j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, tn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * n * (kr // tkr),
            bytes_accessed=kr * n + 8 * n * 4,
            transcendentals=0,
        ),
    )(wq)


def main():
    print(f"[{jax.devices()[0].device_kind}]")
    rng = np.random.default_rng(0)
    shapes = [(4096, 4096), (28672, 8192), (22016, 4096), (13824, 5120)]
    if len(sys.argv) > 1:
        shapes = [tuple(int(v) for v in a.split("x")) for a in sys.argv[1:]]

    from hqq_tpu.core.quantize import quantize
    from hqq_tpu.ops import fused_matmul as fm
    from hqq_tpu.backends.pallas_backend import _a8_pad_k_groups

    g = 64
    for (n, k) in shapes:
        L = max(6, int(48 * 4096 * 4096 / (n * k)))
        w_np = rng.standard_normal((n, k), dtype=np.float32) / 20
        qt = quantize(jnp.asarray(w_np), nbits=4, group_size=g, axis=1,
                      round_zero=True, compute_dtype=jnp.bfloat16)
        kqt = fm.to_kernel_layout(qt, pad_k_groups=_a8_pad_k_groups(qt))
        kr, n_pad = kqt.wq.shape
        print(f"=== {k}x{n} wq [{kr},{n_pad}] {kr*n_pad/1e6:.1f} MB (L={L}) ===")
        wqs = jnp.stack([kqt.wq] * L)
        x8 = jnp.zeros((8, n_pad), jnp.int32)

        tn0, _ = fm._a8_tile_plan(n_pad, 4096)
        for name, tkr, tn in (
            ("stream t1024", 1024, tn0),
            ("stream t2048", 2048, tn0),
            ("stream whole-K", kr, min(n_pad, 2048)),
            ("stream whole-K wide", kr, tn0),
        ):
            if kr % tkr or (tn <= 0):
                continue
            if tkr * tn > 12 * 1024 * 1024:  # VMEM guard (double-buffered)
                continue

            def step(w, x, tkr=tkr, tn=tn):
                y = stream_call(w, tkr=tkr, tn=tn)
                return x + y

            try:
                t = time_scan(step, wqs, x8, iters=4)
            except Exception as e:
                print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:100]}")
                continue
            gbs = kr * n_pad / t / 1e9
            print(f"  {name:20s} {t*1e6:7.1f}us  {gbs:5.0f} GB/s "
                  f"({gbs/819*100:.0f}% spec)")

        # XLA-level read of the same bytes
        def xstep(w, x):
            return x + jnp.sum(w.astype(jnp.int32).reshape(8, -1, n_pad), axis=1)

        try:
            t = time_scan(xstep, wqs, x8, iters=4)
            gbs = kr * n_pad / t / 1e9
            print(f"  {'xlaread':20s} {t*1e6:7.1f}us  {gbs:5.0f} GB/s "
                  f"({gbs/819*100:.0f}% spec)")
        except Exception as e:
            print(f"  xlaread: FAIL {type(e).__name__}: {str(e)[:100]}")
        del wqs

        # production same-run
        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)
        x1 = jnp.asarray(rng.standard_normal((1, k), dtype=np.float32) / 10,
                         jnp.bfloat16)

        def astep(w, x):
            y = fm.quant_matmul_pallas_a8(x, w).astype(jnp.float32)
            mm = min(k, y.shape[-1])
            return (x + jnp.pad(y[:, :mm] * 1e-6, ((0, 0), (0, k - mm)))).astype(x.dtype)

        t = time_scan(astep, stacked, x1, iters=4)
        bytes_q = kqt.wq.size + kqt.scale.size * 8
        print(f"  {'a8prod':20s} {t*1e6:7.1f}us  {bytes_q/t/1e9:5.0f} GB/s "
              f"({bytes_q/t/HBM_BW*100:.0f}% spec)")
        del stacked


if __name__ == "__main__":
    main()
