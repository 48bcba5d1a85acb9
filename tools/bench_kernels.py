# SPDX-License-Identifier: Apache-2.0
"""Per-kernel microbenchmarks vs HBM speed-of-light.

Scans over L STACKED weights (so each iteration streams a fresh weight from
HBM, like a real model's layer loop — a single weight would stay resident in
VMEM and measure compute, not bandwidth). Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_kernels.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import quantize
from hqq_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()
from hqq_tpu.ops.fused_matmul import (
    to_kernel_layout,
    quant_matmul_pallas,
    quant_matmul_pallas_a8,
)
from hqq_tpu.nn.linear import dequant_matmul

HBM_BW = 819e9  # v5e


def time_scan(step, stacked, x0, iters=6, n1=2, n2=10):
    """Per-matmul time of scanning `step` over the leading axis of `stacked`.

    Differential timing: the whole L-layer sweep is repeated n times inside
    one device call, timed at n=n1 and n=n2; the slope removes the (large)
    axon host-fetch / dispatch constant. Weights are streamed from HBM each
    sweep (the stack is far larger than VMEM)."""
    L = jax.tree_util.tree_leaves(stacked)[0].shape[0]

    def sweep(x, ws):
        return jax.lax.scan(lambda c, w: (step(w, c), None), x, ws)[0]

    @jax.jit
    def run(ws, x, n):
        return jax.lax.fori_loop(0, n, lambda i, c: sweep(c, ws), x)

    def best_time(n):
        np.asarray(run(stacked, x0, n))  # warm (host fetch: axon block_until_ready unreliable)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(run(stacked, x0, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_time(n2) - best_time(n1)) / ((n2 - n1) * L)


def section_ax0():
    """Axis=0 kernel timings (VERDICT r2 item 1): 7B-shape decode for the
    quality-mode configs (2-bit g16 / 3-bit g64 axis=0, BASELINE config 3)
    vs the 4-bit axis=1 kernel's floor and the XLA fallback."""
    from hqq_tpu.ops.fused_matmul import to_kernel_layout_ax0

    M, K, N, L = 8, 4096, 4096, 48
    rng = np.random.default_rng(0)
    w_np = rng.standard_normal((N, K), dtype=np.float32) / 20
    x0 = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32) / 10, jnp.bfloat16)
    x1 = x0[:1]

    for nbits, g in ((4, 64), (3, 64), (2, 16), (2, 64)):
        qt = quantize(jnp.asarray(w_np), nbits=nbits, group_size=g, axis=0,
                      compute_dtype=jnp.bfloat16)
        kqt = to_kernel_layout_ax0(qt)
        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)
        bytes_q = kqt.wq.size + kqt.scale.size * 4 + kqt.zs.size * 4

        def qmm_step(w, x):
            y = quant_matmul_pallas(x, w)
            return (x + y[:, :K] * 1e-6).astype(x.dtype)

        for xm, tag in ((x0, f"M={M}"), (x1, "M=1")):
            t = time_scan(qmm_step, stacked, xm)
            print(f"ax0 pallas {nbits}b g{g} {tag}: {t*1e6:.1f} us, "
                  f"bytes {bytes_q/1e6:.1f}MB, eff {bytes_q/HBM_BW/t*100:.0f}%")

        stacked_qt = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), qt)

        def xla_step(w, x):
            y = dequant_matmul(x, w)
            return (x + y[:, :K] * 1e-6).astype(x.dtype)

        t = time_scan(xla_step, stacked_qt, x1)
        print(f"  ax0 xla {nbits}b g{g} M=1: {t*1e6:.1f} us")


def section_13b():
    """13B-shape ceilings (VERDICT r2 item 2): measure the dense-int8 MXU
    feed floor and w4a8 at 5120/13824 dims to prove (or close) the 49.3 tok/s
    gap against the byte roofline."""
    rng = np.random.default_rng(0)
    for (N, K) in ((13824, 5120), (5120, 13824), (5120, 5120)):
        L = max(6, int(48 * 4096 * 4096 / (N * K)))
        w_np = rng.standard_normal((N, K), dtype=np.float32) / 20
        x1 = jnp.asarray(rng.standard_normal((1, K), dtype=np.float32) / 10,
                         jnp.bfloat16)

        # dense int8 dot = the int8-operand feed ceiling at this shape
        w8 = jnp.stack([jnp.asarray(np.round(w_np * 100).astype(np.int8))] * L)

        def int8_step(w, x):
            xf = x.astype(jnp.float32)
            sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
            x8 = jnp.round(xf / jnp.maximum(sx, 1e-8)).astype(jnp.int8)
            acc = jax.lax.dot_general(x8, w, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * sx
            mm = min(K, y.shape[-1])
            return (x + jnp.pad(y[:, :mm] * 1e-6, ((0, 0), (0, K - mm)))).astype(x.dtype)

        t8 = time_scan(int8_step, w8, x1)
        bytes8 = N * K
        print(f"13b-shape [{K}x{N}] dense-int8 M=1: {t8*1e6:.1f} us, "
              f"{bytes8/t8/1e12:.2f} TB/s, eff {bytes8/HBM_BW/t8*100:.0f}%")
        del w8

        # w4a8 from true 4-bit storage (pad_k_groups chosen like the backend)
        from hqq_tpu.backends.pallas_backend import _a8_pad_k_groups

        qt = quantize(jnp.asarray(w_np), nbits=4, group_size=64, axis=1,
                      round_zero=True, compute_dtype=jnp.bfloat16)
        pad_groups = _a8_pad_k_groups(qt)
        kqt = to_kernel_layout(qt, pad_k_groups=pad_groups)
        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)
        bytes_q = kqt.wq.size + kqt.scale.size * 4 + kqt.zs.size * 4

        def a8_step(w, x):
            y = quant_matmul_pallas_a8(x, w).astype(jnp.float32)
            mm = min(K, y.shape[-1])
            return (x + jnp.pad(y[:, :mm] * 1e-6, ((0, 0), (0, K - mm)))).astype(x.dtype)

        t = time_scan(a8_step, stacked, x1)
        print(f"  w4a8 4b g64 pad{pad_groups} M=1: {t*1e6:.1f} us, "
              f"bytes {bytes_q/1e6:.1f}MB, {bytes_q/t/1e12:.2f} TB/s, "
              f"eff {bytes_q/HBM_BW/t*100:.0f}%, vs-int8-ceiling "
              f"{t8/t:.2f}x-time ({bytes_q/bytes8*100:.0f}% of its bytes)")
        del stacked


def main():
    print(jax.devices())
    M, K, N, L = 8, 4096, 4096, 48
    rng = np.random.default_rng(0)
    w_np = rng.standard_normal((N, K), dtype=np.float32) / 20
    x0 = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32) / 10, jnp.bfloat16)
    x1 = x0[:1]

    # ---- dense bf16 reference ----
    wb = jnp.stack([jnp.asarray(w_np + i * 1e-6).astype(jnp.bfloat16).T for i in range(L)])

    def dense_step(w, x):
        y = x @ w
        return (x + y[:, :K] * 1e-6).astype(x.dtype)

    t = time_scan(dense_step, wb, x0)
    bytes_dense = K * N * 2
    print(f"dense bf16 [{M}x{K}]@[{K}x{N}]: {t*1e6:.1f} us, roofline {bytes_dense/HBM_BW*1e6:.1f} us, eff {bytes_dense/HBM_BW/t*100:.0f}%")

    # ---- dense int8 reference (the int8 backend's dot) ----
    w8 = jnp.stack([jnp.asarray(np.round(w_np * 100).astype(np.int8))] * L)

    def int8_step(w, x):
        xf = x.astype(jnp.float32)
        sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        x8 = jnp.round(xf / jnp.maximum(sx, 1e-8)).astype(jnp.int8)
        acc = jax.lax.dot_general(x8, w, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx
        return (x + y[:, :K] * 1e-6).astype(x.dtype)

    for xm, tag in ((x0, f"M={M}"), (x1, "M=1")):
        t = time_scan(int8_step, w8, xm)
        print(f"xla int8 A8W8 {tag}: {t*1e6:.1f} us ({K*N} int8 bytes)")

    for nbits, g in ((8, 64), (4, 64), (4, 128), (2, 64)):
        qt = quantize(jnp.asarray(w_np), nbits=nbits, group_size=g, axis=1,
                      round_zero=(nbits == 4), compute_dtype=jnp.bfloat16)
        kqt = to_kernel_layout(qt)
        stacked = jax.tree_util.tree_map(
            lambda a: jnp.stack([a] * L), kqt,
        )

        def qmm_step(w, x):
            y = quant_matmul_pallas(x, w)
            return (x + y[:, :K] * 1e-6).astype(x.dtype)

        t = time_scan(qmm_step, stacked, x0)
        bytes_q = kqt.wq.size + kqt.scale.size * 4 + kqt.zs.size * 4
        print(f"pallas {nbits}b g{g}: {t*1e6:.1f} us, roofline {bytes_q/HBM_BW*1e6:.1f} us, "
              f"eff {bytes_q/HBM_BW/t*100:.0f}%, speedup-vs-bf16-roofline {bytes_dense/HBM_BW/t:.2f}x")

        # W4A8: 4-bit storage, int8 MXU operands (pad K to 32 groups so the
        # M=1 class-replicated route applies)
        if nbits in (4, 2):
            kqt32 = to_kernel_layout(qt, pad_k_groups=32)
            st32 = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt32)

            def a8_step(w, x):
                y = quant_matmul_pallas_a8(x, w)
                return (x + y[:, :K] * 1e-6).astype(x.dtype)

            for xm, tag in ((x0, f"M={M}"), (x1, "M=1")):
                t = time_scan(a8_step, st32, xm)
                print(f"  w4a8 {nbits}b g{g} {tag}: {t*1e6:.1f} us, "
                      f"eff {bytes_q/HBM_BW/t*100:.0f}%, vs-bf16-roofline {bytes_dense/HBM_BW/t:.2f}x")

        stacked_qt = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), qt)

        def xla_step(w, x):
            y = dequant_matmul(x, w)
            return (x + y[:, :K] * 1e-6).astype(x.dtype)

        t = time_scan(xla_step, stacked_qt, x0)
        print(f"  xla {nbits}b g{g}: {t*1e6:.1f} us, eff {bytes_q/HBM_BW/t*100:.0f}%")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "base"
    if which == "ax0":
        print(jax.devices())
        section_ax0()
    elif which == "13b":
        print(jax.devices())
        section_13b()
    elif which == "all":
        main()
        section_ax0()
        section_13b()
    else:
        main()
