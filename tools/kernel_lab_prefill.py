# SPDX-License-Identifier: Apache-2.0
"""Lab: w4a8 PREFILL routes (VERDICT r4 item 7 — w4a8 prefill at 5.7k tok/s
vs the int8 backend's 8.4k).

At prefill M the matmul is compute-bound: int8 MXU ops run ~2x bf16 rate, so
operand dtype matters for TOPS, not bytes. Candidates at M in {128, 512}:

  bf16k   : quant_matmul_pallas (current prefill route: in-kernel dequant to
            bf16 + bf16 dot — pays a VPU dequant of every W tile)
  grouped : _qmm_a8_call (per-group int8 dots, 64-deep MXU passes; re-test
            post-bc4 — the old 2.2x loss predates the cheap unpack)
  int8d   : dense int8 dot on a PREQUANTIZED per-channel w8 (the int8
            backend's rate — the target)
  dq+int8 : dequant kernel -> materialized per-channel int8 -> dense dot
            (one-shot requant per call; candidate auto-mix route)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab_prefill.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.utils.profiling import enable_compile_cache
from tools.bench_kernels import time_scan

enable_compile_cache()


def main():
    print(f"[{jax.devices()[0].device_kind}]")
    rng = np.random.default_rng(0)
    shapes = [(4096, 4096), (11008, 4096), (4096, 11008)]
    if len(sys.argv) > 1:
        shapes = [tuple(int(v) for v in a.split("x")) for a in sys.argv[1:]]

    from hqq_tpu.core.quantize import quantize
    from hqq_tpu.ops import fused_matmul as fm
    from hqq_tpu.backends.pallas_backend import _a8_pad_k_groups

    g = 64
    for (n, k) in shapes:
        w_np = rng.standard_normal((n, k), dtype=np.float32) / 20
        qt = quantize(jnp.asarray(w_np), nbits=4, group_size=g, axis=1,
                      round_zero=True, compute_dtype=jnp.bfloat16)
        kqt = fm.to_kernel_layout(qt, pad_k_groups=_a8_pad_k_groups(qt))
        # per-channel int8 requant of the dequantized weights (int8 backend)
        w_dq = fm.dequant_pallas(kqt)[:k]  # [K, N] bf16
        sw = jnp.max(jnp.abs(w_dq.astype(jnp.float32)), axis=0) / 127.0
        w8 = jnp.round(w_dq.astype(jnp.float32) / sw[None]).astype(jnp.int8)

        for M in (128, 512):
            L = max(4, int(8 * 512 * 4096 * 4096 / (M * n * k)))
            print(f"=== {k}x{n} M={M} (L={L}) ===")
            x = jnp.asarray(rng.standard_normal((M, k), dtype=np.float32) / 10,
                            jnp.bfloat16)

            def fold(xv, y):
                mm = min(k, y.shape[-1])
                return (xv + jnp.pad(
                    y[:, :mm].astype(jnp.float32) * 1e-6,
                    ((0, 0), (0, k - mm)))).astype(xv.dtype)

            stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)

            def bf16k_step(w, xv):
                return fold(xv, fm.quant_matmul_pallas(xv, w))

            t = time_scan(bf16k_step, stacked, x, iters=3)
            base = t
            print(f"  bf16k   : {t*1e6:8.1f}us ({M*L/t/L/1e3:.1f}k tok/s-equiv)")

            def grouped_step(w, xv):
                x2 = xv.reshape(-1, k)
                x8, sx = fm.quantize_activations_int8(x2)
                k_arr = w.wq.shape[-2] * w.r
                if k_arr != k:
                    x8 = jnp.pad(x8, ((0, 0), (0, k_arr - k)))
                y = fm._qmm_a8_call(
                    x8, w.wq, w.scale, w.zs,
                    container_bits=w.container_bits, group_size=w.group_size,
                    k=k_arr, n=n, bc4=w.bc4,
                )
                return fold(xv, (y * sx).astype(xv.dtype))

            try:
                t = time_scan(grouped_step, stacked, x, iters=3)
                print(f"  grouped : {t*1e6:8.1f}us ({base/t:.2f}x bf16k)")
            except Exception as e:
                print(f"  grouped : FAIL {type(e).__name__}: {str(e)[:110]}")
            del stacked

            w8s = jnp.stack([w8] * L)

            def int8d_step(w, xv):
                x2 = xv.reshape(-1, k)
                x8, sx = fm.quantize_activations_int8(x2)
                acc = jax.lax.dot_general(
                    x8, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return fold(xv, (acc.astype(jnp.float32) * sx * sw[None]).astype(xv.dtype))

            t = time_scan(int8d_step, w8s, x, iters=3)
            print(f"  int8d   : {t*1e6:8.1f}us ({base/t:.2f}x bf16k)")
            del w8s

            stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)
            swc = sw  # closure

            def dq_int8_step(w, xv):
                wd = fm.dequant_pallas(w)[:k]  # [K, N] bf16
                w8l = jnp.round(wd.astype(jnp.float32) / swc[None]).astype(jnp.int8)
                x2 = xv.reshape(-1, k)
                x8, sx = fm.quantize_activations_int8(x2)
                acc = jax.lax.dot_general(
                    x8, w8l, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return fold(xv, (acc.astype(jnp.float32) * sx * swc[None]).astype(xv.dtype))

            try:
                t = time_scan(dq_int8_step, stacked, x, iters=3)
                print(f"  dq+int8 : {t*1e6:8.1f}us ({base/t:.2f}x bf16k)")
            except Exception as e:
                print(f"  dq+int8 : FAIL {type(e).__name__}: {str(e)[:110]}")
            del stacked


if __name__ == "__main__":
    main()
