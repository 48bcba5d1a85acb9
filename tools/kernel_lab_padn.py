# SPDX-License-Identifier: Apache-2.0
"""Kernel lab: N-padding sweep for the w4a8 decode kernel.

At N=11008 (llama gate/up), N/128 = 86 admits no 128-multiple tile between
256 and 2048, so `_pick_tile_n` degrades to TN=256 and the grid runs 86
overhead-dominated steps — measured 107.7 us vs the 67.4 us dense-int8
ceiling (62.6%). Padding N to a multiple of 512/1024/2048 at pack time
trades a few % of extra bytes for big tiles. This lab measures the
trade-off by quantizing weights zero-padded in N (zero rows quantize to
exact-zero dequant, so timing is representative).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab_padn.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import quantize
from hqq_tpu.ops.fused_matmul import to_kernel_layout, quant_matmul_pallas_a8
from hqq_tpu.utils.profiling import enable_compile_cache
from tools.bench_kernels import time_scan, HBM_BW

enable_compile_cache()


def bench_shape(n, k, pad_units):
    rng = np.random.default_rng(0)
    L = max(6, int(48 * 4096 * 4096 / (n * k)))
    w_np = rng.standard_normal((n, k), dtype=np.float32) / 20
    x1 = jnp.asarray(rng.standard_normal((1, k), dtype=np.float32) / 10,
                     jnp.bfloat16)
    g = 64
    pad32 = -(-k // (32 * g)) * 32 * g
    pad_groups = 32 if (pad32 - k) * 8 <= k else 8

    for u in pad_units:
        n_pad = -(-n // u) * u
        w_use = np.zeros((n_pad, k), np.float32)
        w_use[:n] = w_np
        qt = quantize(jnp.asarray(w_use), nbits=4, group_size=64, axis=1,
                      round_zero=True, compute_dtype=jnp.bfloat16)
        kqt = to_kernel_layout(qt, pad_k_groups=pad_groups)
        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)
        bytes_q = kqt.wq.size + kqt.scale.size * 4 + kqt.zs.size * 4

        def a8_step(w, x):
            y = quant_matmul_pallas_a8(x, w).astype(jnp.float32)
            mm = min(k, y.shape[-1])
            return (x + jnp.pad(y[:, :mm] * 1e-6, ((0, 0), (0, k - mm)))).astype(x.dtype)

        t = time_scan(a8_step, stacked, x1, iters=4)
        print(f"[{k}x{n}] pad_n={u} (n_pad={n_pad}, +{(n_pad-n)/n*100:.1f}% rows): "
              f"{t*1e6:.1f} us, {bytes_q/1e6:.1f}MB, eff {bytes_q/HBM_BW/t*100:.0f}%")
        del stacked


def main():
    print(f"[{jax.devices()[0].device_kind}]")
    bench_shape(11008, 4096, (128, 512, 1024))
    bench_shape(4096, 11008, (128, 1024))   # down_proj: n already 1024-mult
    bench_shape(4096, 4096, (128,))         # control (tn=2048 today)
    bench_shape(13824, 5120, (128, 512, 1024))
    bench_shape(5120, 13824, (128, 512, 1024))


if __name__ == "__main__":
    main()
