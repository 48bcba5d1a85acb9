# SPDX-License-Identifier: Apache-2.0
"""Lab: meta-dtype traffic for the axis=0 quality-mode kernels.

VERDICT r3 weak #3: 2-bit g16 axis=0 reads HALF the code bytes of 4-bit g64
axis=1 yet ran 24% slower, because fp32 scale+zs at g=16 is 0.5 B/weight —
meta is ~2/3 of its HBM traffic. This lab measures the bf16-meta variant
(halves the dominant term) against the fp32-meta kernel and the ax1-4b floor,
all same-run, plus the numeric delta of the bf16 rounding.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab_ax0_meta.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import quantize
from hqq_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()
from hqq_tpu.ops.fused_matmul import (
    to_kernel_layout,
    to_kernel_layout_ax0,
    quant_matmul_pallas,
)
from tools.bench_kernels import time_scan

N, K, L = 4096, 4096, 48


def main():
    rng = np.random.default_rng(0)
    w_np = rng.standard_normal((N, K), dtype=np.float32) / 20
    x1 = jnp.asarray(rng.standard_normal((1, K), dtype=np.float32) / 10, jnp.bfloat16)

    def qmm_step(w, x):
        return (x + quant_matmul_pallas(x, w)[:, :K] * 1e-6).astype(x.dtype)

    def stack(kqt):
        return jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)

    def meta_bytes(kqt):
        return kqt.wq.size + (kqt.scale.size + kqt.zs.size) * kqt.scale.dtype.itemsize

    # floor: ax1 4-bit g64 bf16-operand kernel
    qt1 = quantize(jnp.asarray(w_np), nbits=4, group_size=64, axis=1,
                   round_zero=True, compute_dtype=jnp.bfloat16)
    s1 = stack(to_kernel_layout(qt1))
    floor = time_scan(qmm_step, s1, x1, iters=4)
    print(f"ax1 4b g64 floor: {floor*1e6:.1f} us")
    del s1

    for nbits, g in ((2, 16), (1, 16), (1, 32), (3, 64), (2, 64)):
        qt = quantize(jnp.asarray(w_np), nbits=nbits, group_size=g, axis=0,
                      compute_dtype=jnp.bfloat16)
        rows = {}
        for md in (jnp.float32, jnp.bfloat16):
            kqt = to_kernel_layout_ax0(qt, meta_dtype=md)
            t = time_scan(qmm_step, stack(kqt), x1, iters=4)
            mb = meta_bytes(kqt)
            rows[md.__name__] = t
            # numeric check vs the XLA dequant reference
            y_k = quant_matmul_pallas(x1, kqt)[:, :N]
            from hqq_tpu.nn.linear import dequant_matmul
            y_ref = dequant_matmul(x1, qt)
            rel = float(jnp.linalg.norm((y_k - y_ref).astype(jnp.float32))
                        / jnp.linalg.norm(y_ref.astype(jnp.float32)))
            print(f"ax0 {nbits}b g{g} meta={md.__name__}: {t*1e6:.1f} us "
                  f"({t/floor:.3f}x floor), bytes {mb/1e6:.2f} MB, "
                  f"stream-floor {mb/819e9*1e6:.1f} us, relerr {rel:.2e}")
        print(f"  -> bf16 meta speedup: {rows['float32']/rows['bfloat16']:.3f}x")


if __name__ == "__main__":
    main()
