# SPDX-License-Identifier: Apache-2.0
"""Kernel lab: axis=0 fused dequant-matmul variants (2-bit g16 focus).

The production `_qmm_ax0_kernel` unpacks packed codes into 3-D chunks
[n_groups, g//r, TK] and concatenates along the middle axis. For 2-bit g16
(r=4, g//r=4) the chunks are 4-sublane — below the native 8-sublane tile —
forcing Mosaic relayouts that make the kernel compute-bound (109 us vs the
~45 us 2-bit g64 time at 4096^2 M=1).

Variant V1 keeps everything 2-D and full-tile: shift/mask chunks stay
[TN//r, TK], scale/zs are sublane-repeated (pltpu.repeat) to packed-row
granularity, and each chunk gets its own dot into a contiguous accumulator
slice. The chunk-major row order is un-permuted outside the kernel by a pure
reshape/transpose on the (tiny at decode) output.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab_ax0.py
"""

import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hqq_tpu.core.quantize import quantize, dequantize
from hqq_tpu.ops.fused_matmul import (
    to_kernel_layout_ax0,
    quant_matmul_pallas,
    _pick_tile_ax0,
    _round_up,
    _unpermute_ax0,
)
from hqq_tpu.utils.profiling import enable_compile_cache
from tools.bench_kernels import time_scan, HBM_BW

enable_compile_cache()


def _v1_kernel(xt_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, *, g, cb, out_dtype):
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    r = 8 // cb
    mask = (1 << cb) - 1
    p = wq_ref[:].astype(jnp.int32)  # [TN//r, TK] full-tile 2-D
    tnr = p.shape[0]
    tk = p.shape[1]
    step = g // r if r > 1 else g
    ng = tnr // step

    def _rep(ref):  # [TN//g, TK] -> [TN//r, TK], row p -> ref[p // step]
        return jnp.broadcast_to(
            ref[:][:, None, :], (ng, step, tk)
        ).reshape(tnr, tk)

    s_rep = _rep(scale_ref)
    zs_rep = _rep(zs_ref)

    for j in range(r):
        cj = (p >> (cb * (r - 1 - j))) & mask if r > 1 else p
        wj = cj.astype(jnp.float32) * s_rep - zs_rep
        acc_ref[j * tnr : (j + 1) * tnr] += jax.lax.dot_general(
            wj.astype(xt_ref.dtype),
            xt_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("container_bits", "group_size", "n_pad", "k_pad"),
)
def _v1_call(xt, wq, scale, zs, *, container_bits, group_size, n_pad, k_pad):
    g, cb = group_size, container_bits
    r = 8 // cb
    m_pad = xt.shape[1]
    tn = _pick_tile_ax0(n_pad, 8 * g, 2048)
    tk = _pick_tile_ax0(k_pad, 128, 1024)
    grid = (n_pad // tn, 1, k_pad // tk)
    out = pl.pallas_call(
        functools.partial(_v1_kernel, g=g, cb=cb, out_dtype=xt.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk, m_pad), lambda i, j, kk: (kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn // r, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn // g, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn // g, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, m_pad), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), xt.dtype),
        scratch_shapes=[pltpu.VMEM((tn, m_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=(
                m_pad * k_pad * xt.dtype.itemsize
                + wq.size
                + scale.size * scale.dtype.itemsize * 2
                + m_pad * n_pad * xt.dtype.itemsize
            ),
            transcendentals=0,
        ),
    )(xt, wq, scale, zs)
    # rows within each TN tile are chunk-major (j, group, within-chunk):
    # un-permute to packed-row-major (group, j, within-chunk) = permuted space
    if r > 1:
        step = g // r
        o5 = out.reshape(n_pad // tn, r, tn // g, step, m_pad)
        out = o5.transpose(0, 2, 1, 3, 4).reshape(n_pad, m_pad)
    return out


def v1_matmul(x, kqt):
    n_out, k = kqt.shape
    g = kqt.group_size
    n_pad = kqt.wq.shape[0] * kqt.r
    k_pad = kqt.wq.shape[1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if k_pad != k:
        x2 = jnp.pad(x2, ((0, 0), (0, k_pad - k)))
    m_pad = _round_up(m, 8)
    xt = jnp.zeros((k_pad, m_pad), x2.dtype).at[:, :m].set(x2.T)
    out_t = _v1_call(
        xt, kqt.wq, kqt.scale, kqt.zs,
        container_bits=kqt.container_bits, group_size=g,
        n_pad=n_pad, k_pad=k_pad,
    )
    y = _unpermute_ax0(out_t.T[:m], n_out, g)
    return y.reshape(*lead, n_out)


def main():
    print(f"[{jax.devices()[0].device_kind}]")
    rng = np.random.default_rng(0)
    N = K = 4096
    L = 48
    w_np = rng.standard_normal((N, K), dtype=np.float32) / 20
    x1 = jnp.asarray(rng.standard_normal((1, K), dtype=np.float32) / 10, jnp.bfloat16)

    for nbits, g in ((2, 16), (2, 32), (2, 64), (3, 64), (4, 64), (1, 16)):
        qt = quantize(jnp.asarray(w_np), nbits=nbits, group_size=g, axis=0,
                      compute_dtype=jnp.bfloat16)
        kqt = to_kernel_layout_ax0(qt)

        # correctness first (vs production kernel = vs dequant reference)
        y_ref = quant_matmul_pallas(x1, kqt)
        y_v1 = v1_matmul(x1, kqt)
        err = float(jnp.max(jnp.abs(y_v1.astype(jnp.float32) - y_ref.astype(jnp.float32))))
        ok = "OK" if err == 0.0 else f"MAXDIFF {err:.2e}"

        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)
        bytes_q = kqt.wq.size + kqt.scale.size * 4 + kqt.zs.size * 4

        def v0_step(w, x):
            return (x + quant_matmul_pallas(x, w)[:, :K] * 1e-6).astype(x.dtype)

        def v1_step(w, x):
            return (x + v1_matmul(x, w)[:, :K] * 1e-6).astype(x.dtype)

        t0 = time_scan(v0_step, stacked, x1, iters=4)
        t1 = time_scan(v1_step, stacked, x1, iters=4)
        print(f"ax0 {nbits}b g{g}: V0 {t0*1e6:.1f}us  V1 {t1*1e6:.1f}us "
              f"({bytes_q/1e6:.1f}MB, V1 eff {bytes_q/HBM_BW/t1*100:.0f}%)  [{ok}]")
        del stacked


if __name__ == "__main__":
    main()
