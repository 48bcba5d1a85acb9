# SPDX-License-Identifier: Apache-2.0
"""Tile-plan sweep for the chunk-major axis=0 kernel (2b g16 / 1b g16/g32).

Sweeps (tk, f) x {old structure, v2 zs-dot structure} x meta dtype at M=1,
all ratios same-run vs the ax1-4b floor. The stock plan is tk=1024, f=step.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/autotune_ax0cm.py
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

from hqq_tpu.core.quantize import quantize
from hqq_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()
from hqq_tpu.ops.fused_matmul import (
    _pick_tile_ax0,
    _round_up,
    _unpack_chunks_2d,
    to_kernel_layout,
    to_kernel_layout_ax0,
    quant_matmul_pallas,
)
from tools.bench_kernels import time_scan

N, K, L = 4096, 4096, 48


def _cm_kernel(xt_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, corr_ref,
               *, g, cb, f_rep, out_dtype, v2):
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if v2:
            corr_ref[:] = jnp.zeros_like(corr_ref)

    r = 8 // cb
    tnr = wq_ref.shape[0]
    cd = scale_ref.dtype
    s_rep = pltpu.repeat(scale_ref[:], f_rep, axis=0) if f_rep > 1 else scale_ref[:]
    if v2:
        for j, cj in enumerate(_unpack_chunks_2d(wq_ref[:], cb)):
            wj = cj.astype(cd) * s_rep
            acc_ref[j * tnr:(j + 1) * tnr] += jax.lax.dot_general(
                wj.astype(xt_ref.dtype), xt_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        corr_ref[:] += jax.lax.dot_general(
            zs_ref[:].astype(xt_ref.dtype), xt_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(kidx == nk - 1)
        def _():
            out_ref[:] = (acc_ref[:]
                          - pltpu.repeat(corr_ref[:], r * f_rep, axis=0)
                          ).astype(out_dtype)
    else:
        zs_rep = pltpu.repeat(zs_ref[:], f_rep, axis=0) if f_rep > 1 else zs_ref[:]
        mask = (1 << cb) - 1
        p = wq_ref[:].astype(jnp.int32)
        for j in range(r):
            cj = (p >> (cb * (r - 1))) if j == 0 else (p >> (cb * (r - 1 - j))) & mask
            wj = cj.astype(jnp.float32) * s_rep - zs_rep
            acc_ref[j * tnr:(j + 1) * tnr] += jax.lax.dot_general(
                wj.astype(xt_ref.dtype), xt_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(kidx == nk - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=(
    "container_bits", "group_size", "n_pad", "k_pad", "tk", "f", "v2"))
def _cm_call(xt, wq, scale, zs, *, container_bits, group_size, n_pad, k_pad,
             tk, f, v2):
    g, cb = group_size, container_bits
    r = 8 // cb
    step = g // r
    ng = n_pad // g
    m_pad = xt.shape[1]
    gblk = ng
    tnr = f * gblk
    n_tiles = step // f
    ngb = 1
    tm = min(m_pad, 256)

    grid = (n_tiles, m_pad // tm, k_pad // tk)
    out = pl.pallas_call(
        functools.partial(_cm_kernel, g=g, cb=cb, f_rep=f, out_dtype=xt.dtype,
                          v2=v2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk, tm), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tnr, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((gblk, tk), lambda i, j, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((gblk, tk), lambda i, j, kk: (0, kk), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r * tnr, tm), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad * (r * tnr) // (r * tnr), m_pad), xt.dtype)
        if False else jax.ShapeDtypeStruct((n_tiles * r * tnr, m_pad), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((r * tnr, tm), jnp.float32),
            pltpu.VMEM((gblk, tm), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=(m_pad * k_pad * xt.dtype.itemsize + wq.size
                            + scale.size * scale.dtype.itemsize * 2),
            transcendentals=0,
        ),
    )(xt, wq, scale, zs)
    o6 = out.reshape(step // f, 1, r, f, gblk, m_pad)
    return o6.transpose(1, 4, 2, 0, 3, 5).reshape(n_pad, m_pad)


def make_qmm(kqt, tk, f, v2):
    n_out, k = kqt.shape
    g = kqt.group_size
    n_pad = kqt.wq.shape[0] * kqt.r
    k_pad = kqt.wq.shape[1]

    def qmm(x):
        x2 = x.reshape(-1, k)
        m = x2.shape[0]
        m_pad = _round_up(m, 8)
        xt = jnp.zeros((k_pad, m_pad), x2.dtype).at[:, :m].set(x2.T)
        out_t = _cm_call(xt, kqt.wq, kqt.scale, kqt.zs,
                         container_bits=kqt.container_bits, group_size=g,
                         n_pad=n_pad, k_pad=k_pad, tk=tk, f=f, v2=v2)
        y = out_t.T[:m]
        p_blocks = n_out // g
        y3 = y.reshape(m, y.shape[-1] // g, g)[:, :p_blocks, :]
        return jnp.swapaxes(y3, -1, -2).reshape(m, n_out)

    return qmm


def main():
    rng = np.random.default_rng(0)
    w_np = rng.standard_normal((N, K), dtype=np.float32) / 20
    x1 = jnp.asarray(rng.standard_normal((1, K), dtype=np.float32) / 10, jnp.bfloat16)

    def stack(kqt):
        return jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)

    def step_old(w, x):
        return (x + quant_matmul_pallas(x, w)[:, :K] * 1e-6).astype(x.dtype)

    qt1 = quantize(jnp.asarray(w_np), nbits=4, group_size=64, axis=1,
                   round_zero=True, compute_dtype=jnp.bfloat16)
    s1 = stack(to_kernel_layout(qt1))
    floor = time_scan(step_old, s1, x1, iters=4)
    print(f"ax1 4b g64 floor: {floor*1e6:.1f} us", flush=True)
    del s1

    from hqq_tpu.nn.linear import dequant_matmul
    for nbits, g in ((2, 16),):
        qt = quantize(jnp.asarray(w_np), nbits=nbits, group_size=g, axis=0,
                      compute_dtype=jnp.bfloat16)
        y_ref = dequant_matmul(x1, qt)
        kqt = to_kernel_layout_ax0(qt, meta_dtype=jnp.bfloat16)
        st = stack(kqt)
        # stock path reference row
        t_stock = time_scan(step_old, st, x1, iters=4)
        print(f"ax0 {nbits}b g{g} bf16 STOCK: {t_stock*1e6:.1f} us "
              f"({t_stock/floor:.3f}x)", flush=True)
        cb = kqt.container_bits
        r = 8 // cb
        step_g = g // r
        for v2 in (False, True):
            for f in sorted({1, 2, step_g} & {1, 2, 4, 8}):
                if step_g % f:
                    continue
                for tk in (512, 1024, 2048, 4096):
                    if K % tk:
                        continue
                    try:
                        qmm = make_qmm(kqt, tk, f, v2)
                        y2 = qmm(x1)
                        rel = float(jnp.linalg.norm((y2 - y_ref).astype(jnp.float32))
                                    / jnp.linalg.norm(y_ref.astype(jnp.float32)))
                        if rel > 0.05:
                            print(f"  v2={int(v2)} f={f} tk={tk}: WRONG relerr {rel:.1e}")
                            continue

                        def stp(w, x, qmm_tk=tk, qmm_f=f, qmm_v2=v2):
                            n_out, k = w.shape
                            return None
                        def stp2(w, x, _tk=tk, _f=f, _v2=v2):
                            g_ = w.group_size
                            n_out, k_ = w.shape
                            n_pad = w.wq.shape[0] * w.r
                            k_pad = w.wq.shape[1]
                            x2 = x.reshape(-1, k_)
                            m = x2.shape[0]
                            m_pad = _round_up(m, 8)
                            xt = jnp.zeros((k_pad, m_pad), x2.dtype).at[:, :m].set(x2.T)
                            out_t = _cm_call(xt, w.wq, w.scale, w.zs,
                                             container_bits=w.container_bits,
                                             group_size=g_, n_pad=n_pad,
                                             k_pad=k_pad, tk=_tk, f=_f, v2=_v2)
                            y = out_t.T[:m][:, :K]
                            return (x + y * 1e-6).astype(x.dtype)

                        t = time_scan(stp2, st, x1, iters=4)
                        print(f"  v2={int(v2)} f={f} tk={tk}: {t*1e6:.1f} us "
                              f"({t/floor:.3f}x floor), relerr {rel:.1e}", flush=True)
                    except Exception as e:
                        print(f"  v2={int(v2)} f={f} tk={tk}: FAIL {repr(e)[:120]}",
                              flush=True)
        del st


if __name__ == "__main__":
    main()
