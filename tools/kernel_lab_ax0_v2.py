# SPDX-License-Identifier: Apache-2.0
"""Lab: chunk-major axis=0 kernel v2 — bitcast unpack + zs-correction dot.

Candidate improvements over `_qmm_ax0_cm_kernel` for the sub-8-step quality
configs (2b g16, 1b g16/g32):
  1. bitfield chunks via `_unpack_chunks_2d` (int32-lane bitcast shift/mask,
     4 packed bytes per VPU op) instead of widening the tile to int32,
  2. zero-point as ONE dot per k-step: corr[gi,m] = sum_k zs[gi,k] x[k,m]
     (zs is constant across the r chunk rows of a group), subtracted once at
     the final grid step — replaces r full-tile VPU subtracts AND the zs
     sublane repeat,
  3. dequant multiply in the meta dtype (bf16 meta -> bf16 mul, half VPU
     element width).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab_ax0_v2.py
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
from hqq_tpu.nn.linear import dequant_matmul
from tools.bench_kernels import time_scan

N, K, L = 4096, 4096, 48


def _cm_v2_kernel(xt_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, corr_ref,
                  *, g, cb, f_rep, out_dtype):
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        corr_ref[:] = jnp.zeros_like(corr_ref)

    r = 8 // cb
    tnr = wq_ref.shape[0]
    cd = scale_ref.dtype
    if f_rep > 1:
        s_rep = pltpu.repeat(scale_ref[:], f_rep, axis=0)
    else:
        s_rep = scale_ref[:]

    for j, cj in enumerate(_unpack_chunks_2d(wq_ref[:], cb)):
        wj = cj.astype(cd) * s_rep
        acc_ref[j * tnr : (j + 1) * tnr] += jax.lax.dot_general(
            wj.astype(xt_ref.dtype), xt_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    corr_ref[:] += jax.lax.dot_general(
        zs_ref[:].astype(xt_ref.dtype), xt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = (
            acc_ref[:] - pltpu.repeat(corr_ref[:], r * f_rep, axis=0)
        ).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("container_bits", "group_size", "n_pad", "k_pad")
)
def _cm_v2_call(xt, wq, scale, zs, *, container_bits, group_size, n_pad, k_pad):
    g, cb = group_size, container_bits
    r = 8 // cb
    step = g // r
    ng = n_pad // g
    m_pad = xt.shape[1]

    target = 1024
    if ng <= target:
        gblk = ng
        f = 1
        for cand in range(step, 0, -1):
            if step % cand == 0 and cand * ng <= target:
                f = cand
                break
    else:
        gblk = _pick_tile_ax0(ng, 8, target)
        f = 1
    tnr = f * gblk
    tk = _pick_tile_ax0(k_pad, 128, 1024)
    n_tiles = (step // f) * (ng // gblk)
    ngb = ng // gblk
    tm = min(m_pad, 256)

    grid = (n_tiles, m_pad // tm, k_pad // tk)
    out = pl.pallas_call(
        functools.partial(_cm_v2_kernel, g=g, cb=cb, f_rep=tnr // gblk,
                          out_dtype=xt.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk, tm), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tnr, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((gblk, tk), lambda i, j, kk: (i % ngb, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((gblk, tk), lambda i, j, kk: (i % ngb, kk), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r * tnr, tm), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((r * tnr, tm), jnp.float32),
            pltpu.VMEM((gblk, tm), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=(m_pad * k_pad * xt.dtype.itemsize + wq.size
                            + scale.size * scale.dtype.itemsize * 2
                            + m_pad * n_pad * xt.dtype.itemsize),
            transcendentals=0,
        ),
    )(xt, wq, scale, zs)
    o6 = out.reshape(step // f, ngb, r, f, gblk, m_pad)
    return o6.transpose(1, 4, 2, 0, 3, 5).reshape(n_pad, m_pad)


def qmm_v2(x, kqt):
    n_out, k = kqt.shape
    g = kqt.group_size
    n_pad = kqt.wq.shape[0] * kqt.r
    k_pad = kqt.wq.shape[1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if k_pad != k:
        x2 = jnp.pad(x2, ((0, 0), (0, k_pad - k)))
    m_pad = _round_up(m, 8) if m <= 256 else _round_up(m, 256)
    xt = jnp.zeros((k_pad, m_pad), x2.dtype).at[:, :m].set(x2.T)
    out_t = _cm_v2_call(xt, kqt.wq, kqt.scale, kqt.zs,
                        container_bits=kqt.container_bits, group_size=g,
                        n_pad=n_pad, k_pad=k_pad)
    y = out_t.T[:m]
    p_blocks = n_out // g
    y3 = y.reshape(m, y.shape[-1] // g, g)[:, :p_blocks, :]
    y = jnp.swapaxes(y3, -1, -2).reshape(m, n_out)
    return y.reshape(*x.shape[:-1], n_out)


def main():
    rng = np.random.default_rng(0)
    w_np = rng.standard_normal((N, K), dtype=np.float32) / 20
    x1 = jnp.asarray(rng.standard_normal((1, K), dtype=np.float32) / 10, jnp.bfloat16)

    def stack(kqt):
        return jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)

    def step_old(w, x):
        return (x + quant_matmul_pallas(x, w)[:, :K] * 1e-6).astype(x.dtype)

    def step_v2(w, x):
        return (x + qmm_v2(x, w)[:, :K] * 1e-6).astype(x.dtype)

    qt1 = quantize(jnp.asarray(w_np), nbits=4, group_size=64, axis=1,
                   round_zero=True, compute_dtype=jnp.bfloat16)
    s1 = stack(to_kernel_layout(qt1))
    floor = time_scan(step_old, s1, x1, iters=4)
    print(f"ax1 4b g64 floor: {floor*1e6:.1f} us")
    del s1

    for nbits, g in ((2, 16), (1, 16), (1, 32)):
        qt = quantize(jnp.asarray(w_np), nbits=nbits, group_size=g, axis=0,
                      compute_dtype=jnp.bfloat16)
        y_ref = dequant_matmul(x1, qt)
        for md in (jnp.bfloat16, jnp.float32):
            kqt = to_kernel_layout_ax0(qt, meta_dtype=md)
            st = stack(kqt)
            t_old = time_scan(step_old, st, x1, iters=4)
            t_v2 = time_scan(step_v2, st, x1, iters=4)
            y2 = qmm_v2(x1, kqt)
            rel = float(jnp.linalg.norm((y2 - y_ref).astype(jnp.float32))
                        / jnp.linalg.norm(y_ref.astype(jnp.float32)))
            print(f"ax0 {nbits}b g{g} meta={md.__name__}: old {t_old*1e6:.1f} "
                  f"v2 {t_v2*1e6:.1f} us ({t_v2/floor:.3f}x floor), relerr {rel:.2e}")
            del st


if __name__ == "__main__":
    main()
