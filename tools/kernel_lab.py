# SPDX-License-Identifier: Apache-2.0
"""Kernel laboratory: prototype fused dequant-matmul variants and race them
on the real chip against the production kernel.

Variants:
  A: production kernel (unpack -> fp32 affine -> bf16 dot)
  B: bf16 affine + zero-correction as a rank-(K/g) MXU dot (no zs broadcast)
  C: group-batched MXU dots on raw codes; scale in a tiny partials epilogue,
     zero via the same rank-(K/g) correction — VPU work per element drops to
     shift+and+convert.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hqq_tpu.core.quantize import quantize
from hqq_tpu.ops.fused_matmul import (
    _pick_tile_k,
    _round_up,
    quant_matmul_pallas,
    to_kernel_layout,
)

HBM_BW = 819e9


# ---------------------------------------------------------------------------
# Variant B: bf16 affine, rank-(K/g) zero correction on the MXU
# ---------------------------------------------------------------------------


def _kernel_b(x_ref, xg_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, *, g, cb, out_dtype):
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    r = 8 // cb
    mask = (1 << cb) - 1
    tn = wq_ref.shape[-1]
    tkr = wq_ref.shape[0]
    n_groups = tkr * r // g
    p3 = wq_ref[:].reshape(n_groups, g // r, tn).astype(jnp.int32)
    chunks = [(p3 >> (cb * (r - 1 - j))) & mask for j in range(r)]
    c3 = jnp.concatenate(chunks, axis=1) if r > 1 else chunks[0]
    # bf16 affine WITHOUT zs: w = c * s  (zero folded out via rank-K/g dot)
    w3 = c3.astype(jnp.bfloat16) * scale_ref[:][:, None, :].astype(jnp.bfloat16)
    w = w3.reshape(n_groups * g, tn)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w.astype(x_ref.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # zero correction ONCE per output tile: acc -= xg @ zs (full-K blocks)
    @pl.when(kidx == 0)
    def _():
        acc_ref[:] -= jax.lax.dot_general(
            xg_ref[:], zs_ref[:].astype(xg_ref.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


# ---------------------------------------------------------------------------
# Variant C: group-batched dots on codes, scale epilogue on partials
# ---------------------------------------------------------------------------


def _kernel_c(x_ref, xg_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, *, g, cb, out_dtype):
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    r = 8 // cb
    mask = (1 << cb) - 1
    tn = wq_ref.shape[-1]
    tm = x_ref.shape[0]
    tkr = wq_ref.shape[0]
    n_groups = tkr * r // g
    step = g // r

    p3 = wq_ref[:].reshape(n_groups, step, tn).astype(jnp.int32)
    x3 = x_ref[:].reshape(tm, n_groups, g).transpose(1, 0, 2)  # [G, TM, g]

    partial = None
    for j in range(r):
        cj = ((p3 >> (cb * (r - 1 - j))) & mask).astype(jnp.bfloat16)
        xj = x3[:, :, j * step : (j + 1) * step]  # [G, TM, step]
        d = jax.lax.dot_general(
            xj, cj,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, TM, tn]
        partial = d if partial is None else partial + d

    # scale epilogue on partials (tiny: G*TM*tn) then zero correction dot
    acc_ref[:] += jnp.sum(partial * scale_ref[:][:, None, :], axis=0)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] -= jax.lax.dot_general(
            xg_ref[:], zs_ref[:].astype(xg_ref.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)




# ---------------------------------------------------------------------------
# Variant D: split dot per bitfield chunk — NO concat; per-element ops are
# shift+and+convert+scale-mul; zero via rank-(K/g) correction at kidx==0.
# ---------------------------------------------------------------------------


def _kernel_d(x_ref, xg_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, *, g, cb, out_dtype, scale_bf16):
    kidx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    r = 8 // cb
    mask = (1 << cb) - 1
    tn = wq_ref.shape[-1]
    tm = x_ref.shape[0]
    tkr = wq_ref.shape[0]
    n_groups = tkr * r // g
    step = g // r

    p3 = wq_ref[:].reshape(n_groups, step, tn).astype(jnp.int32)
    s3 = scale_ref[:][:, None, :]
    if scale_bf16:
        s3 = s3.astype(jnp.bfloat16)
    x3 = x_ref[:].reshape(tm, n_groups, g)

    for j in range(r):
        cj = (p3 >> (cb * (r - 1 - j))) & mask if j < r - 1 else p3 & mask
        if scale_bf16:
            wj = cj.astype(jnp.bfloat16) * s3
        else:
            wj = (cj.astype(jnp.float32) * s3).astype(jnp.bfloat16)
        wj = wj.reshape(n_groups * step, tn)
        xj = x3[:, :, j * step : (j + 1) * step].reshape(tm, n_groups * step)
        acc_ref[:] += jax.lax.dot_general(
            xj, wj.astype(xj.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] -= jax.lax.dot_general(
            xg_ref[:], zs_ref[:].astype(xg_ref.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def make_variant(kernel_fn):
    @functools.partial(jax.jit, static_argnames=("cb", "g", "k", "n"))
    def call(x, wq, scale, zs, *, cb, g, k, n):
        r = 8 // cb
        m = x.shape[0]
        n_pad = wq.shape[1]
        tm = min(_round_up(m, 16), 256)
        tn = min(n_pad, 256)
        while n_pad % tn:
            tn //= 2
        tk = _pick_tile_k(k, g)
        m_pad = _round_up(m, tm)
        if m_pad != m:
            x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
        # per-group x sums for the zero-correction term
        xg = x.reshape(m_pad, k // g, g).sum(axis=2).astype(x.dtype)  # [M, K/g]

        grid = (m_pad // tm, n_pad // tn, k // tk)
        out = pl.pallas_call(
            functools.partial(kernel_fn, g=g, cb=cb, out_dtype=x.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, k // g), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tk // r, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((tk // g, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((k // g, tn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        )(x, xg, wq, scale, zs)
        return out[:m, :n]

    return call


def time_scan(step, stacked, x0, iters=6, n1=2, n2=10):
    L = jax.tree_util.tree_leaves(stacked)[0].shape[0]

    def sweep(x, ws):
        return jax.lax.scan(lambda c, w: (step(w, c), None), x, ws)[0]

    @jax.jit
    def run(ws, x, n):
        return jax.lax.fori_loop(0, n, lambda i, c: sweep(c, ws), x)

    def best_time(n):
        np.asarray(run(stacked, x0, n))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(run(stacked, x0, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_time(n2) - best_time(n1)) / ((n2 - n1) * L)


def main():
    print(jax.devices())
    M, K, N, L = 8, 4096, 4096, 48
    rng = np.random.default_rng(0)
    w_np = rng.standard_normal((N, K), dtype=np.float32) / 20
    x0 = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32) / 10, jnp.bfloat16)

    for nbits, g in ((4, 64), (2, 64), (8, 64)):
        qt = quantize(jnp.asarray(w_np), nbits=nbits, group_size=g, axis=1,
                      round_zero=(nbits == 4), compute_dtype=jnp.bfloat16)
        kqt = to_kernel_layout(qt)
        cb = kqt.container_bits
        bytes_q = kqt.wq.size + kqt.scale.size * 4 + kqt.zs.size * 4
        roof = bytes_q / HBM_BW * 1e6

        # correctness refs
        y_ref = np.asarray(quant_matmul_pallas(x0, kqt)).astype(np.float32)

        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)

        def prod_step(kq, x):
            y = quant_matmul_pallas(x, kq)
            return (x + y[:, :K] * 1e-6).astype(x.dtype)

        t = time_scan(prod_step, stacked, x0)
        print(f"[{nbits}b g{g}] A(prod): {t*1e6:6.1f} us  (roofline {roof:.1f} us, eff {roof/t/1e6*100:.0f}%)")

        import functools as _ft
        for name, kern in (
            ("B", _kernel_b),
            ("D/f32s", _ft.partial(_kernel_d, scale_bf16=False)),
            ("D/bf16s", _ft.partial(_kernel_d, scale_bf16=True)),
        ):
            call = make_variant(kern)
            try:
                y = call(x0, kqt.wq, kqt.scale, kqt.zs, cb=cb, g=g,
                         k=kqt.wq.shape[0] * (8 // cb), n=N)
                err = np.abs(np.asarray(y).astype(np.float32) - y_ref).max()
                rel = err / (np.abs(y_ref).max() + 1e-9)
                raw = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L),
                                             (kqt.wq, kqt.scale, kqt.zs))

                def step(wz, x, _call=call):
                    wq, sc, zs = wz
                    y = _call(x, wq, sc, zs, cb=cb, g=g, k=wq.shape[0] * (8 // cb), n=N)
                    return (x + y[:, :K] * 1e-6).astype(x.dtype)

                t = time_scan(step, raw, x0)
                print(f"[{nbits}b g{g}] {name}:       {t*1e6:6.1f} us  (rel err {rel:.2e}, eff {roof/t/1e6*100:.0f}%)")
            except Exception as e:
                print(f"[{nbits}b g{g}] {name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
