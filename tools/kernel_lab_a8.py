# SPDX-License-Identifier: Apache-2.0
"""Kernel lab: closing the w4a8-vs-int8-ceiling gap at 13B shapes.

Measured (tools/bench_kernels.py, v5e): w4a8 M=1 runs at 62-73% of the
dense-int8 time ceiling at the 7B/13B projection shapes. Two hypotheses:

V1 (chunk-split dots): `_unpack_tile_2d` materializes the full [TK, TN]
   int8 tile (shift, mask, concat, cast) before ONE deep dot — the VPU
   unpack serializes with the MXU dot. Doing one dot per bitfield chunk
   (rhs [TK/r, TN], lhs lane-slice of xp) drops the concat AND gives the
   scheduler independent unpack->dot chains to overlap.

V2 (s=16 tier): k=5120 fails k % (32g) == 0 so the M=1 dispatch falls to
   the s=8/meff=8 path (shallow [64, 512] x [512, TN] dots). 5120 IS a
   multiple of 16g — an s=16 tier doubles the dot depth without K padding.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab_a8.py
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
from hqq_tpu.ops.fused_matmul import (
    to_kernel_layout,
    quant_matmul_pallas_a8,
    quantize_activations_int8,
    _pick_tile_n,
    _round_up,
)
from hqq_tpu.utils.profiling import enable_compile_cache
from tools.bench_kernels import time_scan, HBM_BW

enable_compile_cache()


def _decode_kernel_v1(xp_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, *, g, cb, s, meff):
    """Chunk-split variant of `_qmm_a8_decode_kernel`: one dot per bitfield
    chunk, no concat; unpack of chunk j+1 can overlap the dot of chunk j."""
    kidx = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tn = wq_ref.shape[-1]
    r = 8 // cb
    mask = (1 << cb) - 1
    p3 = wq_ref[:].astype(jnp.int32)  # [TK/r, TN]
    tkr = p3.shape[0]

    part = None
    for j in range(r):
        cj = ((p3 >> (cb * (r - 1 - j))) & mask).astype(jnp.int8) if r > 1 else p3.astype(jnp.int8)
        # lhs lanes for chunk j: xp columns [j*TK/r, (j+1)*TK/r)
        pj = jax.lax.dot_general(
            xp_ref[:, j * tkr:(j + 1) * tkr],
            cj,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        part = pj if part is None else part + pj

    xsum = jnp.sum(xp_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    if meff == 1:
        contrib = part.astype(jnp.float32) * scale_ref[:] - xsum * zs_ref[:]
        acc_ref[:] += jnp.sum(contrib.reshape(8, s // 8, tn), axis=1)
    else:
        part4 = part.reshape(meff, s, tn).astype(jnp.float32)
        contrib = part4 * scale_ref[:][None] - xsum.reshape(meff, s, 1) * zs_ref[:][None]
        acc_ref[:] += jnp.sum(contrib, axis=1)

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("container_bits", "group_size", "k", "n", "s", "meff", "variant"),
)
def _decode_call_lab(x8, wq, scale, zs, *, container_bits, group_size, k, n, s, meff, variant):
    g, cb = group_size, container_bits
    r = 8 // cb
    m = x8.shape[0]
    n_pad = wq.shape[1]
    tk = s * g
    nt = k // tk
    if m != meff:
        x8 = jnp.pad(x8, ((0, meff - m), (0, 0)))

    xg = x8.reshape(meff, nt, s, r, g // r).transpose(1, 0, 3, 2, 4)
    eye = jnp.eye(s, dtype=jnp.int8)
    xp = xg[:, None] * eye[None, :, None, None, :, None]
    xp = xp.transpose(2, 1, 0, 3, 4, 5).reshape(meff * s, k)

    tn = _pick_tile_n(n_pad, 2048 if meff == 1 else 1024)
    grid = (n_pad // tn, nt)
    acc_rows = 8 if meff == 1 else meff
    kern = functools.partial(_decode_kernel_v1, g=g, cb=cb, s=s, meff=meff)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((meff * s, tk), lambda j, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // r, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((acc_rows, tn), lambda j, kk: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((acc_rows, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((acc_rows, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * meff * s * n_pad * k,
            bytes_accessed=meff * s * k + wq.size + scale.size * 8 + acc_rows * n_pad * 4,
            transcendentals=0,
        ),
    )(xp, wq, scale, zs)
    if meff == 1:
        return jnp.sum(out, axis=0, keepdims=True)[:, :n]
    return out[:m, :n]


def lab_matmul(x, kqt, s, meff, variant="v1"):
    lead = x.shape[:-1]
    k_logical, n = kqt.shape
    k_arr = kqt.wq.shape[0] * kqt.r
    x2 = x.reshape(-1, k_logical)
    x8, sx = quantize_activations_int8(x2)
    if k_arr != k_logical:
        x8 = jnp.pad(x8, ((0, 0), (0, k_arr - k_logical)))
    out = _decode_call_lab(
        x8, kqt.wq, kqt.scale, kqt.zs,
        container_bits=kqt.container_bits, group_size=kqt.group_size,
        k=k_arr, n=n, s=s, meff=meff, variant=variant,
    )
    return (out * sx).astype(x.dtype).reshape(*lead, n)


def main():
    print(f"[{jax.devices()[0].device_kind}]")
    rng = np.random.default_rng(0)
    g = 64

    shapes = [(11008, 4096), (4096, 4096), (13824, 5120), (5120, 13824)]
    for (n, k) in shapes:
        L = max(6, int(48 * 4096 * 4096 / (n * k)))
        w_np = rng.standard_normal((n, k), dtype=np.float32) / 20
        x1 = jnp.asarray(rng.standard_normal((1, k), dtype=np.float32) / 10, jnp.bfloat16)
        qt = quantize(jnp.asarray(w_np), nbits=4, group_size=g, axis=1,
                      round_zero=True, compute_dtype=jnp.bfloat16)
        pad32 = -(-k // (32 * g)) * 32 * g
        pad_groups = 32 if (pad32 - k) * 8 <= k else 8
        kqt = to_kernel_layout(qt, pad_k_groups=pad_groups)
        k_arr = kqt.wq.shape[0] * kqt.r
        bytes_q = kqt.wq.size + kqt.scale.size * 4 + kqt.zs.size * 4

        # correctness vs production
        y_ref = quant_matmul_pallas_a8(x1, kqt)

        configs = []
        if k_arr % (32 * g) == 0:
            configs.append(("s32", 32, 1))
        if k_arr % (16 * g) == 0:
            configs.append(("s16", 16, 1))
        configs.append(("s8m8", 8, 8))

        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)

        def prod_step(w, x):
            y = quant_matmul_pallas_a8(x, w).astype(jnp.float32)
            mm = min(k, y.shape[-1])
            return (x + jnp.pad(y[:, :mm] * 1e-6, ((0, 0), (0, k - mm)))).astype(x.dtype)

        t0 = time_scan(prod_step, stacked, x1, iters=4)
        print(f"[{k}x{n}] production: {t0*1e6:.1f}us ({bytes_q/HBM_BW/t0*100:.0f}% roofline)")

        for tag, s, meff in configs:
            y_v = lab_matmul(x1, kqt, s, meff)
            err = float(jnp.max(jnp.abs(y_v.astype(jnp.float32) - y_ref.astype(jnp.float32))))
            rel = err / float(jnp.max(jnp.abs(y_ref.astype(jnp.float32))) + 1e-9)

            def v_step(w, x, s=s, meff=meff):
                y = lab_matmul(x, w, s, meff).astype(jnp.float32)
                mm = min(k, y.shape[-1])
                return (x + jnp.pad(y[:, :mm] * 1e-6, ((0, 0), (0, k - mm)))).astype(x.dtype)

            t = time_scan(v_step, stacked, x1, iters=4)
            print(f"  v1-{tag}: {t*1e6:.1f}us ({bytes_q/HBM_BW/t*100:.0f}% roofline) "
                  f"[relerr {rel:.2e}]")
        del stacked


if __name__ == "__main__":
    main()
