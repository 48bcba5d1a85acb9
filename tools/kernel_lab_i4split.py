# SPDX-License-Identifier: Apache-2.0
"""Lab: exact int4-operand decode kernel via nibble-split lhs.

kernel_lab_int4.py showed int4 x int4 MXU dots run 1.13-1.46x faster than the
production w4a8 path (the MXU consumes half the weight bytes), but int8 lhs x
int4 rhs does not compile. To keep int8 activation exactness with int4
operands, split the class-replicated lhs xp into nibble row-blocks stacked on
M (M is nearly free at decode sizes: one rhs pass serves up to 128 rows):

  B. clamp119: x8 in [-119,119] => x = 16h + l with h,l in [-8,7]; stacked
     [2R, K] lhs, one dot, epilogue 16*hi + lo.  (~6.7% coarser activations)
  D. exact3: x = 16h + (l-8) + 8*mask with l = x & 15 in [0,15]; stacked
     [3R, K] lhs (h, l-8, mask), one dot, epilogue 16*a + b + 8*c. Exact
     for all int8.
  A. uint4lo: x = 16h + l, lhs-lo cast to uint4 (if Mosaic takes mixed
     uint4 x int4 dots), two dots.

Each candidate is verified against the int32 reference before timing.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab_i4split.py [NxK ...]
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


def _kernel(xp_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref, *, g, s, mode):
    kidx = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tn = wq_ref.shape[-1]
    c4 = pltpu.bitcast(wq_ref[:], jnp.int4)  # [TK, TN] signed codes (c-8)
    R = s  # meff == 1
    if mode == "prod":
        part = jax.lax.dot_general(
            xp_ref[:], c4.astype(jnp.int8), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        xsum = jnp.sum(xp_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    elif mode == "clamp119":
        p2 = jax.lax.dot_general(
            xp_ref[:].astype(jnp.int4), c4, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        part = 16 * p2[:R] + p2[R:]
        xs = jnp.sum(xp_ref[:].astype(jnp.float32), axis=1, keepdims=True)
        xsum = 16.0 * xs[:R] + xs[R:]
    elif mode == "exact3":
        p3 = jax.lax.dot_general(
            xp_ref[:].astype(jnp.int4), c4, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        part = 16 * p3[:R] + p3[R:2 * R] + 8 * p3[2 * R:]
        xs = jnp.sum(xp_ref[:].astype(jnp.float32), axis=1, keepdims=True)
        xsum = 16.0 * xs[:R] + xs[R:2 * R] + 8.0 * xs[2 * R:]
    elif mode == "uint4lo":
        ph = jax.lax.dot_general(
            xp_ref[:R].astype(jnp.int4), c4, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        plo = jax.lax.dot_general(
            xp_ref[R:].astype(jnp.uint4), c4, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        part = 16 * ph + plo
        xs = jnp.sum(xp_ref[:].astype(jnp.float32), axis=1, keepdims=True)
        xsum = 16.0 * xs[:R] + xs[R:]
    contrib = part.astype(jnp.float32) * scale_ref[:] - xsum * zs_ref[:]
    acc_ref[:] += jnp.sum(contrib.reshape(8, s // 8, tn), axis=1)

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("g", "s", "k", "n", "tn", "mode"))
def call(xp, wq, scale, zs, *, g, s, k, n, tn, mode):
    rows = xp.shape[0]
    tk = s * g
    grid = (-(-n // tn), k // tk)
    out = pl.pallas_call(
        functools.partial(_kernel, g=g, s=s, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, tk), lambda j, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda j, kk: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * n * k,
            bytes_accessed=rows * k + wq.size + scale.size * 8 + 8 * n * 4,
            transcendentals=0,
        ),
    )(xp, wq, scale, zs)
    return jnp.sum(out, axis=0, keepdims=True)


def build_lhs(x8, s, g, mode):
    """Class-replicated nibble row blocks, natural k order."""
    k = x8.shape[1]
    nt = k // (s * g)
    xi = x8.astype(jnp.int32)
    if mode == "prod":
        blocks = [xi]
    elif mode in ("clamp119", "uint4lo"):
        lo = ((xi & 15) ^ 8) - 8
        hi = (xi - lo) >> 4
        if mode == "uint4lo":
            lo = xi & 15
            hi = xi >> 4
        blocks = [hi, lo]
    elif mode == "exact3":
        lo = (xi & 15) - 8
        hi = xi >> 4
        blocks = [hi, lo, jnp.ones_like(xi)]
    eye = jnp.eye(s, dtype=jnp.int8)
    reps = []
    for bvals in blocks:
        xg = bvals.astype(jnp.int8).reshape(1, nt, s, g).transpose(1, 0, 2, 3)
        xp = xg[:, None] * eye[None, :, None, :, None]
        reps.append(xp.transpose(2, 1, 0, 3, 4).reshape(s, k))
    return jnp.concatenate(reps, axis=0)


def main():
    print(f"[{jax.devices()[0].device_kind}]")
    rng = np.random.default_rng(0)
    shapes = [(4096, 4096), (28672, 8192), (11008, 4096), (22016, 4096),
              (13824, 5120), (5120, 13824)]
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
        assert kqt.bc4
        k_arr = kqt.wq.shape[0] * 2
        n_pad = kqt.wq.shape[1]
        s = 32 if k_arr % (32 * g) == 0 else 16
        tn, _ = fm._a8_tile_plan(n_pad, 4096)
        print(f"=== {k}x{n} k_arr={k_arr} n_pad={n_pad} s={s} tn={tn} (L={L}) ===")

        x = rng.standard_normal((1, k), dtype=np.float32) / 10
        x[0, 0] = 1.27  # force a 127-code activation (clamp119 worst case)
        xf = jnp.asarray(x, jnp.float32)

        # reference: x8 @ W_dq^T with the SAME x8 the candidate consumed
        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)
        for mode in ("prod", "clamp119", "exact3", "uint4lo"):
            maxq = 119.0 if mode == "clamp119" else 127.0
            sx = jnp.max(jnp.abs(xf)) / maxq
            x8 = jnp.clip(jnp.round(xf / sx), -maxq, maxq).astype(jnp.int8)
            if k_arr != k:
                x8p = jnp.pad(x8, ((0, 0), (0, k_arr - k)))
            else:
                x8p = x8
            xp = build_lhs(x8p, s, g, mode)
            codes = np.asarray(fm.unpack_codes_host(kqt), np.int64)  # signed c-8
            # exact float reference via scale/zs epilogue:
            sc = np.asarray(kqt.scale, np.float64).repeat(g, 0)
            zz = np.asarray(kqt.zs, np.float64).repeat(g, 0)
            wt = codes * sc - zz  # [k_arr, n_pad] dequant (signed form)
            ref = np.asarray(x8p, np.float64) @ wt

            try:
                y = np.asarray(call(xp, kqt.wq, kqt.scale, kqt.zs, g=g, s=s,
                                    k=k_arr, n=n_pad, tn=tn, mode=mode),
                               np.float64)
            except Exception as e:
                print(f"  {mode}: FAIL {type(e).__name__}: {str(e)[:140]}")
                continue
            rel = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-9)
            ok = "OK " if rel < 1e-5 else f"ERR rel={rel:.2e}"

            def step(w, xv, mode=mode, s=s, tn=tn):
                x8v = jnp.round(xv.astype(jnp.float32) * maxq).astype(jnp.int8)
                xpv = build_lhs(jnp.pad(x8v, ((0, 0), (0, k_arr - k))) if k_arr != k else x8v,
                                s, g, mode)
                y_ = call(xpv, w.wq, w.scale, w.zs, g=g, s=s, k=k_arr,
                          n=n_pad, tn=tn, mode=mode)
                mm = min(k, y_.shape[-1])
                return (xv + jnp.pad(y_[:, :mm] * 1e-6, ((0, 0), (0, k - mm)))).astype(xv.dtype)

            xb = jnp.asarray(x / np.abs(x).max(), jnp.bfloat16)
            t = time_scan(step, stacked, xb, iters=4)
            bytes_q = kqt.wq.size + kqt.scale.size * 8
            print(f"  {mode:9s} [{ok}] {t*1e6:7.1f}us "
                  f"({bytes_q/HBM_BW/t*100:.0f}% byte roofline)")
        del stacked


if __name__ == "__main__":
    main()
