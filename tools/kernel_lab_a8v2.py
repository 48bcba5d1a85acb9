# SPDX-License-Identifier: Apache-2.0
"""Kernel lab round 4: close the w4a8 -> dense-int8-ceiling gap.

BENCH_r03: w4a8 M=1 at 66-75% of the same-run dense-int8 time at 7B/13B
shapes. Hypothesis (r3): the VPU unpack serializes with the MXU dot inside
each grid step. Estimated VPU unpack cost at 4096x11008 (~2.5-3 widened
int32 ops/weight) is ~30-40us -- matching the measured 33us gap.

This lab decomposes and attacks:

  feed : dot-from-frozen-scratch -- streams the same packed HBM bytes,
         runs the same dot+epilogue, skips per-step unpack. The kernel's
         own MXU-feed ceiling (what perfect overlap would give).
  unp  : unpack-to-scratch only, no dot. The VPU floor.
  v3   : bitcast nibble unpack (int32-lane: 4 packed bytes per VPU op
         instead of widening each byte to its own lane) + same one-dot
         structure as production.
  v4   : v3 unpack + one dot per bitfield chunk (no concat) -- retests
         r3's failed chunk-split with the cheap unpack.
  v5   : flat-grid software pipeline: at step t the MXU dots tile t-1
         from a double-buffered VMEM int8 scratch while the VPU unpacks
         tile t into the other slot. Unpack and dot overlap across the
         ENTIRE weight sweep, not per-K-slice.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab_a8v2.py
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
    _unpack_tile_2d,
    _round_up,
)
from hqq_tpu.utils.profiling import enable_compile_cache
from tools.bench_kernels import time_scan, HBM_BW

enable_compile_cache()


def _rep_mask(cb: int) -> jnp.int32:
    return jnp.int32(((1 << cb) - 1) * 0x01010101)


def _bitcast_chunks(p_u8, cb: int):
    """Nibble/crumb extraction at 4 packed bytes per lane op. Returns the r
    int8 chunk tiles (same shape as p_u8) in chunk order (high field first),
    matching `_unpack_tile_2d`'s concat order."""
    r = 8 // cb
    if r == 1:
        return [p_u8.astype(jnp.int8)]
    q32 = pltpu.bitcast(p_u8, jnp.int32)
    m = _rep_mask(cb)
    out = []
    for j in range(r):
        sh = cb * (r - 1 - j)
        w = jax.lax.shift_right_logical(q32, sh) if sh else q32
        out.append(pltpu.bitcast(w & m, jnp.int8))
    return out


# ---------------------------------------------------------------- v3 / v4
def _decode_kernel_v3(xp_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref,
                      *, g, cb, s, split):
    kidx = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tn = wq_ref.shape[-1]
    tkr = wq_ref.shape[0]
    chunks = _bitcast_chunks(wq_ref[:], cb)
    if split:  # v4: one dot per chunk, no concat
        part = None
        for j, cj in enumerate(chunks):
            pj = jax.lax.dot_general(
                xp_ref[:, j * tkr:(j + 1) * tkr], cj,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            part = pj if part is None else part + pj
    else:  # v3: concat then one deep dot (production structure)
        c8 = jnp.concatenate(chunks, axis=0)
        part = jax.lax.dot_general(
            xp_ref[:], c8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    xsum = jnp.sum(xp_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    contrib = part.astype(jnp.float32) * scale_ref[:] - xsum * zs_ref[:]
    acc_ref[:] += jnp.sum(contrib.reshape(8, s // 8, tn), axis=1)

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


# ------------------------------------------------------------ feed / unp
def _decode_kernel_feed(xp_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref,
                        scr_ref, *, g, cb, s, mode):
    """mode='feed': unpack only at kidx==0, dot a frozen scratch every step.
    mode='unp': unpack every step into scratch, no dot (acc consumes 8 rows
    so nothing dead-codes)."""
    kidx = pl.program_id(1)
    nk = pl.num_programs(1)
    tn = wq_ref.shape[-1]
    tkr = wq_ref.shape[0]
    r = 8 // cb

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if mode == "feed":
        @pl.when(kidx == 0)
        def _():
            chunks = _bitcast_chunks(wq_ref[:], cb)
            for j, cj in enumerate(chunks):
                scr_ref[j * tkr:(j + 1) * tkr] = cj
        part = jax.lax.dot_general(
            xp_ref[:], scr_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        xsum = jnp.sum(xp_ref[:].astype(jnp.float32), axis=1, keepdims=True)
        contrib = part.astype(jnp.float32) * scale_ref[:] - xsum * zs_ref[:]
        acc_ref[:] += jnp.sum(contrib.reshape(8, s // 8, tn), axis=1)
    else:  # unp
        chunks = _bitcast_chunks(wq_ref[:], cb)
        for j, cj in enumerate(chunks):
            scr_ref[j * tkr:(j + 1) * tkr] = cj
        acc_ref[:] += scr_ref[:8].astype(jnp.float32) * scale_ref[:8, :]

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _decode_kernel_unp_slow(xp_ref, wq_ref, scale_ref, zs_ref, out_ref,
                            acc_ref, scr_ref, *, g, cb, s, mode):
    """unpack-only with the PRODUCTION widened-int32 unpack, for the VPU
    cost comparison against the bitcast unpack."""
    kidx = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kidx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    c8 = _unpack_tile_2d(wq_ref[:], cb)
    scr_ref[:] = c8
    acc_ref[:] += scr_ref[:8].astype(jnp.float32) * scale_ref[:8, :]

    @pl.when(kidx == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("container_bits", "group_size", "k", "n", "s", "variant", "tn_target"),
)
def _lab_call(x8, wq, scale, zs, *, container_bits, group_size, k, n, s,
              variant, tn_target=2048):
    g, cb = group_size, container_bits
    r = 8 // cb
    m = x8.shape[0]
    assert m == 1
    n_pad = wq.shape[1]
    tk = s * g
    nt = k // tk

    xg = x8.reshape(1, nt, s, r, g // r).transpose(1, 0, 3, 2, 4)
    eye = jnp.eye(s, dtype=jnp.int8)
    xp = xg[:, None] * eye[None, :, None, None, :, None]
    xp = xp.transpose(2, 1, 0, 3, 4, 5).reshape(s, k)

    if variant.endswith("r"):  # ragged last N tile (Pallas clamps the block)
        variant = variant[:-1]
        tn = min(tn_target, n_pad)
        grid = (-(-n_pad // tn), nt)
    else:
        tn = _pick_tile_n(n_pad, tn_target)
        grid = (n_pad // tn, nt)

    if variant in ("v3", "v4"):
        kern = functools.partial(_decode_kernel_v3, g=g, cb=cb, s=s,
                                 split=(variant == "v4"))
        scratch = [pltpu.VMEM((8, tn), jnp.float32)]
    elif variant in ("feed", "unp", "unp_slow"):
        kfun = _decode_kernel_unp_slow if variant == "unp_slow" else _decode_kernel_feed
        kern = functools.partial(kfun, g=g, cb=cb, s=s,
                                 mode=("feed" if variant == "feed" else "unp"))
        scratch = [pltpu.VMEM((8, tn), jnp.float32),
                   pltpu.VMEM((tk, tn), jnp.int8)]
    else:
        raise ValueError(variant)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, tk), lambda j, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // r, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda j, kk: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * s * n_pad * k,
            bytes_accessed=s * k + wq.size + scale.size * 8 + 8 * n_pad * 4,
            transcendentals=0,
        ),
    )(xp, wq, scale, zs)
    return jnp.sum(out, axis=0, keepdims=True)[:, :n]


# ------------------------------------------------------------------- v5
def _decode_kernel_v5(xp_ref, wq_ref, scale_ref, zs_ref, out_ref, acc_ref,
                      scr_ref, *, g, cb, s, nt):
    """Flat-grid software pipeline (see module doc). Step t: dot tile t-1
    from scr[(t-1)%2], unpack tile t into scr[t%2]. The dot is issued FIRST
    so the MXU stream and the VPU unpack of the next tile can overlap."""
    t = pl.program_id(0)
    total = pl.num_programs(0)
    tn = out_ref.shape[-1]
    tkr = wq_ref.shape[0]
    r = 8 // cb

    @pl.when(t > 0)
    def _():
        d = t - 1
        c8 = scr_ref[d % 2]
        part = jax.lax.dot_general(
            xp_ref[:], c8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        xsum = jnp.sum(xp_ref[:].astype(jnp.float32), axis=1, keepdims=True)
        contrib = part.astype(jnp.float32) * scale_ref[:] - xsum * zs_ref[:]
        folded = jnp.sum(contrib.reshape(8, s // 8, tn), axis=1)
        first = (d % nt) == 0
        acc_ref[:] = jnp.where(first, folded, acc_ref[:] + folded)

        @pl.when(d % nt == nt - 1)
        def _():
            out_ref[:] = acc_ref[:]

    @pl.when(t < total - 1)
    def _():
        chunks = _bitcast_chunks(wq_ref[:], cb)
        for j, cj in enumerate(chunks):
            scr_ref[t % 2, j * tkr:(j + 1) * tkr] = cj


@functools.partial(
    jax.jit,
    static_argnames=("container_bits", "group_size", "k", "n", "s", "tn_target"),
)
def _lab_call_v5(x8, wq, scale, zs, *, container_bits, group_size, k, n, s,
                 tn_target=2048):
    g, cb = group_size, container_bits
    r = 8 // cb
    assert x8.shape[0] == 1
    n_pad = wq.shape[1]
    tk = s * g
    nt = k // tk

    xg = x8.reshape(1, nt, s, r, g // r).transpose(1, 0, 3, 2, 4)
    eye = jnp.eye(s, dtype=jnp.int8)
    xp = xg[:, None] * eye[None, :, None, None, :, None]
    xp = xp.transpose(2, 1, 0, 3, 4, 5).reshape(s, k)

    tn = _pick_tile_n(n_pad, tn_target)
    nj = n_pad // tn
    total = nj * nt + 1

    def u_idx(t):  # tile being unpacked at step t
        u = jnp.minimum(t, total - 2)
        return u // nt, u % nt

    def d_idx(t):  # tile being dotted at step t
        d = jnp.maximum(t - 1, 0)
        return d // nt, d % nt

    out = pl.pallas_call(
        functools.partial(_decode_kernel_v5, g=g, cb=cb, s=s, nt=nt),
        grid=(total,),
        in_specs=[
            pl.BlockSpec((s, tk), lambda t: (0, d_idx(t)[1]), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // r, tn),
                         lambda t: (u_idx(t)[1], u_idx(t)[0]), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn),
                         lambda t: (d_idx(t)[1], d_idx(t)[0]), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tn),
                         lambda t: (d_idx(t)[1], d_idx(t)[0]), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda t: (0, d_idx(t)[0]),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, tn), jnp.float32),
            pltpu.VMEM((2, tk, tn), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * s * n_pad * k,
            bytes_accessed=s * k + wq.size + scale.size * 8 + 8 * n_pad * 4,
            transcendentals=0,
        ),
    )(xp, wq, scale, zs)
    return jnp.sum(out, axis=0, keepdims=True)[:, :n]


def lab_matmul(x, kqt, s, variant, tn_target=2048):
    lead = x.shape[:-1]
    k_logical, n = kqt.shape
    k_arr = kqt.wq.shape[0] * kqt.r
    x2 = x.reshape(-1, k_logical)
    x8, sx = quantize_activations_int8(x2)
    if k_arr != k_logical:
        x8 = jnp.pad(x8, ((0, 0), (0, k_arr - k_logical)))
    fn = _lab_call_v5 if variant == "v5" else functools.partial(_lab_call, variant=variant)
    out = fn(x8, kqt.wq, kqt.scale, kqt.zs,
             container_bits=kqt.container_bits, group_size=kqt.group_size,
             k=k_arr, n=n, s=s, tn_target=tn_target)
    return (out * sx).astype(x.dtype).reshape(*lead, n)


# pass3 finals: per-shape candidates (variant, tn_target, forced pad_groups)
PASS3 = {
    (4096, 4096): [("v3", 4096, None), ("v4", 4096, None)],
    (11008, 4096): [("v4r", 4096, None), ("v3r", 4096, None), ("v4r", 8192, None)],
    (4096, 11008): [("v3", 4096, None), ("v3", 4096, 8), ("v4", 4096, 8)],
    (13824, 5120): [("v3", 4096, None), ("v4", 2048, None), ("v4", 4096, None)],
    (5120, 13824): [("v3", 4096, None), ("v4", 4096, None), ("v3", 8192, None)],
}


def main():
    print(f"[{jax.devices()[0].device_kind}]")
    rng = np.random.default_rng(0)
    g = 64

    shapes = [(4096, 4096), (11008, 4096), (4096, 11008), (13824, 5120), (5120, 13824)]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for (n, k) in shapes:
        if only and f"{k}x{n}" != only:
            continue
        L = max(6, int(48 * 4096 * 4096 / (n * k)))
        w_np = rng.standard_normal((n, k), dtype=np.float32) / 20
        x1 = jnp.asarray(rng.standard_normal((1, k), dtype=np.float32) / 10, jnp.bfloat16)
        qt = quantize(jnp.asarray(w_np), nbits=4, group_size=g, axis=1,
                      round_zero=True, compute_dtype=jnp.bfloat16)
        pad32 = -(-k // (32 * g)) * 32 * g
        pad_groups = 32 if (pad32 - k) * 8 <= k else 8
        kqt = to_kernel_layout(qt, pad_k_groups=pad_groups)
        k_arr = kqt.wq.shape[0] * kqt.r
        s = 32 if k_arr % (32 * g) == 0 else (16 if k_arr % (16 * g) == 0 else 8)
        bytes_q = kqt.wq.size + kqt.scale.size * 4 + kqt.zs.size * 4

        # dense int8 ceiling, same run
        w8 = jnp.stack([jnp.asarray(np.round(w_np * 100).astype(np.int8))] * L)

        def int8_step(w, x):
            xf = x.astype(jnp.float32)
            sxx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
            xq = jnp.round(xf / jnp.maximum(sxx, 1e-8)).astype(jnp.int8)
            acc = jax.lax.dot_general(xq, w, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * sxx
            mm = min(k, y.shape[-1])
            return (x + jnp.pad(y[:, :mm] * 1e-6, ((0, 0), (0, k - mm)))).astype(x.dtype)

        t8 = time_scan(int8_step, w8, x1, iters=4)
        del w8
        print(f"[{k}x{n}] s={s} dense-int8 ceiling: {t8*1e6:.1f}us "
              f"(byte roofline {bytes_q/HBM_BW*1e6:.1f}us)")

        y_ref = quant_matmul_pallas_a8(x1, kqt)
        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)

        def prod_step(w, x):
            y = quant_matmul_pallas_a8(x, w).astype(jnp.float32)
            mm = min(k, y.shape[-1])
            return (x + jnp.pad(y[:, :mm] * 1e-6, ((0, 0), (0, k - mm)))).astype(x.dtype)

        t0 = time_scan(prod_step, stacked, x1, iters=4)
        print(f"  prod: {t0*1e6:.1f}us  ({t8/t0*100:.0f}% of int8 ceiling)")

        mode = sys.argv[2] if len(sys.argv) > 2 else ""
        if mode == "pass2":
            combos = [(v, t, None) for v, t in
                      [("v3", 4096), ("v4", 4096), ("v3", 8192), ("v4", 8192),
                       ("v3r", 2048), ("v3r", 4096), ("v4r", 2048), ("v4r", 4096)]]
        elif mode == "pass3":
            combos = PASS3[(n, k)]
        else:
            combos = [(v, t, None) for v, t in
                      [("v3", 2048), ("v3", 4096), ("v3r", 2048), ("v4", 2048),
                       ("feed", 2048), ("unp", 2048), ("unp_slow", 2048)]]
            if n % 2048 == 0:
                combos = [c for c in combos if c[0] != "v3r"]
        kqt_p8 = None
        for variant, tn_target, force_pad in combos:
            if force_pad is not None and force_pad != pad_groups:
                if kqt_p8 is None:
                    kqt_p8 = to_kernel_layout(qt, pad_k_groups=force_pad)
                    stacked_p8 = jax.tree_util.tree_map(
                        lambda a: jnp.stack([a] * L), kqt_p8)
                use_kqt, use_stacked = kqt_p8, stacked_p8
            else:
                use_kqt, use_stacked = kqt, stacked
            use_s = (32 if (use_kqt.wq.shape[0] * use_kqt.r) % (32 * g) == 0
                     else 16)
            if True:
                try:
                    y_v = lab_matmul(x1, use_kqt, use_s, variant, tn_target)
                except Exception as e:
                    print(f"  {variant}/tn{tn_target}: FAILED {type(e).__name__}: {str(e)[:160]}")
                    continue
                if variant not in ("feed", "unp", "unp_slow"):
                    err = float(jnp.max(jnp.abs(y_v.astype(jnp.float32) - y_ref.astype(jnp.float32))))
                    rel = err / float(jnp.max(jnp.abs(y_ref.astype(jnp.float32))) + 1e-9)
                    tag_err = f" [relerr {rel:.2e}]"
                    if rel > 1e-3:
                        tag_err += " <-- WRONG"
                else:
                    tag_err = ""

                def v_step(w, x, variant=variant, tn_target=tn_target, use_s=use_s):
                    y = lab_matmul(x, w, use_s, variant, tn_target).astype(jnp.float32)
                    mm = min(k, y.shape[-1])
                    return (x + jnp.pad(y[:, :mm] * 1e-6, ((0, 0), (0, k - mm)))).astype(x.dtype)

                t = time_scan(v_step, use_stacked, x1, iters=4)
                ptag = f"/pad{force_pad}" if force_pad is not None else ""
                print(f"  {variant}/tn{tn_target}{ptag}: {t*1e6:.1f}us  "
                      f"({t8/t*100:.0f}% of int8 ceiling){tag_err}")
        del stacked


if __name__ == "__main__":
    main()
