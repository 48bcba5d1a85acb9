# SPDX-License-Identifier: Apache-2.0
"""Autotune the w4a8 decode-kernel tile plans on the real chip.

The best (class tier s, dot structure, N-tile) combination is shape-dependent
(see `fused_matmul._A8_PLANS`); this tool measures the candidate set for each
requested weight shape with the production dispatch and registers/prints the
winners — the role gemlite's kernel autotuner plays for the reference
(`/root/reference/hqq/backends/gemlite.py`). A model has only a handful of
distinct projection shapes, so a full tune is a few minutes.

Winners are written to `hqq_tpu/ops/a8_plans_v5e.json` (checked in; installed
at import time by `fused_matmul` when running on a matching chip) and echoed
as `register_a8_plan(...)` lines.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/autotune_a8.py \
        [NxK ...]            # default: llama 7B/13B/70B projection shapes
"""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import quantize
from hqq_tpu.ops import fused_matmul as fm
from hqq_tpu.backends.pallas_backend import _a8_pad_k_groups
from hqq_tpu.utils.profiling import enable_compile_cache
from tools.bench_kernels import time_scan

enable_compile_cache()

DEFAULT_SHAPES = [
    # llama-7B / 13B / 70B projection shapes (N, K), incl. fused qkv/gate_up
    (4096, 4096), (11008, 4096), (4096, 11008),
    (12288, 4096), (22016, 4096),
    (5120, 5120), (13824, 5120), (5120, 13824),
    (15360, 5120), (27648, 5120),
    (8192, 8192), (1024, 8192), (28672, 8192), (8192, 28672),
]


def _candidates(k_arr: int, n_pad: int, g: int, bc4: bool):
    """Candidate (s, split, tn) plans for a shape. For bc4 layouts the kernel
    has a single dot structure (split is ignored), so only tn and the class
    tier s vary; chunk-split layouts additionally try the concat-dot."""
    s_opts = [s for s in (128, 64, 32, 16, 8) if k_arr % (s * g) == 0]
    if not s_opts:
        return []
    tns = []
    for target in (1024, 1536, 2048, 4096, 6144):
        tn, _ = fm._a8_tile_plan(n_pad, target)
        if tn not in tns:
            tns.append(tn)
    if n_pad <= 8192 and n_pad not in tns:  # whole-N tile
        tns.append(n_pad)
    cands = []
    for s in s_opts:
        for tn in tns:
            splits = (True,) if bc4 else (True, False)
            for split in splits:
                cands.append((s, split, tn))
    return cands


def tune(shapes, g=64, iters=4):
    rng = np.random.default_rng(0)
    winners = {}
    for (n, k) in shapes:
        L = max(6, int(48 * 4096 * 4096 / (n * k)))
        w_np = rng.standard_normal((n, k), dtype=np.float32) / 20
        x1 = jnp.asarray(rng.standard_normal((1, k), dtype=np.float32) / 10,
                         jnp.bfloat16)
        qt = quantize(jnp.asarray(w_np), nbits=4, group_size=g, axis=1,
                      round_zero=True, compute_dtype=jnp.bfloat16)
        kqt = fm.to_kernel_layout(qt, pad_k_groups=_a8_pad_k_groups(qt))
        k_arr = kqt.wq.shape[0] * kqt.r
        n_pad = kqt.wq.shape[1]
        key = (k_arr, n_pad, g, kqt.container_bits, kqt.bc4)
        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)

        def step(w, x):
            y = fm.quant_matmul_pallas_a8(x, w).astype(jnp.float32)
            mm = min(k, y.shape[-1])
            return (x + jnp.pad(y[:, :mm] * 1e-6, ((0, 0), (0, k - mm)))).astype(x.dtype)

        results = []
        for s, split, tn in _candidates(k_arr, n_pad, g, kqt.bc4):
            fm.register_a8_plan(*key[:4], s=s, split=split, tn=tn, bc4=key[4])
            t = None
            for attempt in (0, 1):  # axon remote-compile 500s are sporadic
                try:
                    t = time_scan(step, stacked, x1, iters=iters)
                    break
                except Exception as e:
                    err = e
            if t is None:
                print(f"  [{k}x{n}] s={s} split={split} tn={tn}: FAILED "
                      f"{type(err).__name__}: {str(err)[:120]}")
                continue
            results.append((t, s, split, tn))
            print(f"  [{k}x{n}] s={s} split={split} tn={tn}: {t*1e6:.1f}us")
        if not results:
            continue
        t, s, split, tn = min(results)
        winners[key] = dict(s=s, split=split, tn=tn, us=round(t * 1e6, 1))
        fm.register_a8_plan(*key[:4], s=s, split=split, tn=tn, bc4=key[4])
        print(f"[{k}x{n}] WINNER s={s} split={split} tn={tn} ({t*1e6:.1f}us)")
        del stacked
    return winners


def main():
    kind = jax.devices()[0].device_kind
    print(f"[{kind}]")
    if len(sys.argv) > 1:
        shapes = [tuple(int(x) for x in a.split("x")) for a in sys.argv[1:]]
        merge = True
    else:
        shapes = DEFAULT_SHAPES
        merge = False
    winners = tune(shapes)
    out = [dict(k_arr=k[0], n_pad=k[1], g=k[2], cb=k[3], bc4=k[4], **v)
           for k, v in winners.items()]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "hqq_tpu", "ops", "a8_plans_v5e.json")
    if merge and os.path.exists(path):
        with open(path) as f:
            prior = json.load(f).get("plans", [])
        keys = {(p["k_arr"], p["n_pad"], p["g"], p["cb"], p["bc4"]) for p in out}
        out = [p for p in prior
               if (p["k_arr"], p["n_pad"], p["g"], p["cb"], p["bc4"]) not in keys] + out
    with open(path, "w") as f:
        json.dump({"device_kind": kind, "plans": out}, f, indent=1)
    print(f"wrote {path}")
    for p in out:
        print(f"register_a8_plan({p['k_arr']}, {p['n_pad']}, {p['g']}, "
              f"{p['cb']}, s={p['s']}, split={p['split']}, tn={p['tn']}, "
              f"bc4={p['bc4']})")


if __name__ == "__main__":
    main()
