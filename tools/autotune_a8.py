# SPDX-License-Identifier: Apache-2.0
"""Autotune the w4a8 decode-kernel tile plans on the real chip.

The best (dot structure, N-tile) combination is shape-dependent (see
`fused_matmul._A8_PLANS`); this tool measures the candidate set for each
requested weight shape with the production dispatch and registers/prints the
winners — the role gemlite's kernel autotuner plays for the reference
(`/root/reference/hqq/backends/gemlite.py`). A model has only a handful of
distinct projection shapes, so a full tune is a few minutes.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/autotune_a8.py \
        [NxK ...]            # default: llama 7B/13B/70B projection shapes
Writes winners to stdout as register_a8_plan(...) lines and to
`a8_plans.json` next to this script (loadable via `load_plans_json`).
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
    # llama-7B / 13B / 70B projection shapes (N, K)
    (4096, 4096), (11008, 4096), (4096, 11008),
    (5120, 5120), (13824, 5120), (5120, 13824),
    (8192, 8192), (1024, 8192), (28672, 8192), (8192, 28672),
]


def _candidates(n_pad: int, s: int):
    """Candidate (split, tn) plans for a shape."""
    cands = []
    for target in (1536, 2048, 4096):
        tn, _ = fm._a8_tile_plan(n_pad, target)
        for split in (True, False):
            if (split, tn) not in cands:
                cands.append((split, tn))
    if n_pad <= 8192 and (True, n_pad) not in cands:  # whole-N tile
        cands.append((True, n_pad))
        cands.append((False, n_pad))
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
        s = 32 if k_arr % (32 * g) == 0 else (16 if k_arr % (16 * g) == 0 else 8)
        if s == 8:
            print(f"[{k}x{n}] s=8 (meff path) — no plan table entry; skipping")
            continue
        key = (k_arr, n_pad, g, kqt.container_bits, s)
        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a] * L), kqt)

        def step(w, x):
            y = fm.quant_matmul_pallas_a8(x, w).astype(jnp.float32)
            mm = min(k, y.shape[-1])
            return (x + jnp.pad(y[:, :mm] * 1e-6, ((0, 0), (0, k - mm)))).astype(x.dtype)

        results = []
        for split, tn in _candidates(n_pad, s):
            fm.register_a8_plan(*key, split=split, tn=tn)
            try:
                t = time_scan(step, stacked, x1, iters=iters)
            except Exception as e:
                print(f"  [{k}x{n}] split={split} tn={tn}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            results.append((t, split, tn))
            print(f"  [{k}x{n}] split={split} tn={tn}: {t*1e6:.1f}us")
        if not results:
            continue
        t, split, tn = min(results)
        winners[key] = dict(split=split, tn=tn, us=round(t * 1e6, 1))
        fm.register_a8_plan(*key, split=split, tn=tn)
        print(f"[{k}x{n}] WINNER split={split} tn={tn} ({t*1e6:.1f}us)")
        del stacked
    return winners


def load_plans_json(path):
    """Install plans previously written by this tool."""
    with open(path) as f:
        data = json.load(f)
    for item in data:
        fm.register_a8_plan(item["k_arr"], item["n_pad"], item["g"],
                            item["cb"], item["s"],
                            split=item["split"], tn=item["tn"])


def main():
    print(f"[{jax.devices()[0].device_kind}]")
    if len(sys.argv) > 1:
        shapes = [tuple(int(x) for x in a.split("x")) for a in sys.argv[1:]]
    else:
        shapes = DEFAULT_SHAPES
    winners = tune(shapes)
    out = [dict(k_arr=k[0], n_pad=k[1], g=k[2], cb=k[3], s=k[4], **v)
           for k, v in winners.items()]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "a8_plans.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    for item in out:
        print(f"register_a8_plan({item['k_arr']}, {item['n_pad']}, {item['g']}, "
              f"{item['cb']}, {item['s']}, split={item['split']}, tn={item['tn']})")


if __name__ == "__main__":
    main()
