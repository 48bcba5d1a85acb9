# SPDX-License-Identifier: Apache-2.0
"""Verify driver (r5): bc4 bitcast-order pack end-to-end on the real TPU.

Checks, all on-chip:
  1. w4a8 decode matmul (bc4 default) == dequant reference at 4096x4096
  2. bf16-operand kernel (quant_matmul_pallas) bc4 == reference
  3. fused a8+LoRA decode == unfused reference (envelope)
  4. tiny Llama engine decode runs and matches the xla backend's tokens
  5. same-run timing: bc4 vs chunk-split (expect bc4 <=)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_bc4.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()


def main():
    print(jax.devices())
    from hqq_tpu.core.quantize import dequantize, quantize
    from hqq_tpu.ops import fused_matmul as fm
    from hqq_tpu.backends.pallas_backend import _a8_pad_k_groups
    from tools.bench_kernels import time_scan

    rng = np.random.default_rng(0)
    n, k = 4096, 4096
    w = jnp.asarray(rng.standard_normal((n, k), dtype=np.float32) / 20)
    qt = quantize(w, nbits=4, group_size=64, axis=1, round_zero=True,
                  compute_dtype=jnp.float32)
    w_dq = np.asarray(dequantize(qt, jnp.float32))

    kqt = fm.to_kernel_layout(qt, pad_k_groups=_a8_pad_k_groups(qt))
    kqt_cs = fm.to_kernel_layout(qt, pad_k_groups=_a8_pad_k_groups(qt), bc4=False)
    assert kqt.bc4 and not kqt_cs.bc4

    x1 = jnp.asarray(rng.standard_normal((1, k), dtype=np.float32) / 10)

    # 1. a8 decode path: weight-side exact => equals x8*sx @ w_dq.T
    x8, sx = fm.quantize_activations_int8(x1)
    expected = (np.asarray(x8, np.float32) * np.asarray(sx)) @ w_dq.T
    got = np.asarray(fm.quant_matmul_pallas_a8(x1, kqt), np.float32)
    got_cs = np.asarray(fm.quant_matmul_pallas_a8(x1, kqt_cs), np.float32)
    rel = np.abs(got - expected).max() / np.abs(expected).max()
    rel_cs = np.abs(got_cs - expected).max() / np.abs(expected).max()
    print(f"1. a8 decode   rel_err bc4={rel:.2e} chunksplit={rel_cs:.2e}")
    assert rel < 2e-5, rel

    # batch-8 (meff path)
    x8b = jnp.asarray(rng.standard_normal((8, k), dtype=np.float32) / 10)
    xq, sxb = fm.quantize_activations_int8(x8b)
    expb = (np.asarray(xq, np.float32) * np.asarray(sxb)) @ w_dq.T
    gotb = np.asarray(fm.quant_matmul_pallas_a8(x8b, kqt), np.float32)
    relb = np.abs(gotb - expb).max() / np.abs(expb).max()
    print(f"1b. a8 meff=8  rel_err bc4={relb:.2e}")
    assert relb < 2e-5, relb

    # 2. bf16-operand kernel
    y = np.asarray(fm.quant_matmul_pallas(x1.astype(jnp.bfloat16),
                                          fm.to_kernel_layout(qt)), np.float32)
    yref = np.asarray(x1) @ w_dq.T
    rel2 = np.abs(y - yref).max() / np.abs(yref).max()
    print(f"2. bf16 kernel rel_err bc4={rel2:.2e} (bf16 tolerance)")
    assert rel2 < 2e-2, rel2

    # 3. fused a8+LoRA
    r = 16
    a = jnp.asarray(rng.standard_normal((k, r), dtype=np.float32) / 50)
    b = jnp.asarray(rng.standard_normal((r, n), dtype=np.float32) / 50)
    yl = np.asarray(fm.quant_matmul_pallas_a8_lora(x1, kqt, a, b), np.float32)
    yl_ref = expected + (np.asarray(x1) @ np.asarray(a)) @ np.asarray(b)
    rel3 = np.abs(yl - yl_ref).max() / np.abs(np.abs(yl_ref)).max()
    print(f"3. a8+lora     rel_err bc4={rel3:.2e}")
    assert rel3 < 2e-4, rel3

    # 4. tiny model end-to-end: w4a8 (bc4) forward logits within the int8
    # activation-quant envelope of the exact xla backend, and the engine
    # decode is deterministic run-to-run
    from hqq_tpu.models import llama
    from hqq_tpu.models.base import quantize_model
    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.utils.patching import prepare_for_inference
    from hqq_tpu.serving.batching import ContinuousBatchingEngine

    cfg = llama.LlamaConfig.tiny()
    params0 = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    q = quantize_model(params0, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    p8 = prepare_for_inference(q, "w4a8")
    tokens = jnp.asarray([[3, 7, 11, 5]], jnp.int32)
    l8, _ = llama.forward(p8, cfg, tokens)
    lx, _ = llama.forward(q, cfg, tokens)
    dl = np.abs(np.asarray(l8) - np.asarray(lx)).max()
    rel4 = dl / np.abs(np.asarray(lx)).max()
    print(f"4. model logits w4a8-vs-xla rel={rel4:.2e} (int8-act envelope)")
    assert rel4 < 5e-2, rel4

    toks = []
    for _ in range(2):
        eng = ContinuousBatchingEngine(p8, cfg, batch_slots=2, max_len=64,
                                       cache_dtype=jnp.float32)
        rid = eng.add_request([3, 7, 11, 5], max_new_tokens=12)
        out = eng.run()
        toks.append(out[rid])
        eng.close()
    print(f"4b. engine deterministic: {toks[0]}")
    assert toks[0] == toks[1], toks

    # 6. sequence-parallel paged decode on-chip (1-device mesh: degenerate
    # merge, but the shard_map path + masked page writes compile and run on
    # real hardware) and an auto-mixed per-tag engine
    from hqq_tpu.parallel import make_mesh, sp_paged_forward_fn
    from hqq_tpu.serving.paged import PagedBatchingEngine
    from hqq_tpu.utils.patching import auto_mix_plan

    mesh1 = make_mesh(data=1, model=len(jax.devices()))
    spfwd = sp_paged_forward_fn(mesh1, cfg, page_size=4)
    eng = PagedBatchingEngine(q, cfg, batch_slots=2, num_pages=16, page_size=4,
                              max_pages_per_seq=8, cache_dtype=jnp.float32,
                              forward_fn=spfwd)
    uid = eng.add_request([3, 7, 11, 5], max_new_tokens=8)
    with mesh1:
        out6 = eng.run()
    eng.close()
    assert len(out6[uid]) == 8, out6
    print(f"6. sp paged decode on-chip: {out6[uid]}")

    plan = auto_mix_plan(q, hbm_budget_bytes=1 << 40)
    mixed = prepare_for_inference(q, plan)
    eng = ContinuousBatchingEngine(mixed, cfg, batch_slots=2, max_len=64,
                                   cache_dtype=jnp.float32)
    uid = eng.add_request([3, 7, 11, 5], max_new_tokens=8)
    out7 = eng.run()
    eng.close()
    assert len(out7[uid]) == 8, out7
    print(f"7. auto-mix engine ({set(plan.values())}): {out7[uid]}")

    # 5. same-run timing
    for name, t in (("bc4", kqt), ("chunksplit", kqt_cs)):
        L = 48
        stacked = jax.tree_util.tree_map(lambda a_: jnp.stack([a_] * L), t)
        x1b = x1.astype(jnp.bfloat16)

        def step(wq, x):
            y_ = fm.quant_matmul_pallas_a8(x, wq).astype(jnp.float32)
            return (x + y_[:, :k] * 1e-6).astype(x.dtype)

        dt = time_scan(step, stacked, x1b, iters=4)
        print(f"5. decode 4096x4096 {name}: {dt*1e6:.1f}us")
        del stacked
    print("ALL OK")


if __name__ == "__main__":
    main()
