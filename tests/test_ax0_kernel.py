# SPDX-License-Identifier: Apache-2.0
"""Axis=0 fused kernel path (VERDICT r2 item 1).

The reference's native layer dequantizes ONLY axis=0 groupings
(`/root/reference/hqq/kernels/hqq_aten_cuda_kernel.cu:110-122`;
`hqq_aten_cuda.cpp:42` asserts axis==0) — HQQ's quality-mode config for low
bits, and BASELINE config 3 ("Llama-2-7B 3-bit/2-bit axis=0"). These tests
pin the permuted-layout kernel (`KernelQTensor0`) to the canonical XLA
dequant semantics: the pack-time row permutation + kernel affine must
reproduce `x @ dequantize(qt).T` exactly (same f32 arithmetic, reassociated),
across containers, paddings, and both backend entry points."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hqq_tpu.core.quantize import BaseQuantizeConfig, dequantize, quantize
from hqq_tpu.nn.linear import QuantLinear
from hqq_tpu.ops.fused_matmul import (
    dequant_pallas,
    quant_matmul_pallas,
    quant_matmul_pallas_a8,
    supports_kernel_layout_ax0,
    to_kernel_layout_ax0,
)
from hqq_tpu.utils.patching import prepare_for_inference


def _make(n_out, k, g, nbits, seed=0):
    key = jax.random.PRNGKey(seed)
    w = jax.random.normal(key, (n_out, k), jnp.float32) / np.sqrt(k)
    qt = quantize(
        w, nbits=nbits, group_size=g, axis=0, round_zero=(nbits == 4),
        compute_dtype=jnp.float32,
    )
    return w, qt


@pytest.mark.parametrize(
    "m,n_out,k,g,nbits",
    [
        (1, 256, 512, 64, 4),      # decode M=1
        (8, 256, 512, 64, 4),      # decode batch
        (1, 256, 512, 16, 2),      # 2-bit quality-mode grouping
        (1, 256, 512, 32, 3),      # 3-bit (4-bit container widening)
        (1, 256, 512, 64, 8),      # 8-bit container
        (1, 256, 512, 8, 1),       # 1-bit container
        (40, 256, 512, 64, 2),     # prefill-sized M
        (1, 320, 512, 16, 2),      # N=320 pads to 8g=128 multiple (384)
        (1, 256, 200, 8, 4),       # K=200 pads to 256 lanes
        (5, 192, 320, 16, 3),      # both paddings + odd M
        (300, 256, 512, 64, 4),    # M > 256: gridded M tiles (VMEM bound)
        (300, 256, 512, 16, 2),    # M > 256 on the chunk-major layout
    ],
)
def test_ax0_kernel_matches_xla_dequant(m, n_out, k, g, nbits):
    w, qt = _make(n_out, k, g, nbits)
    assert supports_kernel_layout_ax0(qt)
    kqt = to_kernel_layout_ax0(qt)
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.float32)
    expected = np.asarray(x) @ np.asarray(dequantize(qt, jnp.float32)).T
    got = np.asarray(quant_matmul_pallas(x, kqt), np.float32)
    rel = np.abs(got - expected).max() / max(np.abs(expected).max(), 1e-30)
    assert rel < 2e-5, f"axis=0 kernel mismatch: rel={rel}"


def test_ax0_a8_entry_routes_to_fused_kernel():
    """The w4a8 entry point serves axis=0 through the fused bf16-operand
    kernel (scales vary along K per row — int8-dot factoring doesn't apply);
    activations stay full-precision, so output matches dequant-matmul."""
    w, qt = _make(256, 512, 16, 2)
    kqt = to_kernel_layout_ax0(qt)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 512), jnp.float32)
    expected = np.asarray(x) @ np.asarray(dequantize(qt, jnp.float32)).T
    got = np.asarray(quant_matmul_pallas_a8(x, kqt), np.float32)
    rel = np.abs(got - expected).max() / np.abs(expected).max()
    assert rel < 2e-5, rel


def test_ax0_dequant_pallas_roundtrip():
    w, qt = _make(192, 256, 16, 2)
    kqt = to_kernel_layout_ax0(qt)
    w_t = np.asarray(dequant_pallas(kqt, interpret=True), np.float32)  # [K, N]
    expected = np.asarray(dequantize(qt, jnp.float32))
    np.testing.assert_allclose(w_t.T, expected, rtol=0, atol=2e-6)


def test_ax0_group_not_dividing_n_falls_back():
    """g ∤ N (valid for the quantizer when g | N·K) must NOT convert — the
    XLA path serves it (graceful fallback, ≙ reference backend constraints)."""
    w = jax.random.normal(jax.random.PRNGKey(0), (40, 64), jnp.float32)
    qt = quantize(w, nbits=4, group_size=256, axis=0, compute_dtype=jnp.float32)
    assert not supports_kernel_layout_ax0(qt)
    layer = QuantLinear(qweight=qt)
    out = prepare_for_inference({"x_proj": layer}, "pallas")["x_proj"]
    assert isinstance(out, QuantLinear)  # unchanged


@pytest.mark.parametrize("backend", ["pallas", "w4a8"])
def test_ax0_prepare_for_inference(backend):
    """End-to-end: axis=0 quantized layer converts under both fused backends
    and its forward/dequantize match the canonical QuantLinear (xla) path.
    meta_dtype=fp32 forces bit-exactness; the DEFAULT policy stores bf16
    meta for this sub-8-step config (2b g16) — bounded drift only."""
    w = jax.random.normal(jax.random.PRNGKey(3), (320, 512), jnp.float32) / 20
    cfg = BaseQuantizeConfig(nbits=2, group_size=16, axis=0,
                             compute_dtype=jnp.float32)
    layer = QuantLinear.quantize(w, quant_config=cfg)
    tree = prepare_for_inference({"up_proj": layer}, backend,
                                 meta_dtype=jnp.float32)
    fused = tree["up_proj"]
    assert not isinstance(fused, QuantLinear), "axis=0 must convert"
    assert fused.in_features == 512 and fused.out_features == 320

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 512), jnp.float32)
    ref = np.asarray(layer(x), np.float32)
    got = np.asarray(fused(x), np.float32)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 2e-5, rel

    np.testing.assert_allclose(
        np.asarray(fused.dequantize(jnp.float32)),
        np.asarray(layer.dequantize(jnp.float32)),
        rtol=0, atol=2e-6,
    )

    # default policy: bf16 meta for this config, error bounded at the bf16
    # rounding scale (>=100x below 2-bit quantization error)
    auto = prepare_for_inference({"up_proj": layer}, backend)["up_proj"]
    assert auto.kqt.scale.dtype == jnp.bfloat16
    got_a = np.asarray(auto(x), np.float32)
    rel_a = np.abs(got_a - ref).max() / np.abs(ref).max()
    assert rel_a < 2e-2, rel_a


def test_ax0_bf16_meta_policy():
    """`_ax0_meta_dtype` picks bf16 exactly for the chunk-major (sub-8-step)
    quality configs — where fp32 meta is ~2/3 of HBM traffic — and fp32 for
    >=8-step configs where bf16 measured SLOWER (v5e,
    tools/kernel_lab_ax0_meta.py); dequantized-weight drift from bf16 meta
    stays far below the low-bit quantization error it rides on."""
    from hqq_tpu.backends.pallas_backend import _ax0_meta_dtype
    from hqq_tpu.core.quantize import dequantize

    w = jax.random.normal(jax.random.PRNGKey(5), (256, 512), jnp.float32) / 20
    expect = {(2, 16): jnp.bfloat16, (1, 16): jnp.bfloat16,
              (1, 32): jnp.bfloat16, (3, 64): jnp.float32,
              (2, 64): jnp.float32, (4, 64): jnp.float32}
    for (nbits, g), md in expect.items():
        qt = quantize(w, nbits=nbits, group_size=g, axis=0,
                      compute_dtype=jnp.float32)
        assert _ax0_meta_dtype(qt) == md, (nbits, g)

    # drift bound for the deployed bf16 configs: bf16-meta dequant vs fp32
    # dequant is <1% of the weight norm; the 2-bit quantization error itself
    # is >20% — the meta dtype is noise against it (the "recorded error
    # delta" justifying the policy)
    for nbits, g in ((2, 16), (1, 16), (1, 32)):
        qt = quantize(w, nbits=nbits, group_size=g, axis=0,
                      compute_dtype=jnp.float32)
        w_fp = np.asarray(dequant_pallas(to_kernel_layout_ax0(qt, jnp.float32)))
        w_bf = np.asarray(dequant_pallas(
            to_kernel_layout_ax0(qt, jnp.bfloat16)).astype(jnp.float32))
        drift = np.linalg.norm(w_bf - w_fp) / np.linalg.norm(w_fp)
        qerr = float(np.linalg.norm(np.asarray(dequantize(qt, jnp.float32)).T
                                    - np.asarray(w).T)
                     / np.linalg.norm(np.asarray(w)))
        assert drift < 0.01, (nbits, g, drift)
        assert drift < qerr / 10, (nbits, g, drift, qerr)


def test_ax0_matches_reference_grouping_semantics():
    """The permutation must reproduce the reference's STRIDED axis=0 group
    membership (`W.reshape(g, -1)`): rebuild dequant by hand from group-space
    scale/zero and compare against the kernel path."""
    n_out, k, g = 64, 96, 8
    w, qt = _make(n_out, k, g, 4, seed=7)
    # hand dequant: group of element (n, k) is column (n % (N/g))*K + k
    from hqq_tpu.core.quantize import unpack_codes

    codes = np.asarray(unpack_codes(qt, jnp.int32))  # [g, P*K]
    scale = np.asarray(qt.scale).reshape(-1)  # [P*K]
    zero = np.asarray(qt.zero).reshape(-1)
    p_blocks = n_out // g
    w_manual = np.zeros((n_out, k), np.float32)
    for n in range(n_out):
        a, b = divmod(n, p_blocks)
        for kk in range(k):
            c = b * k + kk
            w_manual[n, kk] = (codes[a, c] - zero[c]) * scale[c]
    np.testing.assert_allclose(
        w_manual, np.asarray(dequantize(qt, jnp.float32)), rtol=0, atol=1e-6
    )
    kqt = to_kernel_layout_ax0(qt)
    x = jnp.eye(k, dtype=jnp.float32)
    got = np.asarray(quant_matmul_pallas(x, kqt), np.float32).T  # W
    np.testing.assert_allclose(got, w_manual, rtol=0, atol=1e-5)


def test_ax0_model_serves_paged_engine():
    """BASELINE config 3 end-to-end: a 2-bit AXIS=0 quantized llama serves
    through the paged continuous-batching engine on the fused backend,
    token-for-token equal to the canonical (xla QuantLinear) engine."""
    from hqq_tpu.models import llama
    from hqq_tpu.models.base import quantize_model
    from hqq_tpu.serving.paged import PagedBatchingEngine

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    q = quantize_model(
        params,
        BaseQuantizeConfig(nbits=2, group_size=16, axis=0,
                           compute_dtype=jnp.float32),
        compute_dtype=jnp.float32,
    )
    kw = dict(batch_slots=2, num_pages=32, page_size=4, max_pages_per_seq=8,
              cache_dtype=jnp.float32)
    prompts = [[3, 17, 29, 5], [11, 2, 7]]

    def run(tree):
        eng = PagedBatchingEngine(tree, cfg, **kw)
        uids = [eng.add_request(p, max_new_tokens=6) for p in prompts]
        outs = eng.run()
        return [outs[u] for u in uids]

    ref = run(q)  # xla path
    # fp32 meta -> kernel arithmetic is bit-identical to the xla dequant
    # path, so tokens must match exactly (the default bf16-meta policy for
    # this config trades ~5e-3 weight drift for ~1.2x kernel speed — its
    # error bound is pinned in test_ax0_bf16_meta_policy)
    fused = prepare_for_inference(q, "pallas", meta_dtype=jnp.float32)
    from hqq_tpu.backends.pallas_backend import PallasQuantLinear

    leaf = fused["layers"][0]["self_attn"]["q_proj"]
    assert isinstance(leaf, PallasQuantLinear)
    assert leaf.kqt.__class__.__name__ == "KernelQTensor0"
    assert run(fused) == ref


def test_ax0_layers_do_not_fuse():
    """fuse_for_decode must NOT concat axis=0 (KernelQTensor0) layers: the
    row-major [N, K] layout would be joined along K, producing a corrupt
    fused qkv (reproduced crash: 'cannot reshape (1, K) into (-1, 3K)').
    Square q/k/v pass the width checks, so the guard must be on the layout
    class itself — and the fused model must still forward correctly."""
    import numpy as np

    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import LlamaConfig, forward, init_cache, init_params
    from hqq_tpu.models.base import quantize_model
    from hqq_tpu.utils.patching import fuse_for_decode, prepare_for_inference

    import dataclasses

    # square q/k/v (MHA) — the dangerous case where the width checks pass
    cfg = dataclasses.replace(LlamaConfig.tiny(), num_key_value_heads=4)
    assert cfg.num_attention_heads == cfg.num_key_value_heads
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(
        params,
        BaseQuantizeConfig(nbits=2, group_size=16, axis=0, round_zero=False),
        compute_dtype=jnp.float32,
    )
    served = prepare_for_inference(q, "w4a8")
    fused = fuse_for_decode(served)
    sa = fused["layers"][0]["self_attn"]
    assert "qkv_proj" not in sa, "axis=0 layers must stay unfused"

    toks = jnp.asarray([[3, 7, 5]], jnp.int32)
    cache = init_cache(cfg, 1, 16, jnp.float32)
    ref, _ = forward(served, cfg, toks, cache, 0)
    cache2 = init_cache(cfg, 1, 16, jnp.float32)
    got, _ = forward(fused, cfg, toks, cache2, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)
