# SPDX-License-Identifier: Apache-2.0
"""W4A8 backend tests: true 4-bit storage feeding int8 MXU operands.

Weight-side arithmetic must be bit-identical to HQQ dequant (the kernel's
only approximation is the dynamic int8 activation quantization, shared with
the int8 backend). Covers all three kernel routes: M=1 class-replicated
(S=32), M<=32 class-replicated (S=8), and the batched per-group fallback.
≙ reference fused-backend forward tests (`/root/reference/tests/
test_quantize.py:123-163`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hqq_tpu.core.quantize import BaseQuantizeConfig, dequantize, quantize
from hqq_tpu.nn.linear import QuantLinear
from hqq_tpu.ops.fused_matmul import (
    quant_matmul_pallas_a8,
    quantize_activations_int8,
    to_kernel_layout,
)


def _make(n_out, k, g, nbits, pad_k_groups=8, seed=0):
    key = jax.random.PRNGKey(seed)
    w = jax.random.normal(key, (n_out, k), jnp.float32) / np.sqrt(k)
    qt = quantize(w, nbits=nbits, group_size=g, axis=1, round_zero=(nbits == 4))
    return w, qt, to_kernel_layout(qt, pad_k_groups=pad_k_groups)


@pytest.mark.parametrize(
    "m,n_out,k,g,nbits,pad_k",
    [
        (1, 256, 2048, 64, 4, 32),   # M=1 route (k % 32g == 0)
        (1, 256, 1024, 64, 4, 8),    # M=1, k % 16g == 0 only -> S=16 route
        (1, 256, 512, 64, 4, 8),     # M=1 but k % 16g != 0 -> S=8 route
        (8, 256, 512, 64, 4, 8),     # M<=32 route
        (8, 384, 1024, 128, 4, 8),
        (8, 256, 512, 64, 2, 8),     # 2-bit container
        (3, 256, 512, 64, 4, 8),     # odd M pads to 8
        (12, 256, 512, 64, 4, 8),    # meff=16 route
        (24, 256, 512, 64, 4, 8),    # meff=24->32 route
    ],
)
def test_weight_side_exact(m, n_out, k, g, nbits, pad_k):
    """The kernel must reproduce x8·sx @ W_dq^T to f32 rounding: weight-side
    error == 0 beyond float associativity."""
    w, qt, kqt = _make(n_out, k, g, nbits, pad_k)
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.float32)
    w_dq = np.asarray(dequantize(qt, jnp.float32))
    x8, sx = quantize_activations_int8(x)
    expected = (np.asarray(x8, np.float32) * np.asarray(sx)) @ w_dq.T

    got = np.asarray(quant_matmul_pallas_a8(x, kqt), np.float32)
    rel = np.abs(got - expected).max() / np.abs(expected).max()
    assert rel < 2e-5, f"weight-side mismatch: rel={rel}"


def test_large_m_routes_to_bf16_kernel():
    """M>32 (prefill) uses the bf16-operand kernel: full-precision
    activations, output must match dequant matmul directly."""
    w, qt, kqt = _make(256, 512, 64, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (40, 512), jnp.float32)
    w_dq = np.asarray(dequantize(qt, jnp.float32))
    expected = np.asarray(x) @ w_dq.T
    got = np.asarray(quant_matmul_pallas_a8(x, kqt), np.float32)
    rel = np.abs(got - expected).max() / np.abs(expected).max()
    assert rel < 2e-5, rel


def test_e2e_error_matches_activation_quant_only():
    """End-to-end error vs fp activations is bounded by the activation-quant
    noise (~1%), with NO weight requantization error on top."""
    w, qt, kqt = _make(256, 512, 64, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 512), jnp.float32)
    w_dq = np.asarray(dequantize(qt, jnp.float32))
    full = np.asarray(x) @ w_dq.T
    got = np.asarray(quant_matmul_pallas_a8(x, kqt), np.float32)
    rel = np.abs(got - full).max() / np.abs(full).max()
    assert rel < 0.03, f"activation-quant error too large: {rel}"


def test_backend_patch_and_layer_forward():
    from hqq_tpu.backends.pallas_backend import A8QuantLinear, patch_quantlinear_to_w4a8

    w = jax.random.normal(jax.random.PRNGKey(0), (256, 512), jnp.float32) / 22
    bias = jnp.ones((256,), jnp.float32)
    layer = QuantLinear.quantize(
        w, bias, nbits=4, group_size=64, axis=1, round_zero=True,
        compute_dtype=jnp.float32,
    )
    a8 = patch_quantlinear_to_w4a8(layer)
    assert isinstance(a8, A8QuantLinear)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 512), jnp.float32)
    ref = layer(x)
    got = a8(x)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.03
    # dequantize round-trips the exact HQQ weights
    np.testing.assert_allclose(
        np.asarray(a8.dequantize(jnp.float32)),
        np.asarray(layer.dequantize(jnp.float32)),
        rtol=0, atol=1e-6,
    )


def test_axis0_falls_back_unchanged():
    from hqq_tpu.backends.pallas_backend import patch_quantlinear_to_w4a8

    w = jax.random.normal(jax.random.PRNGKey(0), (128, 128), jnp.float32)
    layer = QuantLinear.quantize(w, None, nbits=4, group_size=64, axis=0)
    assert patch_quantlinear_to_w4a8(layer) is layer


def test_prepare_for_inference_w4a8_and_fuse():
    """Model-level: prepare_for_inference('w4a8') + fuse_for_decode produce a
    decode path matching the xla reference forward."""
    from hqq_tpu.models import llama
    from hqq_tpu.models.base import quantize_model
    from hqq_tpu.utils.patching import fuse_for_decode, prepare_for_inference

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_model(
        params, BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32
    )
    tokens = jnp.asarray([[3, 17, 29, 5]], jnp.int32)
    cache_ref = llama.init_cache(cfg, 1, 16, jnp.float32)
    ref_logits, _ = llama.forward(qparams, cfg, tokens, cache_ref, 0)

    a8 = prepare_for_inference(qparams, "w4a8")
    a8 = fuse_for_decode(a8, pad_to=0)
    # fused qkv/gate_up must exist (all layers eligible)
    assert "qkv_proj" in a8["layers"][0]["self_attn"]
    assert "gate_up_proj" in a8["layers"][0]["mlp"]
    cache = llama.init_cache(cfg, 1, 16, jnp.float32)
    got_logits, _ = llama.forward(a8, cfg, tokens, cache, 0)
    rel = float(
        jnp.max(jnp.abs(got_logits - ref_logits)) / jnp.max(jnp.abs(ref_logits))
    )
    assert rel < 0.05, f"w4a8 decode path deviates: {rel}"


def test_a8_serialization_roundtrip(tmp_path):
    """prepare_for_inference('w4a8') trees save/load with identical logits
    (≙ fused-backend serialization, ref state_dict round trips)."""
    from hqq_tpu.models import llama
    from hqq_tpu.models.base import from_quantized, quantize_model, save_quantized
    from hqq_tpu.utils.patching import prepare_for_inference

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    a8 = prepare_for_inference(q, "w4a8")
    save_quantized(a8, str(tmp_path / "a8"))
    loaded, _ = from_quantized(str(tmp_path / "a8"))
    tokens = jnp.asarray([[3, 7, 11]], jnp.int32)
    l1, _ = llama.forward(a8, cfg, tokens)
    l2, _ = llama.forward(loaded, cfg, tokens)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=0, atol=1e-5)


@pytest.mark.parametrize("nbits", [6, 3, 1.58])
def test_container_widths_safe_in_int8(nbits):
    """6/5-bit (8-bit container, codes <= 63) and 3-bit (4-bit container)
    codes fit int8 exactly — the a8 routes stay weight-side exact."""
    g = 32
    w, qt, kqt = _make(256, 512, g, nbits)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 512), jnp.float32)
    w_dq = np.asarray(dequantize(qt, jnp.float32))
    x8, sx = quantize_activations_int8(x)
    expected = (np.asarray(x8, np.float32) * np.asarray(sx)) @ w_dq.T
    got = np.asarray(quant_matmul_pallas_a8(x, kqt), np.float32)
    rel = np.abs(got - expected).max() / np.abs(expected).max()
    assert rel < 2e-5, (nbits, rel)


def test_8bit_codes_fall_back_to_bf16_kernel():
    """True 8-bit codes (0..255) would wrap in an int8 cast: the a8 wrapper
    must route them through the bf16-operand kernel (full-precision
    activations, exact output)."""
    w, qt, kqt = _make(256, 512, 32, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 512), jnp.float32)
    w_dq = np.asarray(dequantize(qt, jnp.float32))
    expected = np.asarray(x) @ w_dq.T
    got = np.asarray(quant_matmul_pallas_a8(x, kqt), np.float32)
    rel = np.abs(got - expected).max() / np.abs(expected).max()
    assert rel < 2e-5, rel


def test_bf16_meta_w4a8_close():
    """bf16 scale/zs storage (the -12.5% HBM knob, prepare_for_inference
    meta_dtype=jnp.bfloat16): same kernel, meta rounded to bf16 — output
    must stay within the bf16-meta envelope of the fp32-meta (exact) path."""
    from hqq_tpu.core.quantize import dequantize

    g, nbits = 64, 4
    w = jax.random.normal(jax.random.PRNGKey(3), (256, 2048), jnp.float32) / 45
    qt = quantize(w, nbits=nbits, group_size=g, axis=1, round_zero=True)
    kqt32 = to_kernel_layout(qt, pad_k_groups=32)
    kqt16 = to_kernel_layout(qt, pad_k_groups=32, meta_dtype=jnp.bfloat16)
    assert kqt16.scale.dtype == jnp.bfloat16 and kqt16.zs.dtype == jnp.bfloat16
    for m in (1, 8):
        x = jax.random.normal(jax.random.PRNGKey(m), (m, 2048), jnp.float32) / 10
        y32 = np.asarray(quant_matmul_pallas_a8(x, kqt32), np.float32)
        y16 = np.asarray(quant_matmul_pallas_a8(x, kqt16), np.float32)
        rel = np.abs(y16 - y32).max() / np.abs(y32).max()
        assert rel < 2e-2, (m, rel)
    # dequant path too (serialization/export reads through it)
    w32 = np.asarray(dequantize(qt, jnp.float32))
    from hqq_tpu.ops.fused_matmul import dequant_pallas

    w16 = np.asarray(dequant_pallas(kqt16), np.float32)[:2048].T
    rel = np.abs(w16 - w32).max() / np.abs(w32).max()
    assert rel < 2e-2, rel
