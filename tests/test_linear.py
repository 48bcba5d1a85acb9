# SPDX-License-Identifier: Apache-2.0
"""QuantLinear forward/backward tests (≙ reference
`tests/test_quantize.py:123-163`) and Pallas fused-kernel correctness in
interpreter mode (CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.nn import QuantLinear
from hqq_tpu.ops import fused_matmul


def _mk_layer(rng, out_f=128, in_f=256, nbits=4, group_size=64, axis=1, bias=True,
              compute_dtype=jnp.float32):
    w = (rng.standard_normal((out_f, in_f)) / 10).astype(np.float32)
    b = rng.standard_normal(out_f).astype(np.float32) if bias else None
    layer = QuantLinear.quantize(
        jnp.asarray(w), None if b is None else jnp.asarray(b),
        nbits=nbits, group_size=group_size, axis=axis,
        round_zero=(nbits == 4), compute_dtype=compute_dtype,
    )
    return w, b, layer


@pytest.mark.parametrize("nbits", [8, 4, 3, 2])
@pytest.mark.parametrize("axis", [0, 1])
def test_forward_matches_dequant(nbits, axis, rng):
    w, b, layer = _mk_layer(rng, nbits=nbits, axis=axis)
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    y = layer(x)
    w_dq = np.asarray(layer.dequantize(jnp.float32))
    y_ref = np.asarray(x) @ w_dq.T + b
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-2, atol=2e-3)


def test_forward_jit_and_grad(rng):
    w, b, layer = _mk_layer(rng)
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))

    @jax.jit
    def loss(x, layer):
        return jnp.sum(layer(x) ** 2)

    val, gx = jax.value_and_grad(loss)(x, layer)
    assert np.isfinite(float(val))
    # gradient flows to x (and would flow to bias), never to the weight
    assert gx.shape == x.shape and np.isfinite(np.asarray(gx)).all()

    w_dq = np.asarray(layer.dequantize(jnp.float32))
    y = np.asarray(x) @ w_dq.T + b
    gx_ref = 2 * y @ w_dq
    np.testing.assert_allclose(np.asarray(gx), gx_ref, rtol=2e-2, atol=2e-2)


def test_no_weight_gradient(rng):
    _, _, layer = _mk_layer(rng)
    x = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))

    def loss(layer, x):
        return jnp.sum(layer(x))

    g = jax.grad(loss, allow_int=True)(layer, x)
    # scale/zero cotangents are exactly zero
    assert float(jnp.abs(g.qweight.scale).max()) == 0.0
    assert float(jnp.abs(g.qweight.zero).max()) == 0.0


def test_group_size_none(rng):
    w, b, layer = _mk_layer(rng, group_size=None)
    assert layer.qweight.group_size == 256  # axis=1 -> in_features


def test_quant_config_dict(rng):
    w = jnp.asarray((rng.standard_normal((64, 128)) / 10).astype(np.float32))
    cfg = BaseQuantizeConfig(nbits=2, group_size=32)
    layer = QuantLinear.quantize(w, None, quant_config=cfg)
    assert layer.qweight.nbits == 2
    assert layer.qweight.group_size == 32


# ---------------------------------------------------------------------------
# Pallas kernel layout + fused matmul (interpret mode on CPU)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nbits", [8, 4, 3, 2, 1])
def test_kernel_layout_roundtrip(nbits, rng):
    w, _, layer = _mk_layer(rng, out_f=128, in_f=256, nbits=nbits, bias=False)
    qt = layer.qweight
    assert fused_matmul.supports_kernel_layout(qt)
    kqt = fused_matmul.to_kernel_layout(qt)
    # kernel-layout dequant (plain jnp reconstruction) == canonical dequant
    from hqq_tpu.ops.fused_matmul import unpack_codes_host

    k, n_pad = 256, kqt.wq.shape[1]
    w_t = np.asarray(unpack_codes_host(kqt))[:k]
    w_rec = (w_t * np.repeat(np.asarray(kqt.scale), kqt.group_size, 0)
             - np.repeat(np.asarray(kqt.zs), kqt.group_size, 0))
    w_dq = np.asarray(layer.dequantize(jnp.float32))
    np.testing.assert_allclose(w_rec[:, :128].T, w_dq, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("nbits", [8, 4, 3, 2, 1])
@pytest.mark.parametrize("m", [1, 16])
def test_fused_matmul_interpret(nbits, m, rng):
    w, _, layer = _mk_layer(rng, out_f=128, in_f=256, nbits=nbits, bias=False)
    kqt = fused_matmul.to_kernel_layout(layer.qweight)
    x = jnp.asarray((rng.standard_normal((m, 256)) / 10).astype(np.float32))
    y = fused_matmul.quant_matmul_pallas(x, kqt, interpret=True)
    y_ref = np.asarray(x) @ np.asarray(layer.dequantize(jnp.float32)).T
    assert y.shape == (m, 128)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-2, atol=1e-3)


def test_dequant_pallas_interpret(rng):
    w, _, layer = _mk_layer(rng, out_f=128, in_f=256, nbits=4, bias=False)
    kqt = fused_matmul.to_kernel_layout(layer.qweight)
    w_t = np.asarray(fused_matmul.dequant_pallas(kqt, interpret=True))
    w_dq = np.asarray(layer.dequantize(jnp.float32))
    np.testing.assert_allclose(w_t.T, w_dq, rtol=1e-4, atol=1e-5)


def test_is_sharded_disambiguates_padding_vs_shard(rng):
    """The ambiguous case the old shape heuristic misread (VERDICT r2 weak
    #4): a global K=576 layout pads storage to 512-row wq (K_pad=1024 codes),
    while a tp=2 shard of global K=2048 has IDENTICAL array dims — only the
    static `is_sharded` flag (set by TP prep, never inferred) tells them
    apart, and both must compute correctly."""
    import dataclasses as dc

    g, r = 64, 2  # nbits=4 -> 4-bit container, r=2 codes/byte

    # (a) global, storage-padded: K=576 -> k_pad=1024 (pad_k_groups=8, g=64)
    _, _, layer_pad = _mk_layer(rng, out_f=256, in_f=576, nbits=4, group_size=g,
                                bias=False)
    kqt_pad = fused_matmul.to_kernel_layout(layer_pad.qweight)
    assert kqt_pad.wq.shape[0] == 1024 // r and not kqt_pad.is_sharded
    assert fused_matmul._logical_dims(kqt_pad) == (576, 256)

    # (b) shard-local: global K=2048, tp=2 -> local 1024 codes = SAME wq dims
    _, _, layer_big = _mk_layer(rng, out_f=256, in_f=2048, nbits=4, group_size=g,
                                bias=False)
    kqt_full = fused_matmul.to_kernel_layout(layer_big.qweight)
    kqt_shard = dc.replace(
        kqt_full,
        wq=kqt_full.wq[: 1024 // r],
        scale=kqt_full.scale[: 1024 // g],
        zs=kqt_full.zs[: 1024 // g],
        is_sharded=True,
    )
    assert kqt_shard.wq.shape == kqt_pad.wq.shape  # the ambiguity is real
    assert fused_matmul._logical_dims(kqt_shard) == (1024, 256)

    # both compute correctly through the kernel entry
    x = jnp.asarray((rng.standard_normal((4, 576)) / 10).astype(np.float32))
    y = fused_matmul.quant_matmul_pallas(x, kqt_pad, interpret=True)
    y_ref = np.asarray(x) @ np.asarray(layer_pad.dequantize(jnp.float32)).T
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-2, atol=1e-3)

    xs = jnp.asarray((rng.standard_normal((4, 1024)) / 10).astype(np.float32))
    ys = fused_matmul.quant_matmul_pallas(xs, kqt_shard, interpret=True)
    w_half = np.asarray(layer_big.dequantize(jnp.float32))[:, :1024]
    np.testing.assert_allclose(np.asarray(ys), np.asarray(xs) @ w_half.T,
                               rtol=1e-2, atol=1e-3)


def test_pallas_backend_patch(rng):
    from hqq_tpu.backends import patch_quantlinear_to_pallas

    w, b, layer = _mk_layer(rng, nbits=4)
    patched = patch_quantlinear_to_pallas(layer)
    assert patched.__class__.__name__ == "PallasQuantLinear"
    # axis=0 fuses too (round-3 permuted-layout kernel) and stays exact
    _, _, layer0 = _mk_layer(rng, axis=0)
    patched0 = patch_quantlinear_to_pallas(layer0)
    assert patched0.__class__.__name__ == "PallasQuantLinear"
    assert patched0.kqt.__class__.__name__ == "KernelQTensor0"
    x = jnp.asarray((rng.standard_normal((2, layer0.in_features)) / 10)
                    .astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(patched0(x)), np.asarray(layer0(x)), rtol=2e-2, atol=2e-3
    )
