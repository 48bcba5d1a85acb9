# SPDX-License-Identifier: Apache-2.0
"""Quantizer tests (≙ reference `tests/test_quantize.py:32-60`): dequant error
norms, packed dtypes, and numerical parity against the reference torch
implementation (fp32 CPU solver) when importable."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

from hqq_tpu.core import quantize, dequantize, unpack_codes
from hqq_tpu.core.quantize import BaseQuantizeConfig


def _lp_err(w, wr, p=0.7):
    return float(np.mean(np.abs(w - wr) ** p))


@pytest.mark.parametrize("nbits,container", [
    (8, np.uint8),
    (6, np.uint8),
    (5, np.uint8),
    (4, np.uint8),
    (3, np.int32),
    (2, np.uint8),
    (1.58, np.uint8),
    (1, np.uint8),
])
@pytest.mark.parametrize("axis", [0, 1])
def test_quantize_dequantize(nbits, container, axis, rng):
    w = rng.standard_normal((128, 64)).astype(np.float32) / 10.0
    qt = quantize(jnp.asarray(w), nbits=nbits, group_size=64, axis=axis,
                  round_zero=(nbits == 4))
    assert np.asarray(qt.wq).dtype == container
    wr = np.asarray(dequantize(qt, dtype=jnp.float32))
    assert wr.shape == w.shape
    # error should shrink as bits grow (thresholds on the l0.7 "norm", which
    # inflates small errors: e.g. |e|=5e-4 -> |e|^0.7 ~= 5e-3)
    err = _lp_err(w, wr)
    max_err = {8: 0.01, 6: 0.03, 5: 0.05, 4: 0.09, 3: 0.15, 2: 0.3,
               1.58: 0.45, 1: 0.6}[nbits]
    assert err < max_err, f"nbits={nbits} err={err}"


def test_codes_in_range(rng):
    w = rng.standard_normal((64, 64)).astype(np.float32)
    for nbits in (4, 3, 2, 1):
        qt = quantize(jnp.asarray(w), nbits=nbits, group_size=32, axis=1)
        codes = np.asarray(unpack_codes(qt, jnp.int32))
        assert codes.min() >= 0
        assert codes.max() <= round(2**nbits - 1)


def test_optimize_improves_error(rng):
    w = rng.standard_normal((256, 128)).astype(np.float32)
    qt_opt = quantize(jnp.asarray(w), nbits=3, group_size=64, axis=1, optimize=True)
    qt_raw = quantize(jnp.asarray(w), nbits=3, group_size=64, axis=1, optimize=False)
    e_opt = _lp_err(w, np.asarray(dequantize(qt_opt, jnp.float32)))
    e_raw = _lp_err(w, np.asarray(dequantize(qt_raw, jnp.float32)))
    assert e_opt < e_raw


def test_channelwise_false(rng):
    w = rng.standard_normal((64, 64)).astype(np.float32)
    qt = quantize(jnp.asarray(w), nbits=8, channel_wise=False, group_size=None)
    wr = np.asarray(dequantize(qt, jnp.float32))
    assert _lp_err(w, wr) < 5e-2
    assert np.abs(w - wr).max() < 0.05  # half a quantization step at 8-bit


def test_group_none_per_channel(rng):
    w = rng.standard_normal((32, 64)).astype(np.float32)
    # group_size=None with channel_wise keeps the matrix shape; min/max per axis
    qt = quantize(jnp.asarray(w), nbits=4, group_size=None, axis=1, optimize=False)
    assert qt.scale.shape == (32, 1)
    wr = np.asarray(dequantize(qt, jnp.float32))
    assert wr.shape == w.shape


def test_base_quantize_config():
    cfg = BaseQuantizeConfig(nbits=4, group_size=64)
    wqp = cfg["weight_quant_params"]
    assert wqp["round_zero"] is True and wqp["axis"] == 1
    cfg3 = BaseQuantizeConfig(nbits=3, group_size=64)
    assert cfg3["weight_quant_params"]["round_zero"] is False
    with pytest.warns(DeprecationWarning):
        BaseQuantizeConfig(nbits=4, quant_zero=True)


# ---------------------------------------------------------------------------
# Numerical parity vs the reference implementation (torch CPU, fp32 solver).
# This is the layer-level guarantee behind the PPL parity target.
# ---------------------------------------------------------------------------

def _reference_quantizer():
    sys.path.insert(0, "/root/reference")
    try:
        from hqq.core.quantize import Quantizer as RefQuantizer  # type: ignore

        return RefQuantizer
    except Exception:
        return None
    finally:
        sys.path.pop(0)


@pytest.mark.parametrize("nbits", [8, 4, 3, 2])
@pytest.mark.parametrize("axis", [0, 1])
@pytest.mark.parametrize("optimize", [False, True])
def test_reference_parity(nbits, axis, optimize):
    torch = pytest.importorskip("torch")
    RefQ = _reference_quantizer()
    if RefQ is None:
        pytest.skip("reference hqq not importable")

    # dedicated seed: the shared rng fixture is stateful and would make this
    # borderline-tie-break test order-dependent
    rng = np.random.default_rng(1234)
    w = (rng.standard_normal((128, 128)) / 8).astype(np.float32)
    round_zero = nbits == 4

    wq_ref, meta = RefQ.quantize(
        torch.from_numpy(w.copy()),
        nbits=nbits,
        group_size=64,
        optimize=optimize,
        round_zero=round_zero,
        axis=axis,
        device="cpu",
        compute_dtype=torch.float32,
    )

    qt = quantize(
        jnp.asarray(w),
        nbits=nbits,
        group_size=64,
        optimize=optimize,
        round_zero=round_zero,
        axis=axis,
    )

    # Packed containers should be bit-identical up to fp round/tie noise.
    ours = np.asarray(unpack_codes(qt, jnp.int32))
    theirs = {
        8: lambda x: x,
        4: lambda x: x,
        3: lambda x: x,
        2: lambda x: x,
    }[nbits]
    from hqq_tpu.core import bitpack

    ref_codes = np.asarray(
        bitpack.unpack(jnp.asarray(wq_ref.numpy()), qt.packing, jnp.int32)
    )[: ours.shape[0]]
    match = np.mean(ours == ref_codes)
    assert match > 0.999, f"code match ratio {match}"

    np.testing.assert_allclose(
        np.asarray(qt.scale), meta["scale"].numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(qt.zero), meta["zero"].numpy(), rtol=1e-4, atol=5e-4
    )

    # Dequant parity
    wr_ref = RefQ.dequantize(wq_ref, meta).numpy()
    wr = np.asarray(dequantize(qt, jnp.float32))
    err = np.abs(wr - wr_ref).max()
    assert err < 5e-3, f"dequant max diff {err}"


# ---------------------------------------------------------------------------
# Meta-quantization (quant_zero / quant_scale), inverse-median, int8 backend
# ---------------------------------------------------------------------------


def test_meta_quantization_roundtrip(rng):
    """quant_zero/quant_scale store scale/zero as nested 8-bit QTensors; the
    extra error over plain meta must be small (8-bit meta is nearly lossless)."""
    from hqq_tpu.core.quantize import QTensor, resolve_meta

    w = rng.standard_normal((256, 128)).astype(np.float32) / 10.0
    qt_plain = quantize(jnp.asarray(w), nbits=4, group_size=64, axis=1)
    cfg = BaseQuantizeConfig(nbits=4, group_size=64, quant_zero=True, quant_scale=True)
    qt_meta = quantize(
        jnp.asarray(w),
        scale_quant_params=cfg["scale_quant_params"],
        zero_quant_params=cfg["zero_quant_params"],
        nbits=4, group_size=64, axis=1,
    )
    assert qt_meta.is_meta_quantized
    assert isinstance(qt_meta.scale, QTensor) and qt_meta.scale.nbits == 8
    assert isinstance(qt_meta.zero, QTensor) and qt_meta.zero.nbits == 8
    assert not qt_plain.is_meta_quantized

    e_plain = _lp_err(w, np.asarray(dequantize(qt_plain, jnp.float32)))
    e_meta = _lp_err(w, np.asarray(dequantize(qt_meta, jnp.float32)))
    assert e_meta < e_plain * 1.15, f"meta-quant error blowup: {e_meta} vs {e_plain}"

    resolved = resolve_meta(qt_meta)
    assert not resolved.is_meta_quantized
    np.testing.assert_allclose(
        np.asarray(dequantize(resolved, jnp.float32)),
        np.asarray(dequantize(qt_meta, jnp.float32)),
    )


def test_meta_quantization_serialization_roundtrip(rng, tmp_path):
    from hqq_tpu.models.serialize import load_checkpoint, save_checkpoint
    from hqq_tpu.nn import QuantLinear

    w = rng.standard_normal((128, 64)).astype(np.float32)
    cfg = BaseQuantizeConfig(nbits=4, group_size=32, quant_zero=True, quant_scale=True)
    layer = QuantLinear.quantize(jnp.asarray(w), None, quant_config=cfg)
    assert layer.qweight.is_meta_quantized

    save_checkpoint(str(tmp_path / "ck"), {"l": layer})
    loaded, _ = load_checkpoint(str(tmp_path / "ck"))
    np.testing.assert_array_equal(
        np.asarray(loaded["l"].qweight.wq), np.asarray(layer.qweight.wq)
    )
    np.testing.assert_allclose(
        np.asarray(loaded["l"].dequantize(jnp.float32)),
        np.asarray(layer.dequantize(jnp.float32)),
    )


def test_update_scale_inverse_median(rng):
    from hqq_tpu.core.optimize import update_scale_inverse_median

    w = rng.standard_normal((64, 128)).astype(np.float32)
    w_f = jnp.asarray(w.reshape(64, -1))
    mx = w_f.max(axis=0, keepdims=True)
    mn = w_f.min(axis=0, keepdims=True)
    scale = 15.0 / (mx - mn)
    zero = -mn * scale
    new_scale, zero_c = update_scale_inverse_median(w_f, scale, zero, 0, (0.0, 15.0))
    assert new_scale.shape == scale.shape

    def err(s, z):
        wq = np.clip(np.round(np.asarray(w_f) * np.asarray(s) + np.asarray(z)), 0, 15)
        return np.abs(np.asarray(w_f) - (wq - np.asarray(z)) / np.asarray(s)).mean()

    assert err(new_scale, zero_c) <= err(scale, zero_c) * 1.001


def test_int8_backend_matches_xla(rng):
    from hqq_tpu.backends.int8_backend import patch_quantlinear_to_int8
    from hqq_tpu.nn import QuantLinear

    w = rng.standard_normal((128, 64)).astype(np.float32) / 8.0
    b = rng.standard_normal((128,)).astype(np.float32) / 8.0
    layer = QuantLinear.quantize(
        jnp.asarray(w), jnp.asarray(b), nbits=8, group_size=64,
        compute_dtype=jnp.float32,
    )
    i8 = patch_quantlinear_to_int8(layer)
    assert i8.w8.dtype == jnp.int8
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    y_ref = np.asarray(layer(x))
    y_i8 = np.asarray(i8(x))
    rel = np.abs(y_i8 - y_ref).mean() / (np.abs(y_ref).mean() + 1e-9)
    assert rel < 0.02, f"int8 backend relative error too high: {rel}"


def test_prepare_for_inference_int8(rng):
    from hqq_tpu.backends.int8_backend import Int8QuantLinear
    from hqq_tpu.nn import QuantLinear
    from hqq_tpu.utils.patching import prepare_for_inference

    w = rng.standard_normal((64, 32)).astype(np.float32)
    tree = {"a": QuantLinear.quantize(jnp.asarray(w), None, nbits=4, group_size=32)}
    out = prepare_for_inference(tree, backend="int8")
    assert isinstance(out["a"], Int8QuantLinear)
