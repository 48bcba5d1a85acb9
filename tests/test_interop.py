# SPDX-License-Identifier: Apache-2.0
"""End-to-end interop: quantize a tiny Llama with the REFERENCE torch library
on CPU, save in its format, import into hqq_tpu, and match logits."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp


def _load_reference():
    sys.path.insert(0, "/root/reference")
    try:
        from hqq.core.quantize import BaseQuantizeConfig as RefCfg  # type: ignore
        from hqq.models.hf.base import AutoHQQHFModel  # type: ignore

        return RefCfg, AutoHQQHFModel
    except Exception:
        return None, None
    finally:
        sys.path.pop(0)


def test_import_reference_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    RefCfg, RefAuto = _load_reference()
    if RefAuto is None:
        pytest.skip("reference hqq not importable")

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval().float()

    cfg_q = RefCfg(nbits=4, group_size=32)
    RefAuto.quantize_model(
        model, quant_config=cfg_q, device="cpu", compute_dtype=torch.float32
    )
    ref_dir = str(tmp_path / "ref_q")
    RefAuto.save_quantized(model, ref_dir)

    toks = np.array([[3, 14, 15, 92, 65]], np.int64)
    with torch.no_grad():
        ref_logits = model(torch.from_numpy(toks)).logits.numpy()

    from hqq_tpu.models import forward
    from hqq_tpu.models.interop import import_reference_quantized

    params, cfg = import_reference_quantized(ref_dir, compute_dtype=jnp.float32)
    ours, _ = forward(params, cfg, jnp.asarray(toks, jnp.int32))

    np.testing.assert_allclose(
        np.asarray(ours), ref_logits, rtol=5e-3, atol=5e-3
    )


def test_gptq_pack_rows_roundtrip(rng):
    from hqq_tpu.models.interop import pack_rows, unpack_rows

    for nbits in (8, 4, 2):
        k, n = 64, 32
        codes = rng.integers(0, 2**nbits, (k, n)).astype(np.int64)
        packed = pack_rows(codes, nbits)
        assert packed.dtype == np.int32
        assert packed.shape == (k * nbits // 32, n)
        out = unpack_rows(packed, nbits, k, n)
        np.testing.assert_array_equal(out, codes.astype(np.uint8))


def test_gptq_export_import_roundtrip(rng):
    import jax.numpy as jnp
    from hqq_tpu.core.quantize import dequantize, quantize
    from hqq_tpu.models.interop import export_gptq, import_gptq

    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    # integral zeros required for true-GPTQ qzeros: round_zero + no solver
    qt = quantize(w, nbits=4, group_size=32, axis=1, round_zero=True, optimize=False)
    t = export_gptq(qt)
    assert t["qweight"].shape == (128 // 8, 64)
    assert t["scales"].shape == (128 // 32, 64)

    qt2 = import_gptq(t, nbits=4, group_size=32)
    # same codes, same dequantized weights (scales roundtrip via fp16)
    np.testing.assert_allclose(
        np.asarray(dequantize(qt2, jnp.float32)),
        np.asarray(dequantize(qt, jnp.float32)),
        rtol=2e-3, atol=2e-3,
    )
