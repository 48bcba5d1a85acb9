# SPDX-License-Identifier: Apache-2.0
"""Engine facade + PPL harness tests."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.engine import HQQModelForCausalLM
from hqq_tpu.models import LlamaConfig, forward, init_params
from hqq_tpu.utils import perplexity, prepare_for_inference


def _write_hf_checkpoint(tmp_path):
    """Create a tiny HF-format Llama checkpoint on disk via transformers."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(hf_cfg).eval().float()
    d = str(tmp_path / "hf_model")
    m.save_pretrained(d, safe_serialization=True)
    return d, m


def test_engine_end_to_end(tmp_path):
    d, ref_model = _write_hf_checkpoint(tmp_path)
    model = HQQModelForCausalLM.from_pretrained(d, compute_dtype=jnp.float32)
    assert model.model_type == "llama"

    # fp logits parity with the HF model we saved
    import torch

    toks = np.array([[1, 5, 9, 2]], np.int64)
    with torch.no_grad():
        ref = ref_model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = model.forward(jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)

    # quantize -> save -> reload -> identical logits
    model.quantize_model(BaseQuantizeConfig(nbits=4, group_size=32),
                         compute_dtype=jnp.float32)
    q_logits, _ = model.forward(jnp.asarray(toks, jnp.int32))
    out_dir = str(tmp_path / "quantized")
    model.save_quantized(out_dir)

    model2 = HQQModelForCausalLM.from_quantized(out_dir)
    assert model2.quantized
    q2_logits, _ = model2.forward(jnp.asarray(toks, jnp.int32))
    np.testing.assert_array_equal(np.asarray(q_logits), np.asarray(q2_logits))

    # generate API
    out = model2.generate([[1, 5, 9]], max_new_tokens=5, cache_dtype=jnp.float32)
    assert out.shape == (1, 5)


def test_prepare_for_inference_engine(tmp_path):
    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    from hqq_tpu.models import quantize_model

    qparams = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                             compute_dtype=jnp.float32)
    pparams = prepare_for_inference(qparams, backend="pallas")
    from hqq_tpu.backends import PallasQuantLinear

    assert isinstance(pparams["layers"][0]["mlp"]["gate_proj"], PallasQuantLinear)
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    a, _ = forward(qparams, cfg, toks)
    b, _ = forward(pparams, cfg, toks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_perplexity_matches_direct():
    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    ids = np.random.default_rng(0).integers(1, cfg.vocab_size, 64)

    # single window (max_length >= len): ppl == exp(-ll / len)
    ppl = perplexity(params, cfg, ids, max_length=64, stride=32)
    logits, _ = forward(params, cfg, jnp.asarray(ids[None, :-1], jnp.int32))
    logp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
    ll = np.take_along_axis(np.asarray(logp), ids[None, 1:, None], axis=-1).sum()
    expected = float(np.exp(-ll / len(ids)))
    assert abs(ppl - expected) / expected < 1e-4


def test_perplexity_sliding_window():
    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    ids = np.random.default_rng(1).integers(1, cfg.vocab_size, 200)
    ppl = perplexity(params, cfg, ids, max_length=64, stride=32)
    assert 0 < ppl < cfg.vocab_size * 2  # sane range for a random model

    # quantized 8-bit should barely move PPL; 2-bit should move it more
    from hqq_tpu.models import quantize_model

    q8 = quantize_model(params, BaseQuantizeConfig(nbits=8, group_size=32),
                        compute_dtype=jnp.float32)
    ppl8 = perplexity(q8, cfg, ids, max_length=64, stride=32)
    assert abs(ppl8 - ppl) / ppl < 0.02
