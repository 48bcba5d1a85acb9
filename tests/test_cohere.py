# SPDX-License-Identifier: Apache-2.0
"""Cohere (Command-R) family: HF parity, quantized decode, backends."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import cohere
from hqq_tpu.models.base import quantize_model


def test_cohere_hf_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.CohereConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, use_qk_norm=True, logit_scale=0.125,
        tie_word_embeddings=True, pad_token_id=0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.CohereForCausalLM(hf_cfg).eval().float()

    cfg = cohere.CohereConfig.from_hf(hf_cfg.to_dict())
    params = cohere.params_from_hf_state_dict(
        dict(model.state_dict()), cfg, dtype=jnp.float32
    )
    toks = np.array([[3, 14, 15, 92, 65, 35]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = cohere.forward(params, cfg, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_cohere_quantized_cached_decode():
    cfg = cohere.CohereConfig.tiny()
    params = cohere.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    toks = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    # full-seq (cache=None) vs incremental cached decode must agree
    full, _ = cohere.forward(q, cfg, toks)
    cache = cohere.init_cache(cfg, 1, 16, jnp.float32)
    logits = None
    for pos in range(4):
        logits, cache = cohere.forward(
            q, cfg, toks[:, pos:pos + 1], cache, pos
        )
    np.testing.assert_allclose(
        np.asarray(logits[0, -1]), np.asarray(full[0, -1]), rtol=2e-4, atol=2e-4
    )


def test_cohere_w4a8_backend():
    from hqq_tpu.utils.patching import prepare_for_inference

    cfg = cohere.CohereConfig.tiny()
    params = cohere.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    toks = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    ref, _ = cohere.forward(q, cfg, toks)
    a8 = prepare_for_inference(q, "w4a8")
    got, _ = cohere.forward(a8, cfg, toks)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel
