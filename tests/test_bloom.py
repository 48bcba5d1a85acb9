# SPDX-License-Identifier: Apache-2.0
"""BLOOM: HF logits parity (ALiBi, embedding LayerNorm, interleaved qkv),
post-LN-residual variant, quantization + cached decode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import bloom


def _parity(**hf_kwargs):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.BloomConfig(
        vocab_size=128, hidden_size=64, n_layer=2, n_head=4,
        attn_implementation="eager", **hf_kwargs,
    )
    torch.manual_seed(0)
    model = transformers.BloomForCausalLM(hf_cfg).eval().float()
    cfg = bloom.BloomConfig.from_hf(hf_cfg.to_dict())
    params = bloom.params_from_hf_state_dict(
        dict(model.state_dict()), cfg, dtype=jnp.float32
    )
    toks = np.array([[3, 14, 15, 92, 65, 35, 89, 79]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = bloom.forward(params, cfg, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)


def test_bloom_hf_parity():
    _parity()


def test_bloom_post_ln_residual_parity():
    _parity(apply_residual_connection_post_layernorm=True)


def test_bloom_quantized_cached_decode():
    from hqq_tpu.models.base import quantize_model

    cfg = bloom.BloomConfig.tiny()
    params = bloom.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=8, group_size=16),
                       compute_dtype=jnp.float32)
    toks = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    full, _ = bloom.forward(q, cfg, toks)
    cache = bloom.init_cache(cfg, 1, 32, jnp.float32)
    logits = None
    for pos in range(4):
        logits, cache = bloom.forward(q, cfg, toks[:, pos:pos + 1], cache, pos)
    np.testing.assert_allclose(
        np.asarray(logits[0, -1]), np.asarray(full[0, -1]), rtol=2e-4, atol=2e-4
    )
