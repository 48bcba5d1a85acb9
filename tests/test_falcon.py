# SPDX-License-Identifier: Apache-2.0
"""Falcon family: HF parity for all three block variants (new-decoder GQA,
legacy multi-query, non-parallel ALiBi), quantization + cached decode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import falcon


def _parity(hf_kwargs, rtol=5e-4):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        attn_implementation="eager", **hf_kwargs,
    )
    torch.manual_seed(0)
    model = transformers.FalconForCausalLM(hf_cfg).eval().float()
    cfg = falcon.FalconConfig.from_hf(hf_cfg.to_dict())
    params = falcon.params_from_hf_state_dict(
        dict(model.state_dict()), cfg, dtype=jnp.float32
    )
    toks = np.array([[3, 14, 15, 92, 65, 35, 89, 79]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = falcon.forward(params, cfg, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=rtol, atol=rtol)
    return cfg, params


def test_falcon_new_decoder_gqa_parity():
    # Falcon-40B/180B-style: grouped qkv, two parallel LNs
    _parity(dict(new_decoder_architecture=True, num_kv_heads=2,
                 multi_query=False, parallel_attn=True, bias=False))


def test_falcon_multi_query_parity():
    # Falcon-7B-style: [nh q | 1 k | 1 v], single shared LN, parallel residual
    _parity(dict(new_decoder_architecture=False, multi_query=True,
                 parallel_attn=True, bias=False))


def test_falcon_alibi_nonparallel_parity():
    # falcon-rw-style: sequential LNs, ALiBi instead of rotary
    _parity(dict(new_decoder_architecture=False, multi_query=False,
                 parallel_attn=False, alibi=True, bias=True))


def test_falcon_quantized_cached_decode():
    from hqq_tpu.models.base import quantize_model

    cfg = falcon.FalconConfig.tiny(new_decoder_architecture=True,
                                   num_kv_heads=2, multi_query=False)
    params = falcon.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=8, group_size=16),
                       compute_dtype=jnp.float32)
    toks = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    full, _ = falcon.forward(q, cfg, toks)
    cache = falcon.init_cache(cfg, 1, 32, jnp.float32)
    logits = None
    for pos in range(4):
        logits, cache = falcon.forward(q, cfg, toks[:, pos:pos + 1], cache, pos)
    np.testing.assert_allclose(
        np.asarray(logits[0, -1]), np.asarray(full[0, -1]), rtol=2e-4, atol=2e-4
    )


def test_falcon_alibi_cached_matches_full():
    """ALiBi + cache: decode logits match the full forward (the absolute-
    position bias form is softmax-equivalent to the relative one)."""
    cfg = falcon.FalconConfig.tiny(multi_query=False, parallel_attn=False,
                                   alibi=True, bias=True)
    params = falcon.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    toks = jnp.asarray([[3, 7, 11, 2, 9]], jnp.int32)
    full, _ = falcon.forward(params, cfg, toks)
    cache = falcon.init_cache(cfg, 1, 16, jnp.float32)
    logits = None
    for pos in range(5):
        logits, cache = falcon.forward(params, cfg, toks[:, pos:pos + 1], cache, pos)
    np.testing.assert_allclose(
        np.asarray(logits[0, -1]), np.asarray(full[0, -1]), rtol=2e-4, atol=2e-4
    )
