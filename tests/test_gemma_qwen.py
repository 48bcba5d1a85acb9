# SPDX-License-Identifier: Apache-2.0
"""Gemma + Qwen2 families: HF logits parity on shared random weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import gemma, params_from_hf_state_dict, quantize_model
from hqq_tpu.models.llama import LlamaConfig, forward as llama_forward


def test_gemma_hf_logits_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.GemmaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.GemmaForCausalLM(hf_cfg).eval().float()

    cfg = gemma.GemmaConfig.from_hf(hf_cfg.to_dict())
    params = params_from_hf_state_dict(dict(model.state_dict()), cfg, dtype=jnp.float32)

    tokens = np.array([[3, 14, 15, 92, 65, 35]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = gemma.forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_gemma_quantized_cached_decode():
    cfg = gemma.GemmaConfig.tiny()
    params = gemma.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    t = 10
    toks = (jnp.arange(t, dtype=jnp.int32) * 3 + 1).reshape(1, t) % cfg.vocab_size
    full, _ = gemma.forward(q, cfg, toks)
    cache = gemma.init_cache(cfg, 1, 16, jnp.float32)
    _, cache = gemma.forward(q, cfg, toks[:, :6], cache, 0)
    outs = []
    for i in range(6, t):
        lg, cache = gemma.forward(q, cfg, toks[:, i:i+1], cache, i)
        outs.append(lg[:, 0])
    dec = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(dec, np.asarray(full[:, 6:]), rtol=2e-3, atol=2e-3)


def test_qwen2_hf_logits_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.Qwen2Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval().float()

    cfg = LlamaConfig.from_hf(hf_cfg.to_dict())
    params = params_from_hf_state_dict(dict(model.state_dict()), cfg, dtype=jnp.float32)
    # qkv biases must have been picked up
    assert params["layers"][0]["self_attn"]["q_proj"].bias is not None

    tokens = np.array([[3, 14, 15, 92, 65, 35]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = llama_forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_qwen3_hf_logits_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.Qwen3Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.Qwen3ForCausalLM(hf_cfg).eval().float()

    cfg = LlamaConfig.from_hf(hf_cfg.to_dict())
    params = params_from_hf_state_dict(dict(model.state_dict()), cfg, dtype=jnp.float32)
    assert "q_norm" in params["layers"][0]["self_attn"]

    tokens = np.array([[3, 14, 15, 92, 65, 35]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = llama_forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_qwen3_quantized_cached_decode():
    """q/k-norm models run quantized through the cached decode path."""
    import dataclasses as dc

    cfg = dc.replace(LlamaConfig.tiny(), head_dim=32)
    params = __import__("hqq_tpu.models.llama", fromlist=["init_params"]).init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32
    )
    for layer in params["layers"]:
        layer["self_attn"]["q_norm"] = jnp.ones((cfg.head_dim_,), jnp.float32)
        layer["self_attn"]["k_norm"] = jnp.ones((cfg.head_dim_,), jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    from hqq_tpu.models import init_cache
    t = 10
    toks = (jnp.arange(t, dtype=jnp.int32) * 3 + 1).reshape(1, t) % cfg.vocab_size
    full, _ = llama_forward(q, cfg, toks)
    cache = init_cache(cfg, 1, 16, jnp.float32)
    _, cache = llama_forward(q, cfg, toks[:, :6], cache, 0)
    outs = []
    for i in range(6, t):
        lg, cache = llama_forward(q, cfg, toks[:, i:i+1], cache, i)
        outs.append(lg[:, 0])
    dec = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(dec, np.asarray(full[:, 6:]), rtol=2e-3, atol=2e-3)


def test_gemma2_hf_logits_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from hqq_tpu.models import gemma2

    hf_cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, query_pre_attn_scalar=16,
        sliding_window=8, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.Gemma2ForCausalLM(hf_cfg).eval().float()

    cfg = gemma2.Gemma2Config.from_hf(hf_cfg.to_dict())
    assert cfg.attn_logit_softcapping == 50.0
    params = gemma2.params_from_hf_state_dict(dict(model.state_dict()), cfg)

    tokens = np.array([[3, 14, 15, 92, 65, 35, 19, 41, 77, 2, 8, 101]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = gemma2.forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_gemma2_quantized_cached_decode():
    from hqq_tpu.models import gemma2

    cfg = gemma2.Gemma2Config.tiny()
    params = gemma2.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    t = 20  # longer than the sliding window (16) to exercise both masks
    toks = (jnp.arange(t, dtype=jnp.int32) * 3 + 1).reshape(1, t) % cfg.vocab_size
    full, _ = gemma2.forward(q, cfg, toks)
    cache = gemma2.init_cache(cfg, 1, 32, jnp.float32)
    _, cache = gemma2.forward(q, cfg, toks[:, :10], cache, 0)
    outs = []
    for i in range(10, t):
        lg, cache = gemma2.forward(q, cfg, toks[:, i:i+1], cache, i)
        outs.append(lg[:, 0])
    dec = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(dec, np.asarray(full[:, 10:]), rtol=2e-3, atol=2e-3)


def test_gemma3_hf_logits_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from hqq_tpu.models import gemma3

    hf_cfg = transformers.Gemma3TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, query_pre_attn_scalar=16,
        sliding_window=8, rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.Gemma3ForCausalLM(hf_cfg).eval().float()

    cfg = gemma3.Gemma3Config.from_hf(hf_cfg.to_dict())
    assert cfg.layer_types is not None
    params = gemma3.params_from_hf_state_dict(dict(model.state_dict()), cfg)

    tokens = np.array([[3, 14, 15, 92, 65, 35, 19, 41, 77, 2, 8, 101]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = gemma3.forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=4e-4, atol=4e-4)


def test_gemma3_quantized_cached_decode():
    from hqq_tpu.models import gemma3

    cfg = gemma3.Gemma3Config.tiny()
    params = gemma3.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    t = 20
    toks = (jnp.arange(t, dtype=jnp.int32) * 3 + 1).reshape(1, t) % cfg.vocab_size
    full, _ = gemma3.forward(q, cfg, toks)
    cache = gemma3.init_cache(cfg, 1, 32, jnp.float32)
    _, cache = gemma3.forward(q, cfg, toks[:, :10], cache, 0)
    outs = []
    for i in range(10, t):
        lg, cache = gemma3.forward(q, cfg, toks[:, i:i+1], cache, i)
        outs.append(lg[:, 0])
    dec = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(dec, np.asarray(full[:, 10:]), rtol=2e-3, atol=2e-3)
