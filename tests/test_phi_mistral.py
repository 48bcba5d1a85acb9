# SPDX-License-Identifier: Apache-2.0
"""Mistral (sliding-window) and Phi (parallel-residual, partial-rotary) model
family tests, incl. logits parity vs HF transformers on shared weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import mistral, phi, quantize_model
from hqq_tpu.models.llama import forward as llama_forward


# ---------------------------------------------------------------------------
# Mistral
# ---------------------------------------------------------------------------


def test_mistral_sliding_window_masks_old_tokens():
    """With a window of w and ONE layer, keys <= pos-w cannot influence
    logits (multi-layer models widen the receptive field to w*L, so the
    single-layer case is the exact property)."""
    import dataclasses as _dc

    cfg = _dc.replace(mistral.MistralConfig.tiny(), num_hidden_layers=1)
    assert cfg.sliding_window == 16
    params = mistral.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)

    t = 24  # longer than the window
    tokens = (jnp.arange(t, dtype=jnp.int32) * 5 + 1).reshape(1, t) % cfg.vocab_size
    logits_a, _ = mistral.forward(params, cfg, tokens)

    # Perturb the first 4 tokens: positions >= 4 + window must be unaffected.
    tokens_b = tokens.at[0, :4].set((tokens[0, :4] + 7) % cfg.vocab_size)
    logits_b, _ = mistral.forward(params, cfg, tokens_b)

    far = 4 + cfg.sliding_window  # first position that cannot see tokens [0,4)
    np.testing.assert_allclose(
        np.asarray(logits_a[:, far:]), np.asarray(logits_b[:, far:]),
        rtol=1e-5, atol=1e-5,
    )
    # sanity: positions inside the window DO change
    assert np.abs(np.asarray(logits_a[:, 4:far]) - np.asarray(logits_b[:, 4:far])).max() > 1e-4


def test_mistral_hf_logits_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.MistralConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        sliding_window=8,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.MistralForCausalLM(hf_cfg).eval().float()

    cfg = mistral.MistralConfig.from_hf(hf_cfg.to_dict())
    assert cfg.sliding_window == 8
    from hqq_tpu.models import params_from_hf_state_dict

    params = params_from_hf_state_dict(dict(model.state_dict()), cfg, dtype=jnp.float32)

    tokens = np.array([[3, 14, 15, 92, 65, 35, 89, 79, 32, 38, 46, 26]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = mistral.forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_mistral_cached_decode_matches_full():
    cfg = mistral.MistralConfig.tiny()
    params = mistral.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    t = 20
    tokens = (jnp.arange(t, dtype=jnp.int32) * 3 + 2).reshape(1, t) % cfg.vocab_size
    logits_full, _ = mistral.forward(params, cfg, tokens)

    cache = mistral.init_cache(cfg, batch=1, max_len=32, dtype=jnp.float32)
    _, cache = mistral.forward(params, cfg, tokens[:, :10], cache, start_pos=0)
    outs = []
    for i in range(10, t):
        lg, cache = mistral.forward(params, cfg, tokens[:, i : i + 1], cache, start_pos=i)
        outs.append(lg[:, 0])
    decoded = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(
        decoded, np.asarray(logits_full[:, 10:]), rtol=2e-3, atol=2e-3
    )


# ---------------------------------------------------------------------------
# Phi
# ---------------------------------------------------------------------------


def test_phi_hf_logits_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.PhiConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=128,
        partial_rotary_factor=0.5,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.PhiForCausalLM(hf_cfg).eval().float()

    cfg = phi.PhiConfig.from_hf(hf_cfg.to_dict())
    params = phi.params_from_hf_state_dict(dict(model.state_dict()), cfg, dtype=jnp.float32)

    tokens = np.array([[3, 14, 15, 92, 65, 35]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = phi.forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_phi_cached_decode_matches_full():
    cfg = phi.PhiConfig.tiny()
    params = phi.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    t = 12
    tokens = (jnp.arange(t, dtype=jnp.int32) * 7 + 3).reshape(1, t) % cfg.vocab_size
    logits_full, _ = phi.forward(params, cfg, tokens)

    cache = phi.init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    _, cache = phi.forward(params, cfg, tokens[:, :6], cache, start_pos=0)
    outs = []
    for i in range(6, t):
        lg, cache = phi.forward(params, cfg, tokens[:, i : i + 1], cache, start_pos=i)
        outs.append(lg[:, 0])
    decoded = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(
        decoded, np.asarray(logits_full[:, 6:]), rtol=2e-3, atol=2e-3
    )


def test_phi_quantize_model():
    from hqq_tpu.models.base import iter_linears
    from hqq_tpu.nn import Linear, QuantLinear

    cfg = phi.PhiConfig.tiny()
    params = phi.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    qparams = quantize_model(
        params, BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32
    )
    tags = set()
    for path, layer in iter_linears(qparams):
        if "lm_head" in path:
            assert isinstance(layer, Linear)
        else:
            assert isinstance(layer, QuantLinear), path
            from hqq_tpu.models.base import name_to_linear_tag

            tags.add(name_to_linear_tag(path))
    assert tags == set(phi.LINEAR_TAGS)

    tokens = jnp.arange(8, dtype=jnp.int32).reshape(1, 8)
    logits_fp, _ = phi.forward(params, cfg, tokens)
    logits_q, _ = phi.forward(qparams, cfg, tokens)
    rel = np.abs(np.asarray(logits_q) - np.asarray(logits_fp)).mean() / (
        np.abs(np.asarray(logits_fp)).mean() + 1e-9
    )
    assert rel < 0.5


def test_phi3_hf_parity():
    """Phi-3's native fused qkv/gate_up map straight onto llama.forward's
    fused-layer contract."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from hqq_tpu.models import phi3

    hf_cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.Phi3ForCausalLM(hf_cfg).eval().float()

    cfg = phi3.Phi3Config.from_hf(hf_cfg.to_dict())
    params = phi3.params_from_hf_state_dict(
        dict(model.state_dict()), cfg, dtype=jnp.float32
    )
    toks = np.array([[3, 14, 15, 92, 65, 35]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = phi3.forward(params, cfg, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_phi3_quantize_decode_w4a8():
    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import llama, phi3
    from hqq_tpu.models.base import quantize_model
    from hqq_tpu.utils.patching import prepare_for_inference

    cfg = phi3.Phi3Config.tiny()
    params = phi3.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    toks = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    cache = phi3.init_cache(cfg, 1, 16, jnp.float32)
    ref, _ = phi3.forward(q, cfg, toks, cache, 0)
    a8 = prepare_for_inference(q, "w4a8")
    cache2 = phi3.init_cache(cfg, 1, 16, jnp.float32)
    got, _ = phi3.forward(a8, cfg, toks, cache2, 0)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel
