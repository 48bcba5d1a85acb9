# SPDX-License-Identifier: Apache-2.0
"""StarCoder2 + OLMo-2 families: HF logits parity + quantized cached decode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import olmo2, quantize_model, starcoder2


def test_starcoder2_hf_logits_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.Starcoder2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, use_bias=True, sliding_window=None,
        attn_implementation="eager", tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    model = transformers.Starcoder2ForCausalLM(hf_cfg).eval().float()

    cfg = starcoder2.Starcoder2Config.from_hf(hf_cfg.to_dict())
    params = starcoder2.params_from_hf_state_dict(dict(model.state_dict()), cfg)
    tokens = np.array([[3, 14, 15, 92, 65, 35]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = starcoder2.forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_olmo2_hf_logits_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.Olmo2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.Olmo2ForCausalLM(hf_cfg).eval().float()

    cfg = olmo2.Olmo2Config.from_hf(hf_cfg.to_dict())
    params = olmo2.params_from_hf_state_dict(dict(model.state_dict()), cfg)
    tokens = np.array([[3, 14, 15, 92, 65, 35]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = olmo2.forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("mod", [starcoder2, olmo2])
def test_quantized_cached_decode(mod):
    cfg = (mod.Starcoder2Config if mod is starcoder2 else mod.Olmo2Config).tiny()
    params = mod.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    t = 10
    toks = (jnp.arange(t, dtype=jnp.int32) * 3 + 1).reshape(1, t) % cfg.vocab_size
    full, _ = mod.forward(q, cfg, toks)
    cache = mod.init_cache(cfg, 1, 16, jnp.float32)
    _, cache = mod.forward(q, cfg, toks[:, :6], cache, 0)
    outs = []
    for i in range(6, t):
        lg, cache = mod.forward(q, cfg, toks[:, i:i+1], cache, i)
        outs.append(lg[:, 0])
    dec = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(dec, np.asarray(full[:, 6:]), rtol=2e-3, atol=2e-3)


def test_granite_hf_logits_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from hqq_tpu.models import granite, params_from_hf_state_dict

    hf_cfg = transformers.GraniteConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, embedding_multiplier=12.0,
        residual_multiplier=0.22, attention_multiplier=0.0625,
        logits_scaling=8.0, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.GraniteForCausalLM(hf_cfg).eval().float()

    cfg = granite.GraniteConfig.from_hf(hf_cfg.to_dict())
    assert cfg.logits_scaling == 8.0
    params = params_from_hf_state_dict(dict(model.state_dict()), cfg)
    tokens = np.array([[3, 14, 15, 92, 65, 35]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = granite.forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    # multipliers (12x embed) amplify benign fp reordering noise slightly
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)
