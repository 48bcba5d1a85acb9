# SPDX-License-Identifier: Apache-2.0
"""Model-level tests: Llama forward parity vs HF transformers (same weights),
param-tree quantization, save/load roundtrip (≙ reference
`tests/test_quantize.py:185-217`), and cached-decode consistency."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import (
    LlamaConfig,
    forward,
    from_quantized,
    get_linear_tags,
    init_cache,
    init_params,
    name_to_linear_tag,
    params_from_hf_state_dict,
    quantize_model,
    save_quantized,
)
from hqq_tpu.nn import Linear, QuantLinear


@pytest.fixture(scope="module")
def tiny():
    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def test_forward_shapes(tiny):
    cfg, params = tiny
    tokens = jnp.arange(10, dtype=jnp.int32).reshape(1, 10) % cfg.vocab_size
    logits, _ = forward(params, cfg, tokens)
    assert logits.shape == (1, 10, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_cache_decode_matches_full(tiny):
    """Prefill+decode through the static cache == one full forward."""
    cfg, params = tiny
    T = 12
    tokens = (jnp.arange(T, dtype=jnp.int32).reshape(1, T) * 7 + 3) % cfg.vocab_size

    logits_full, _ = forward(params, cfg, tokens)

    cache = init_cache(cfg, batch=1, max_len=32, dtype=jnp.float32)
    logits_pre, cache = forward(params, cfg, tokens[:, :8], cache, start_pos=0)
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_full[:, :8]), rtol=2e-3, atol=2e-3
    )
    outs = []
    for i in range(8, T):
        step_logits, cache = forward(params, cfg, tokens[:, i : i + 1], cache, start_pos=i)
        outs.append(step_logits[:, 0])
    decoded = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(
        decoded, np.asarray(logits_full[:, 8:]), rtol=2e-3, atol=2e-3
    )


def test_hf_logits_parity():
    """Our functional Llama == transformers LlamaForCausalLM on the same
    random weights (validates RoPE/GQA/RMSNorm conventions)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval().float()

    cfg = LlamaConfig.from_hf(hf_cfg.to_dict())
    params = params_from_hf_state_dict(
        dict(model.state_dict()), cfg, dtype=jnp.float32
    )

    tokens = np.array([[3, 14, 15, 92, 65, 35]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_linear_tags(tiny):
    cfg, params = tiny
    tags = get_linear_tags(params)
    assert set(tags) == {
        "self_attn.q_proj",
        "self_attn.k_proj",
        "self_attn.v_proj",
        "self_attn.o_proj",
        "mlp.gate_proj",
        "mlp.up_proj",
        "mlp.down_proj",
    }
    assert name_to_linear_tag("layers.11.self_attn.q_proj") == "self_attn.q_proj"


def test_quantize_model_uniform(tiny):
    cfg, params = tiny
    qparams = quantize_model(
        params, BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32
    )
    # all 7 tags quantized, lm_head untouched
    for path, layer in __import__("hqq_tpu.models.base", fromlist=["iter_linears"]).iter_linears(qparams):
        if "lm_head" in path:
            assert isinstance(layer, Linear)
        else:
            assert isinstance(layer, QuantLinear), path

    tokens = jnp.arange(8, dtype=jnp.int32).reshape(1, 8)
    logits_fp, _ = forward(params, cfg, tokens)
    logits_q, _ = forward(qparams, cfg, tokens)
    # 4-bit model stays close to fp on a tiny random model
    rel = np.abs(np.asarray(logits_q) - np.asarray(logits_fp)).mean() / (
        np.abs(np.asarray(logits_fp)).mean() + 1e-9
    )
    assert rel < 0.5


def test_quantize_model_per_tag(tiny):
    cfg, params = tiny
    qcfg = {
        "self_attn.q_proj": BaseQuantizeConfig(nbits=4, group_size=32),
        "self_attn.k_proj": None,  # skip
        "mlp.down_proj": BaseQuantizeConfig(nbits=2, group_size=32),
    }
    qparams = quantize_model(params, qcfg)
    l0 = qparams["layers"][0]
    assert isinstance(l0["self_attn"]["q_proj"], QuantLinear)
    assert isinstance(l0["self_attn"]["k_proj"], Linear)
    assert isinstance(l0["self_attn"]["v_proj"], Linear)  # unlisted -> skip
    assert isinstance(l0["mlp"]["down_proj"], QuantLinear)
    assert l0["mlp"]["down_proj"].qweight.nbits == 2


def test_save_load_roundtrip(tiny, tmp_path):
    cfg, params = tiny
    qparams = quantize_model(
        params, BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32
    )
    tokens = jnp.arange(8, dtype=jnp.int32).reshape(1, 8)
    logits_before, _ = forward(qparams, cfg, tokens)

    save_quantized(qparams, str(tmp_path / "ckpt"), config={"arch": "llama", "hidden_size": 256})
    params2, config2 = from_quantized(str(tmp_path / "ckpt"))
    assert config2["arch"] == "llama"

    logits_after, _ = forward(params2, cfg, tokens)
    np.testing.assert_array_equal(np.asarray(logits_before), np.asarray(logits_after))

    # quant meta survives
    ql = params2["layers"][0]["self_attn"]["q_proj"]
    assert isinstance(ql, QuantLinear)
    assert ql.qweight.nbits == 4 and ql.qweight.group_size == 32


def test_quantize_lm_head_optional(tiny):
    """lm_head is skipped by default (reference behavior) but quantizes with
    ignore=() — useful at 8-bit to cut decode head bytes."""
    cfg, params = tiny
    q = quantize_model(params, BaseQuantizeConfig(nbits=8, group_size=32),
                       compute_dtype=jnp.float32, ignore=())
    from hqq_tpu.models.base import iter_linears
    heads = [l for p, l in iter_linears(q) if "lm_head" in p]
    assert len(heads) == 1 and isinstance(heads[0], QuantLinear)
    tokens = jnp.arange(6, dtype=jnp.int32).reshape(1, 6)
    logits_fp, _ = forward(params, cfg, tokens)
    logits_q, _ = forward(q, cfg, tokens)
    rel = np.abs(np.asarray(logits_q) - np.asarray(logits_fp)).mean() / (
        np.abs(np.asarray(logits_fp)).mean() + 1e-9)
    assert rel < 0.05, rel


def test_quantize_model_axis0(tiny):
    """Quality-mode grouping (axis=0, BASELINE config 3): model-level config
    with axis=0 quantizes and serves through the XLA backend."""
    cfg, params = tiny
    q = quantize_model(params, BaseQuantizeConfig(nbits=3, group_size=32, axis=0),
                       compute_dtype=jnp.float32)
    from hqq_tpu.models.base import iter_linears
    for path, layer in iter_linears(q):
        if "lm_head" not in path:
            assert layer.qweight.axis == 0, path
    tokens = jnp.arange(6, dtype=jnp.int32).reshape(1, 6)
    logits, _ = forward(q, cfg, tokens)
    assert np.isfinite(np.asarray(logits)).all()


def test_llama31_rope_scaling_hf_parity():
    """Llama-3.1-style rope_scaling ("llama3" smooth frequency interpolation)
    matches HF bit-for-bit at positions past the scaling knee."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import numpy as np

    from hqq_tpu.models import hf as hf_loader
    from hqq_tpu.models import llama

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        rope_theta=10000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval().float()

    cfg = llama.LlamaConfig.from_hf(hf_cfg.to_dict())
    assert cfg.rope_scaling_dict["rope_type"] == "llama3"
    params = hf_loader.params_from_hf_state_dict(
        dict(model.state_dict()), cfg, jnp.float32
    )
    toks = np.array([np.arange(96) % 120], np.int64)  # past the 64-token knee
    with torch.no_grad():
        ref = model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = llama.forward(params, cfg, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_unsupported_rope_scaling_rejected():
    from hqq_tpu.models import llama

    with pytest.raises(AssertionError):
        llama.LlamaConfig.from_hf({
            "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "rope_scaling": {"rope_type": "longrope", "factor": 4.0},
        })

