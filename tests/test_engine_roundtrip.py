# SPDX-License-Identifier: Apache-2.0
"""Engine save → load roundtrip for EVERY registered text family.

≙ the reference's `test_save_and_load_model` (`/root/reference/tests/
test_quantize.py:185-203`) widened to the whole registry: quantize a tiny
model, `save_quantized`, `from_quantized`, and require identical logits.
Exercises the generic config reconstruction in `engine/hf.py`
(sidecar `config_class` + registry-owner fallback) for all model types."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.engine.hf import _HQQ_REGISTRY, HQQModel, HQQModelForCausalLM
from hqq_tpu.models import llama


def _build(model_type):
    key = jax.random.PRNGKey(0)
    if model_type in ("llama", "qwen2", "qwen3"):
        cfg = llama.LlamaConfig.tiny()
        params = llama.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "mistral":
        from hqq_tpu.models import mistral

        cfg = mistral.MistralConfig.tiny()
        params = llama.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "granite":
        from hqq_tpu.models import granite

        cfg = granite.GraniteConfig.tiny()
        params = llama.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "phi3":
        from hqq_tpu.models import phi3

        cfg = phi3.Phi3Config.tiny()
        params = phi3.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "phi":
        from hqq_tpu.models import phi

        cfg = phi.PhiConfig.tiny()
        params = phi.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "starcoder2":
        from hqq_tpu.models import starcoder2

        cfg = starcoder2.Starcoder2Config.tiny()
        params = starcoder2.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "olmo2":
        from hqq_tpu.models import olmo2

        cfg = olmo2.Olmo2Config.tiny()
        params = olmo2.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "deepseek_v3":
        from hqq_tpu.models import deepseek3

        cfg = deepseek3.DeepseekV3Config.tiny()
        params = deepseek3.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "gemma":
        from hqq_tpu.models import gemma

        cfg = gemma.GemmaConfig.tiny()
        params = gemma.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "gemma2":
        from hqq_tpu.models import gemma2

        cfg = gemma2.Gemma2Config.tiny()
        params = gemma2.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "gemma3_text":
        from hqq_tpu.models import gemma3

        cfg = gemma3.Gemma3Config.tiny()
        params = gemma3.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "gpt_oss":
        from hqq_tpu.models import gpt_oss

        cfg = gpt_oss.GptOssConfig.tiny()
        params = gpt_oss.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "cohere":
        from hqq_tpu.models import cohere

        cfg = cohere.CohereConfig.tiny()
        params = cohere.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "qwen3_moe":
        from hqq_tpu.models import qwen3_moe

        cfg = qwen3_moe.Qwen3MoeConfig.tiny()
        params = qwen3_moe.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "mixtral":
        from hqq_tpu.models import mixtral

        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "falcon":
        from hqq_tpu.models import falcon

        cfg = falcon.FalconConfig.tiny(new_decoder_architecture=True,
                                       num_kv_heads=2, multi_query=False)
        params = falcon.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "gpt2":
        from hqq_tpu.models import gpt2

        cfg = gpt2.GPT2Config.tiny()
        params = gpt2.init_params(cfg, key, dtype=jnp.float32)
    elif model_type == "bloom":
        from hqq_tpu.models import bloom

        cfg = bloom.BloomConfig.tiny()
        params = bloom.init_params(cfg, key, dtype=jnp.float32)
    else:  # pragma: no cover
        raise KeyError(model_type)
    return cfg, params


@pytest.mark.parametrize("model_type", sorted(_HQQ_REGISTRY))
def test_engine_roundtrip(model_type, tmp_path):
    cfg, params = _build(model_type)
    model = HQQModel(params=params, cfg=cfg, model_type=model_type)
    model.quantize_model(
        BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32
    )
    tokens = jnp.asarray([[3, 17, 29, 5]], jnp.int32)
    ref_logits, _ = model.forward(tokens)

    save_dir = str(tmp_path / model_type)
    model.save_quantized(save_dir)
    loaded = HQQModelForCausalLM.from_quantized(save_dir)
    assert loaded.model_type == model_type
    assert type(loaded.cfg) is type(cfg), (type(loaded.cfg), type(cfg))
    assert loaded.cfg == cfg
    got_logits, _ = loaded.forward(tokens)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=0, atol=1e-5
    )


def test_legacy_sidecar_without_config_class(tmp_path):
    """Checkpoints saved before `config_class` existed load via the registry
    owner-class fallback."""
    import json
    import os

    cfg, params = _build("gemma2")
    model = HQQModel(params=params, cfg=cfg, model_type="gemma2")
    model.quantize_model(
        BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32
    )
    save_dir = str(tmp_path / "legacy")
    model.save_quantized(save_dir)
    # strip the config_class field to simulate an old checkpoint
    cfg_path = os.path.join(save_dir, "hqq_config.json")
    if not os.path.exists(cfg_path):
        cands = [f for f in os.listdir(save_dir) if f.endswith(".json")]
        cfg_path = os.path.join(save_dir, cands[0])
    with open(cfg_path) as f:
        sidecar = json.load(f)
    (sidecar.get("config") or sidecar).pop("config_class", None)
    with open(cfg_path, "w") as f:
        json.dump(sidecar, f)
    loaded = HQQModelForCausalLM.from_quantized(save_dir)
    assert type(loaded.cfg).__name__ == "Gemma2Config"
