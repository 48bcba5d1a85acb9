# SPDX-License-Identifier: Apache-2.0
"""ViT model family: HF logits parity, quantization, engine save/load."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import vit


def test_vit_forward_shapes():
    cfg = vit.ViTConfig.tiny()
    params = vit.init_params(cfg, jax.random.PRNGKey(0))
    pixels = jnp.ones((2, 3, cfg.image_size, cfg.image_size), jnp.float32)
    logits, hidden = vit.forward(params, cfg, pixels)
    assert logits.shape == (2, cfg.num_labels)
    assert hidden.shape == (2, cfg.num_patches + 1, cfg.hidden_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_vit_hf_logits_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.ViTConfig(
        image_size=32,
        patch_size=8,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_labels=10,
    )
    torch.manual_seed(0)
    model = transformers.ViTForImageClassification(hf_cfg).eval().float()

    cfg = vit.ViTConfig.from_hf(hf_cfg.to_dict())
    assert cfg.num_labels == 10
    params = vit.params_from_hf_state_dict(dict(model.state_dict()), cfg)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(pixels)).logits.numpy()
    ours, _ = vit.forward(params, cfg, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_vit_quantize_and_engine_roundtrip(tmp_path):
    from hqq_tpu.engine.vision import AutoHQQVisionModel, HQQVisionModel
    from hqq_tpu.models.base import iter_linears, name_to_linear_tag
    from hqq_tpu.nn import Linear, QuantLinear

    cfg = vit.ViTConfig.tiny()
    params = vit.init_params(cfg, jax.random.PRNGKey(1))
    model = HQQVisionModel(params=params, cfg=cfg)
    rng = np.random.default_rng(1)
    pixels = jnp.asarray(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
    logits_fp, _ = model.forward(pixels)

    model.quantize_model(BaseQuantizeConfig(nbits=8, group_size=32),
                         compute_dtype=jnp.float32)
    tags = set()
    for path, layer in iter_linears(model.params):
        if "patch_proj" in path or "classifier" in path:
            assert isinstance(layer, Linear), path
        else:
            assert isinstance(layer, QuantLinear), path
            tags.add(name_to_linear_tag(path))
    assert tags == set(vit.LINEAR_TAGS)

    logits_q, _ = model.forward(pixels)
    rel = np.abs(np.asarray(logits_q) - np.asarray(logits_fp)).mean() / (
        np.abs(np.asarray(logits_fp)).mean() + 1e-9
    )
    assert rel < 0.05, rel

    model.save_quantized(str(tmp_path / "vit_q"))
    loaded = AutoHQQVisionModel.from_quantized(str(tmp_path / "vit_q"))
    logits_l, _ = loaded.forward(pixels)
    np.testing.assert_allclose(
        np.asarray(logits_l), np.asarray(logits_q), rtol=1e-5, atol=1e-5
    )


def test_vit_w4a8_backend():
    """Vision models serve through the w4a8 backend like the LLMs."""
    import numpy as np

    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import vit
    from hqq_tpu.models.base import quantize_model
    from hqq_tpu.utils.patching import prepare_for_inference

    cfg = vit.ViTConfig.tiny()
    params = vit.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    pixels = jax.random.normal(jax.random.PRNGKey(1),
                               (1, 3, cfg.image_size, cfg.image_size), jnp.float32)
    ref, _ = vit.forward(q, cfg, pixels)
    a8 = prepare_for_inference(q, "w4a8")
    got, _ = vit.forward(a8, cfg, pixels)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert np.isfinite(rel) and rel < 0.05, rel
