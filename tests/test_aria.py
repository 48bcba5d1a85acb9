# SPDX-License-Identifier: Apache-2.0
"""Aria: Idefics3 tower + cross-attention projector parity, full multimodal
logits parity vs HF `AriaForConditionalGeneration`, grouped-expert MoE
quantization (the reference's `HQQGroupedGemm` role, ref
`/root/reference/hqq/utils/aria.py:19-227`)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import aria


def _tiny_hf():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers.models.idefics3 import Idefics3VisionConfig

    vision = Idefics3VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=4,
    )
    text = transformers.AriaTextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        moe_num_experts=4, moe_topk=2, moe_num_shared_experts=2,
        max_position_embeddings=128,
    )
    hf_cfg = transformers.AriaConfig(
        vision_config=vision, text_config=text, image_token_index=254,
        projector_patch_to_query_dict={16: 4}, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.AriaForConditionalGeneration(hf_cfg).eval().float()

    cfg = aria.AriaConfig.from_hf(hf_cfg.to_dict())
    assert cfg.image_token_index == 254 and cfg.patch_to_query == ((16, 4),)
    # ample capacity -> no token drops -> exact parity with HF's dense loop
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(
            cfg.text, capacity_factor=float(cfg.text.moe_num_experts)
        )
    )
    text_p, vis_p = aria.params_from_hf_state_dict(
        dict(model.state_dict()), cfg, dtype=jnp.float32
    )
    params = {"text": text_p, **vis_p}
    return torch, model, cfg, params


@pytest.fixture(scope="module")
def setup():
    return _tiny_hf()


def _pixels(cfg, n_images=1, seed=0):
    vc = cfg.vision
    rng = np.random.default_rng(seed)
    return rng.standard_normal(
        (n_images, vc.num_channels, vc.image_size, vc.image_size)
    ).astype(np.float32)


def test_vision_projector_parity(setup):
    torch, model, cfg, params = setup
    px = _pixels(cfg)
    with torch.no_grad():
        ref = model.model.get_image_features(
            torch.from_numpy(px), vision_feature_layer=cfg.vision_feature_layer
        ).numpy()
    got = np.asarray(aria.vision_forward(params, cfg, jnp.asarray(px)))
    assert got.shape == ref.shape  # [1, query_num=4, text_hidden]
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def _prompt_with_image(cfg, query_num, t_text=6, seed=1):
    rng = np.random.default_rng(seed)
    toks = rng.integers(5, 200, size=(1, t_text)).astype(np.int64)
    img_toks = np.full((1, query_num), cfg.image_token_index, dtype=np.int64)
    return np.concatenate([toks[:, :3], img_toks, toks[:, 3:]], axis=1)


def test_multimodal_logits_parity(setup):
    torch, model, cfg, params = setup
    px = _pixels(cfg)
    ids = _prompt_with_image(cfg, query_num=4)
    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(px),
        ).logits.numpy()
    img = aria.vision_forward(params, cfg, jnp.asarray(px)).reshape(
        -1, cfg.text.hidden_size
    )
    embeds = aria.embed_multimodal(params, cfg, jnp.asarray(ids, jnp.int32), img)
    logits, _ = aria.forward(params, cfg, None, inputs_embeds=embeds)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-4, rtol=1e-3)


def test_text_logits_parity_and_cache(setup):
    torch, model, cfg, params = setup
    rng = np.random.default_rng(3)
    ids = rng.integers(5, 200, size=(1, 10)).astype(np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids)).logits.numpy()
    logits, _ = aria.forward(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-4, rtol=1e-3)

    # cached prefill+decode == uncached full forward
    cache = aria.init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    l1, cache = aria.forward(params, cfg, jnp.asarray(ids[:, :9], jnp.int32),
                             cache, 0)
    l2, _ = aria.forward(params, cfg, jnp.asarray(ids[:, 9:], jnp.int32),
                         cache, 9)
    np.testing.assert_allclose(
        np.asarray(l2[:, -1]), np.asarray(logits[:, -1]), atol=2e-4, rtol=1e-3
    )


def test_quantized_grouped_experts(setup):
    torch, model, cfg, params = setup
    from hqq_tpu.nn.moe import GroupedQuantLinear

    qparams = aria.quantize_aria(
        params,
        attn_config=BaseQuantizeConfig(nbits=8, group_size=32),
        expert_config=BaseQuantizeConfig(nbits=8, group_size=16),
        compute_dtype=jnp.float32,
    )
    experts = qparams["text"]["layers"][0]["mlp"]["experts"]
    assert isinstance(experts["fc1"], GroupedQuantLinear)
    # router + vision stayed fp (reference placement, utils/aria.py:219-224)
    from hqq_tpu.nn.linear import Linear
    assert isinstance(qparams["text"]["layers"][0]["mlp"]["router"], Linear)
    assert isinstance(qparams["vision"]["layers"][0]["q_proj"], Linear)

    ids = _prompt_with_image(cfg, query_num=4)
    px = _pixels(cfg)
    img = aria.vision_forward(qparams, cfg, jnp.asarray(px)).reshape(
        -1, cfg.text.hidden_size
    )
    embeds = aria.embed_multimodal(qparams, cfg, jnp.asarray(ids, jnp.int32), img)
    ql, _ = aria.forward(qparams, cfg, None, inputs_embeds=embeds)
    fl, _ = aria.forward(params, cfg, None, inputs_embeds=embeds)
    assert bool(jnp.isfinite(ql).all())
    # 8-bit stays close to fp
    err = float(jnp.linalg.norm(ql - fl) / jnp.linalg.norm(fl))
    assert err < 0.05, err
