# SPDX-License-Identifier: Apache-2.0
"""LLaVA: CLIP-tower + projector parity, full multimodal logits parity vs
HF `LlavaForConditionalGeneration`, quantized image-conditioned decode.

≙ the reference's LLaVA example (`/root/reference/examples/`, language
model HQQ-quantized, served via transformers)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import llava


def _tiny_hf():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    vision = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                  num_attention_heads=4, image_size=16, patch_size=4,
                  projection_dim=32, vocab_size=10)
    text = dict(vocab_size=256, hidden_size=64, intermediate_size=48,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=256,
                rope_theta=10000.0, tie_word_embeddings=False)
    hf_cfg = transformers.LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=254,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.LlavaForConditionalGeneration(hf_cfg).eval().float()
    cfg = llava.LlavaConfig.from_hf(hf_cfg.to_dict())
    assert cfg.image_token_index == 254 and cfg.vision_feature_layer == -2
    text_p, vis_p = llava.params_from_hf_state_dict(
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
        ref = model.get_image_features(
            pixel_values=torch.from_numpy(px),
            vision_feature_layer=cfg.vision_feature_layer,
            vision_feature_select_strategy=cfg.vision_feature_select_strategy,
        )
        if isinstance(ref, (list, tuple)):
            ref = ref[0]
        ref = ref.reshape(-1, cfg.text.hidden_size).numpy()
    ours = np.asarray(
        llava.vision_forward(params, cfg, jnp.asarray(px))
    ).reshape(-1, cfg.text.hidden_size)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_multimodal_logits_parity(setup):
    torch, model, cfg, params = setup
    px = _pixels(cfg)
    n_img = cfg.vision.num_patches  # select "default" drops CLS
    toks = np.array([[5, 9] + [cfg.image_token_index] * n_img + [7, 3, 11]])
    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(toks),
            pixel_values=torch.from_numpy(px),
        ).logits.numpy()

    img = llava.vision_forward(params, cfg, jnp.asarray(px)).reshape(
        -1, cfg.text.hidden_size
    )
    embeds = llava.embed_multimodal(params, cfg, jnp.asarray(toks), img)
    logits, _ = llava.forward(
        params, cfg, None, cache=None, start_pos=0, inputs_embeds=embeds
    )
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=3e-4, atol=3e-4)


def test_quantized_image_conditioned_decode(setup):
    torch, model, cfg, params = setup
    from hqq_tpu.models import base as model_base

    px = _pixels(cfg, seed=1)
    n_img = cfg.vision.num_patches
    toks = np.array([[5, 9] + [cfg.image_token_index] * n_img + [7]])

    def greedy(p, n_new=6):
        img = llava.vision_forward(p, cfg, jnp.asarray(px)).reshape(
            -1, cfg.text.hidden_size
        )
        embeds = llava.embed_multimodal(p, cfg, jnp.asarray(toks), img)
        t0 = toks.shape[1]
        cache = llava.init_cache(cfg, 1, 64, jnp.float32)
        logits, cache = llava.forward(
            p, cfg, None, cache, 0, inputs_embeds=embeds
        )
        out = [int(jnp.argmax(logits[0, t0 - 1]))]
        pos = t0
        for _ in range(n_new - 1):
            logits, cache = llava.forward(
                p, cfg, jnp.asarray([[out[-1]]], jnp.int32), cache, pos
            )
            out.append(int(jnp.argmax(logits[0, -1])))
            pos += 1
        return out

    fp = greedy(params)

    qtext = model_base.quantize_model(
        params["text"], BaseQuantizeConfig(nbits=8, group_size=32),
        compute_dtype=jnp.float32,
    )
    q = {**params, "text": qtext}
    assert greedy(q) == fp  # 8-bit g32 on a tiny model: argmax-stable


def test_hf_generate_parity(setup):
    """End-to-end greedy generation equals HF generate (fp weights)."""
    torch, model, cfg, params = setup
    px = _pixels(cfg, seed=2)
    n_img = cfg.vision.num_patches
    toks = np.array([[5, 9] + [cfg.image_token_index] * n_img + [7]])
    n_new = 6
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.from_numpy(toks),
            pixel_values=torch.from_numpy(px),
            max_new_tokens=n_new, do_sample=False,
        )[0, toks.shape[1]:].tolist()

    img = llava.vision_forward(params, cfg, jnp.asarray(px)).reshape(
        -1, cfg.text.hidden_size
    )
    embeds = llava.embed_multimodal(params, cfg, jnp.asarray(toks), img)
    t0 = toks.shape[1]
    cache = llava.init_cache(cfg, 1, 64, jnp.float32)
    logits, cache = llava.forward(params, cfg, None, cache, 0, inputs_embeds=embeds)
    out = [int(jnp.argmax(logits[0, t0 - 1]))]
    pos = t0
    for _ in range(n_new - 1):
        logits, cache = llava.forward(
            params, cfg, jnp.asarray([[out[-1]]], jnp.int32), cache, pos
        )
        out.append(int(jnp.argmax(logits[0, -1])))
        pos += 1
    assert out == ref


def _engine_model():
    from hqq_tpu.engine.vl import HQQVLModel

    cfg = llava.LlavaConfig.tiny()
    params = llava.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    vision_tree = {"vision": params["vision"], "projector": params["projector"]}
    m = HQQVLModel(
        params={"text": params["text"], "vision": vision_tree},
        cfg=cfg, model_type="llava",
    )
    return m.quantize_model(BaseQuantizeConfig(nbits=8, group_size=32),
                            compute_dtype=jnp.float32)


def _image_prompt(cfg, seed=0):
    n_img = cfg.vision.num_patches
    toks = [5, 9] + [cfg.image_token_index] * n_img + [7]
    px = _pixels(cfg, seed=seed)
    return toks, px


def test_vl_engine_generate_with_image():
    m = _engine_model()
    toks, px = _image_prompt(m.cfg)
    out = m.generate(toks, pixel_values=px, max_new_tokens=5)
    assert len(out) == 5 and all(isinstance(t, int) for t in out)
    # image conditioning must change the continuation: a different image on
    # the SAME prompt must not reproduce the same generation (catches a
    # regression where encode/splice becomes a no-op)
    _, px2 = _image_prompt(m.cfg, seed=9)
    out2 = m.generate(toks, pixel_values=px2, max_new_tokens=5)
    assert out2 != out
    text_only = m.generate([5, 9, 7], max_new_tokens=5)
    assert len(text_only) == 5


def test_vl_engine_save_load_roundtrip(tmp_path):
    from hqq_tpu.engine.vl import AutoHQQVLModel

    m = _engine_model()
    toks, px = _image_prompt(m.cfg)
    ref = m.generate(toks, pixel_values=px, max_new_tokens=5)
    m.save_quantized(str(tmp_path / "llava"))
    loaded = AutoHQQVLModel.from_quantized(str(tmp_path / "llava"))
    assert loaded.model_type == "llava"
    assert loaded.cfg == m.cfg
    got = loaded.generate(toks, pixel_values=px, max_new_tokens=5)
    assert got == ref


def test_vl_engine_from_pretrained_hf_dir(tmp_path, setup):
    """AutoHQQVLModel.from_pretrained on an HF-format LLaVA dir matches the
    directly-mapped params (engine-level HF entry, ≙ reference llava demo)."""
    torch, model, cfg, params = setup
    import json as _json

    d = tmp_path / "hf_llava"
    d.mkdir()
    (d / "config.json").write_text(_json.dumps(model.config.to_dict()))
    import safetensors.torch as st

    st.save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        str(d / "model.safetensors"),
    )
    from hqq_tpu.engine.vl import AutoHQQVLModel

    m = AutoHQQVLModel.from_pretrained(str(d), compute_dtype=jnp.float32)
    assert m.model_type == "llava"
    px = _pixels(cfg)
    ours = m.encode_images(jnp.asarray(px))
    ref = np.asarray(
        llava.vision_forward(params, cfg, jnp.asarray(px))
    ).reshape(-1, cfg.text.hidden_size)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)
