# SPDX-License-Identifier: Apache-2.0
"""VL continuous batching: multimodal (inputs_embeds) requests served
through BOTH engines — the vLLM role for LLaVA/Qwen2-VL checkpoints
(≙ `/root/reference/examples/vllm_qwenvl.py`, which serves a VLM through
vLLM's batching engine)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import base as model_base
from hqq_tpu.models import llava
from hqq_tpu.serving.batching import ContinuousBatchingEngine
from hqq_tpu.serving.paged import PagedBatchingEngine


@pytest.fixture(scope="module")
def model():
    cfg = llava.LlavaConfig.tiny()
    params = llava.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    params = {**params, "text": model_base.quantize_model(
        params["text"], BaseQuantizeConfig(nbits=4, group_size=32),
        compute_dtype=jnp.float32,
    )}
    return cfg, params


def _embeds_for(cfg, params, toks, seed):
    px = np.random.default_rng(seed).standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    img = llava.vision_forward(params, cfg, jnp.asarray(px)).reshape(
        -1, cfg.text.hidden_size
    )
    emb = llava.embed_multimodal(params, cfg, jnp.asarray([toks]), img)
    return np.asarray(emb[0])


def _ref_greedy(cfg, params, toks, emb, n_new):
    cache = llava.init_cache(cfg, 1, 64, jnp.float32)
    logits, cache = llava.forward(
        params, cfg, None, cache, 0, inputs_embeds=jnp.asarray(emb[None])
    )
    out = [int(jnp.argmax(logits[0, len(toks) - 1]))]
    pos = len(toks)
    for _ in range(n_new - 1):
        logits, cache = llava.forward(
            params, cfg, jnp.asarray([[out[-1]]], jnp.int32), cache, pos
        )
        out.append(int(jnp.argmax(logits[0, -1])))
        pos += 1
    return out


def _prompt(cfg, extra):
    return [5] + [cfg.image_token_index] * cfg.vision.num_patches + list(extra)


def test_dense_engine_serves_multimodal(model):
    cfg, params = model
    n_new = 6
    reqs = [(_prompt(cfg, [7 + i]), i) for i in range(3)]
    expected, embs = {}, {}
    for i, (toks, seed) in enumerate(reqs):
        embs[i] = _embeds_for(cfg, params, toks, seed)
        expected[i] = _ref_greedy(cfg, params, toks, embs[i], n_new)
    # different images must lead to different generations for this fixture
    assert len({tuple(v) for v in expected.values()}) > 1

    eng = ContinuousBatchingEngine(
        params["text"], cfg.text, batch_slots=2, max_len=64,
        cache_dtype=jnp.float32,
    )
    uids = [
        eng.add_request(toks, max_new_tokens=n_new, inputs_embeds=embs[i])
        for i, (toks, _) in enumerate(reqs)
    ]
    out = eng.run()
    for i, uid in enumerate(uids):
        assert out[uid] == expected[i], f"request {i}"


def test_paged_engine_serves_multimodal_no_prefix_alias(model):
    cfg, params = model
    n_new = 6
    # IDENTICAL token prompts, DIFFERENT images — with prefix caching on,
    # token-content hashing must not alias them
    toks = _prompt(cfg, [7])
    emb_a = _embeds_for(cfg, params, toks, seed=10)
    emb_b = _embeds_for(cfg, params, toks, seed=11)
    ref_a = _ref_greedy(cfg, params, toks, emb_a, n_new)
    ref_b = _ref_greedy(cfg, params, toks, emb_b, n_new)
    assert ref_a != ref_b  # distinct images -> distinct continuations

    eng = PagedBatchingEngine(
        params["text"], cfg.text, batch_slots=2, num_pages=32, page_size=4,
        max_pages_per_seq=16, cache_dtype=jnp.float32,
        enable_prefix_cache=True,
    )
    ua = eng.add_request(toks, max_new_tokens=n_new, inputs_embeds=emb_a)
    ub = eng.add_request(toks, max_new_tokens=n_new, inputs_embeds=emb_b)
    # plain text request alongside, exercising the mixed path
    ut = eng.add_request([5, 9, 7], max_new_tokens=n_new)
    out = eng.run()
    assert out[ua] == ref_a
    assert out[ub] == ref_b
    assert eng.prefix_cache_hits == 0  # embeds requests never hit the cache
    assert len(out[ut]) == n_new


def test_embeds_shape_validation(model):
    cfg, params = model
    eng = ContinuousBatchingEngine(
        params["text"], cfg.text, batch_slots=2, max_len=64,
        cache_dtype=jnp.float32,
    )
    with pytest.raises(AssertionError):
        eng.add_request([1, 2, 3], max_new_tokens=4,
                        inputs_embeds=np.zeros((2, cfg.text.hidden_size)))


def test_embeds_dtype_normalized():
    """fp32 vision embeds into a bf16 model/cache engine must not crash the
    in-place KV update (embeds are cast to the cache dtype at admission) —
    the real-world combo: bf16-served LM, fp32 vision features."""
    cfg = llava.LlavaConfig.tiny()
    params = llava.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.bfloat16)
    text = model_base.quantize_model(
        params["text"], BaseQuantizeConfig(nbits=4, group_size=32),
        compute_dtype=jnp.bfloat16,
    )
    toks = _prompt(cfg, [7])
    rng = np.random.default_rng(3)
    emb = rng.standard_normal(
        (len(toks), cfg.text.hidden_size)
    ).astype(np.float32)  # deliberately fp32

    eng = ContinuousBatchingEngine(
        text, cfg.text, batch_slots=2, max_len=64, cache_dtype=jnp.bfloat16,
    )
    uid = eng.add_request(toks, max_new_tokens=4, inputs_embeds=emb)
    assert len(eng.run()[uid]) == 4

    peng = PagedBatchingEngine(
        text, cfg.text, batch_slots=2, num_pages=32, page_size=4,
        max_pages_per_seq=16, cache_dtype=jnp.bfloat16,
    )
    uid = peng.add_request(toks, max_new_tokens=4, inputs_embeds=emb)
    assert len(peng.run()[uid]) == 4


def test_embeds_require_efwd_with_custom_forward(model):
    """An engine built with a custom forward_fn (family/TP injection) must
    reject embeds requests unless embeds_forward_fn is also given — the
    llama default would run the wrong model on those params."""
    from hqq_tpu.models import llama

    cfg, params = model
    eng = ContinuousBatchingEngine(
        params["text"], cfg.text, batch_slots=2, max_len=64,
        cache_dtype=jnp.float32,
        forward_fn=lambda p, t, c, s: llama.forward(p, cfg.text, t, c, s),
    )
    toks = _prompt(cfg, [7])
    emb = np.zeros((len(toks), cfg.text.hidden_size), np.float32)
    uid = eng.add_request(toks, max_new_tokens=4, inputs_embeds=emb)
    with pytest.raises(ValueError, match="embeds_forward_fn"):
        eng.run()


def test_qwen2_vl_through_dense_engine():
    """Qwen2-VL (M-RoPE) through the batching engine: image-conditioned
    requests are token-for-token equal to HQQVLModel.generate — completing
    VL serving for both VL families (≙ the reference's vllm_qwenvl.py)."""
    from hqq_tpu.engine.vl import HQQVLModel
    from hqq_tpu.models import qwen2_vl

    cfg = qwen2_vl.Qwen2VLConfig.tiny()
    params = qwen2_vl.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    m = HQQVLModel(params=params, cfg=cfg, model_type="qwen2_vl").quantize_model(
        BaseQuantizeConfig(nbits=8, group_size=16), compute_dtype=jnp.float32
    )
    text = m.params["text"]

    grid = ((1, 4, 4),)  # 16 patches -> 4 merged tokens
    rng = np.random.default_rng(0)
    patches = rng.standard_normal((16, cfg.vision.patch_dim)).astype(np.float32)
    n_tok = 4
    toks = [5, 9] + [cfg.image_token_id] * n_tok + [7]
    n_new = 6

    ref = m.generate(toks, pixel_values=jnp.asarray(patches), grid_thw=grid,
                     max_new_tokens=n_new)

    img = m.encode_images(jnp.asarray(patches), grid)
    emb = qwen2_vl.embed_multimodal(text, cfg, jnp.asarray([toks]), img)
    pos = qwen2_vl.get_mrope_positions(cfg, np.asarray(toks), grid)  # [3,1,T]
    mp = int(pos.max()) + 1
    fwd, efwd = qwen2_vl.serving_forward_fns(cfg)
    eng = ContinuousBatchingEngine(
        text, cfg.text, batch_slots=2, max_len=64, cache_dtype=jnp.float32,
        forward_fn=fwd, embeds_forward_fn=efwd, mrope_offsets=True,
    )
    uid = eng.add_request(
        toks, max_new_tokens=n_new, inputs_embeds=np.asarray(emb[0]),
        position_ids=pos[:, 0], pos_offset=mp - len(toks),
    )
    # a text-only request rides the same batch with standard RoPE
    ut = eng.add_request([5, 9, 7], max_new_tokens=n_new)
    out = eng.run()
    assert out[uid] == ref
    assert len(out[ut]) == n_new
