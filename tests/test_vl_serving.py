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
