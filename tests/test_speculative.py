# SPDX-License-Identifier: Apache-2.0
"""Speculative decoding invariant: output is bit-identical to the target's
vanilla greedy decode, for both a perfect draft (same model) and a weak
draft (2-bit quant of the same weights)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_params, quantize_model
from hqq_tpu.serving.generate import Generator
from hqq_tpu.serving.speculative import SpeculativeGenerator


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny(vocab_size=256)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    target = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                            compute_dtype=jnp.float32)
    draft = quantize_model(params, BaseQuantizeConfig(nbits=2, group_size=32),
                           compute_dtype=jnp.float32)
    prompt = np.array([3, 17, 92, 41, 5], np.int32)
    ref = Generator(target, cfg, do_sample=False, cache_dtype=jnp.float32,
                    compile_mode="partial").generate(prompt, max_new_tokens=24)
    return cfg, target, draft, prompt, np.asarray(ref)


def test_spec_decode_perfect_draft(setup):
    cfg, target, draft, prompt, ref = setup
    spec = SpeculativeGenerator(target, target, cfg, k=4, cache_dtype=jnp.float32)
    out = spec.generate(prompt, max_new_tokens=24)
    np.testing.assert_array_equal(out[0], ref[0])


def test_spec_decode_weak_draft(setup):
    cfg, target, draft, prompt, ref = setup
    spec = SpeculativeGenerator(target, draft, cfg, k=3, cache_dtype=jnp.float32)
    out = spec.generate(prompt, max_new_tokens=24)
    np.testing.assert_array_equal(out[0], ref[0])


def test_spec_decode_sampling_runs(setup):
    cfg, target, draft, prompt, ref = setup
    spec = SpeculativeGenerator(target, draft, cfg, k=3, cache_dtype=jnp.float32,
                                do_sample=True, temperature=0.8, seed=3)
    out = spec.generate(prompt, max_new_tokens=16)
    assert out.shape == (1, 16)
    assert (out >= 0).all() and (out < cfg.vocab_size).all()


def test_spec_decode_eos_stops(setup):
    cfg, target, draft, prompt, ref = setup
    eos = int(ref[0][5])  # force an eos hit mid-stream
    spec = SpeculativeGenerator(target, target, cfg, k=4, cache_dtype=jnp.float32,
                                eos_token_id=eos)
    out = spec.generate(prompt, max_new_tokens=24)
    assert out[0][-1] == eos
    assert len(out[0]) <= 24
    np.testing.assert_array_equal(out[0], ref[0][: len(out[0])])


def test_speculative_batching_engine_exact():
    """Batched speculative decoding is bit-identical to plain greedy
    continuous batching (the draft only changes wall-clock), across slots
    with different prompts and lengths."""
    import numpy as np

    from hqq_tpu.serving.batching import ContinuousBatchingEngine
    from hqq_tpu.serving.speculative import SpeculativeBatchingEngine

    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    # draft = SAME weights quantized harder (realistic cheap-draft setup)
    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models.base import quantize_model

    draft = quantize_model(params, BaseQuantizeConfig(nbits=3, group_size=32),
                           compute_dtype=jnp.float32)

    prompts = [[3, 17, 29, 5], [11, 2], [7, 23, 23, 41, 9]]
    ref_eng = ContinuousBatchingEngine(params, cfg, batch_slots=2, max_len=64,
                                       cache_dtype=jnp.float32)
    uids = [ref_eng.add_request(p, max_new_tokens=8) for p in prompts]
    refs = ref_eng.run()

    eng = SpeculativeBatchingEngine(
        params, draft, cfg, k_draft=4, batch_slots=2, max_len=64,
        cache_dtype=jnp.float32,
    )
    vids = [eng.add_request(p, max_new_tokens=8) for p in prompts]
    outs = eng.run()
    for u, v in zip(uids, vids):
        assert outs[v] == refs[u], (outs[v], refs[u])


def test_speculative_batching_engine_accepts_multiple():
    """With the draft == target, drafts are mostly accepted: the run takes
    strictly fewer steps than tokens (multi-token commits happen). Early
    near-tie argmax flips between the t=1 draft forward and the t=k verify
    forward can reject a few drafts on random weights, so the bound is
    conservative rather than tokens/k."""
    from hqq_tpu.serving.speculative import SpeculativeBatchingEngine

    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    eng = SpeculativeBatchingEngine(
        params, params, cfg, k_draft=4, batch_slots=1, max_len=64,
        cache_dtype=jnp.float32,
    )
    uid = eng.add_request([3, 17, 29], max_new_tokens=17)
    n_steps = 0
    while eng._eng.queue or eng._eng.active:
        eng.step()
        n_steps += 1
    assert len(eng.finished[uid].output) == 17
    assert n_steps < 16, n_steps  # 16 post-admit tokens in < 16 steps


def test_speculative_paged_engine_exact():
    """Paged spec engine (vLLM's paged+speculative composition): output is
    token-identical to the plain paged engine's greedy decode — the width-k
    verify window writes candidate rows into pages and attends causally."""
    from hqq_tpu.serving.paged import PagedBatchingEngine
    from hqq_tpu.serving.speculative import SpeculativePagedEngine

    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    draft = quantize_model(params, BaseQuantizeConfig(nbits=3, group_size=32),
                           compute_dtype=jnp.float32)

    prompts = [[3, 17, 29, 5], [11, 2], [7, 23, 23, 41, 9]]
    ref_eng = PagedBatchingEngine(params, cfg, batch_slots=2, num_pages=32,
                                  page_size=4, max_pages_per_seq=8,
                                  cache_dtype=jnp.float32)
    uids = [ref_eng.add_request(p, max_new_tokens=8) for p in prompts]
    refs = ref_eng.run()

    eng = SpeculativePagedEngine(
        params, draft, cfg, k_draft=4, batch_slots=2, num_pages=32,
        page_size=4, max_pages_per_seq=8, cache_dtype=jnp.float32,
    )
    vids = [eng.add_request(p, max_new_tokens=8) for p in prompts]
    outs = eng.run()
    for u, v in zip(uids, vids):
        assert outs[v] == refs[u], (outs[v], refs[u])


def test_speculative_paged_engine_accepts_multiple():
    """Draft == target: multi-token commits make the run take strictly
    fewer steps than tokens (same bound as the dense spec engine)."""
    from hqq_tpu.serving.speculative import SpeculativePagedEngine

    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    eng = SpeculativePagedEngine(
        params, params, cfg, k_draft=4, batch_slots=1, num_pages=32,
        page_size=4, max_pages_per_seq=16, cache_dtype=jnp.float32,
    )
    uid = eng.add_request([3, 17, 29], max_new_tokens=17)
    n_steps = 0
    while eng._eng.queue or eng._eng.active or eng._eng._prefilling:
        eng.step()
        n_steps += 1
    assert len(eng.finished[uid].output) == 17
    assert n_steps < 16, n_steps


def test_speculative_paged_near_page_exhaustion():
    """A request whose page budget ends mid-window: the engine falls back to
    plain steps near exhaustion and the output still matches the plain paged
    engine exactly (no scratch-page reads below the committed position)."""
    from hqq_tpu.serving.paged import PagedBatchingEngine
    from hqq_tpu.serving.speculative import SpeculativePagedEngine

    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(2), jnp.float32)
    prompt = [5, 9, 3, 7, 2]
    # 3 pages x 4 = 12 rows total; prompt 5 + 7 new = 12 (exactly full)
    ref_eng = PagedBatchingEngine(params, cfg, batch_slots=1, num_pages=16,
                                  page_size=4, max_pages_per_seq=4,
                                  cache_dtype=jnp.float32)
    u = ref_eng.add_request(prompt, max_new_tokens=7)
    refs = ref_eng.run()

    eng = SpeculativePagedEngine(
        params, params, cfg, k_draft=4, batch_slots=1, num_pages=16,
        page_size=4, max_pages_per_seq=4, cache_dtype=jnp.float32,
    )
    v = eng.add_request(prompt, max_new_tokens=7)
    outs = eng.run()
    assert outs[v] == refs[u], (outs[v], refs[u])
