# SPDX-License-Identifier: Apache-2.0
"""Continuous batching engine: outputs must match single-request generation
regardless of batching/admission order; slots refill; EOS/max_new honored."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_params, quantize_model
from hqq_tpu.serving import ContinuousBatchingEngine, Generator


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    qparams = quantize_model(
        params, BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32
    )
    return cfg, qparams


def test_matches_single_generation(model):
    cfg, params = model
    prompts = [[1, 7, 3], [9, 2], [4, 4, 4, 4], [8]]
    n_new = 10

    gen = Generator(params, cfg, cache_dtype=jnp.float32)
    expected = {
        i: gen.generate([p], max_new_tokens=n_new)[0].tolist()
        for i, p in enumerate(prompts)
    }

    eng = ContinuousBatchingEngine(
        params, cfg, batch_slots=2, max_len=64, cache_dtype=jnp.float32
    )
    uids = [eng.add_request(p, max_new_tokens=n_new) for p in prompts]
    out = eng.run()

    for i, uid in enumerate(uids):
        assert out[uid] == expected[i], f"request {i}: {out[uid]} != {expected[i]}"


def test_slot_reuse(model):
    cfg, params = model
    eng = ContinuousBatchingEngine(
        params, cfg, batch_slots=1, max_len=64, cache_dtype=jnp.float32
    )
    u1 = eng.add_request([1, 2], max_new_tokens=4)
    u2 = eng.add_request([3, 4], max_new_tokens=4)
    out = eng.run()
    assert len(out[u1]) == 4 and len(out[u2]) == 4


def test_interleaved_admission(model):
    """A request added mid-flight must not perturb running requests."""
    cfg, params = model
    n_new = 8
    gen = Generator(params, cfg, cache_dtype=jnp.float32)
    exp_a = gen.generate([[5, 5, 5]], max_new_tokens=n_new)[0].tolist()
    exp_b = gen.generate([[6, 1]], max_new_tokens=n_new)[0].tolist()

    eng = ContinuousBatchingEngine(
        params, cfg, batch_slots=4, max_len=64, cache_dtype=jnp.float32
    )
    ua = eng.add_request([5, 5, 5], max_new_tokens=n_new)
    for _ in range(3):
        eng.step()
    ub = eng.add_request([6, 1], max_new_tokens=n_new)
    out = eng.run()
    assert out[ua] == exp_a
    assert out[ub] == exp_b


def test_eos_stops(model):
    cfg, params = model
    gen = Generator(params, cfg, cache_dtype=jnp.float32)
    ref = gen.generate([[2, 3]], max_new_tokens=12)[0].tolist()
    eos = ref[4]
    eng = ContinuousBatchingEngine(
        params, cfg, batch_slots=2, max_len=64, eos_token_id=eos,
        cache_dtype=jnp.float32,
    )
    uid = eng.add_request([2, 3], max_new_tokens=12)
    out = eng.run()
    assert out[uid][-1] == eos or len(out[uid]) == 12
    assert len(out[uid]) <= 12


def test_engine_rejects_oversized_request():
    import pytest as _pytest

    import jax
    import jax.numpy as jnp

    from hqq_tpu.models import LlamaConfig, init_params

    cfg = LlamaConfig.tiny(vocab_size=64)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = ContinuousBatchingEngine(params, cfg, batch_slots=1, max_len=32,
                                   cache_dtype=jnp.float32)
    with _pytest.raises(ValueError):
        eng.add_request(list(range(1, 30)), max_new_tokens=20)

    from hqq_tpu.serving.paged import PagedBatchingEngine

    p = PagedBatchingEngine(params, cfg, batch_slots=1, num_pages=16,
                            page_size=8, max_pages_per_seq=4,
                            cache_dtype=jnp.float32)
    with _pytest.raises(ValueError):
        p.add_request(list(range(1, 30)), max_new_tokens=20)


def test_horizon_stepping_matches_single_step(rng):
    """horizon=4 produces identical outputs to horizon=1 (greedy)."""
    import jax
    import jax.numpy as jnp

    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import LlamaConfig, init_params, quantize_model

    cfg = LlamaConfig.tiny(vocab_size=256)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    prompts = [list(rng.integers(1, 256, (int(n),))) for n in (5, 11, 8)]

    e1 = ContinuousBatchingEngine(q, cfg, batch_slots=2, max_len=64,
                                  cache_dtype=jnp.float32, horizon=1)
    e4 = ContinuousBatchingEngine(q, cfg, batch_slots=2, max_len=64,
                                  cache_dtype=jnp.float32, horizon=4)
    for p in prompts:
        e1.add_request(p, max_new_tokens=11)
        e4.add_request(p, max_new_tokens=11)
    r1, r4 = e1.run(), e4.run()
    assert set(r1) == set(r4)
    for uid in r1:
        assert r1[uid] == r4[uid], (uid, r1[uid], r4[uid])


def test_engine_with_mixtral_forward(rng):
    """The batching engine is model-agnostic via forward_fn (MoE decode)."""
    import jax
    import jax.numpy as jnp

    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import mixtral

    cfg = mixtral.MixtralConfig.tiny(vocab_size=256)
    params = mixtral.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = mixtral.quantize_mixtral(
        params,
        attn_config=BaseQuantizeConfig(nbits=4, group_size=32),
        expert_config=BaseQuantizeConfig(nbits=4, group_size=32),
        compute_dtype=jnp.float32,
    )
    eng = ContinuousBatchingEngine(
        q, cfg, batch_slots=2, max_len=64, cache_dtype=jnp.float32,
        forward_fn=lambda p, t, c, s: mixtral.forward(p, cfg, t, c, s),
    )
    for n in (5, 9, 7):
        eng.add_request(list(rng.integers(1, 256, (n,))), max_new_tokens=6)
    res = eng.run()
    assert len(res) == 3 and all(len(v) == 6 for v in res.values())


def test_dense_engine_non_llama_family():
    """The dense engine is family-generic through forward_fn (gemma2:
    sandwich norms + softcap): engine output token-for-token equals manual
    greedy decoding."""
    import jax

    from hqq_tpu.models import gemma2, llama

    cfg = gemma2.Gemma2Config.tiny()
    params = gemma2.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    prompt = [3, 17, 29, 5]
    n_new = 5

    cache = llama.init_cache(cfg, 1, 64, jnp.float32)
    toks = jnp.asarray([prompt], jnp.int32)
    logits, cache = gemma2.forward(params, cfg, toks, cache, 0)
    ref = [int(jnp.argmax(logits[0, len(prompt) - 1]))]
    pos = len(prompt)
    for _ in range(n_new - 1):
        logits, cache = gemma2.forward(
            params, cfg, jnp.asarray([[ref[-1]]], jnp.int32), cache, pos
        )
        ref.append(int(jnp.argmax(logits[0, -1])))
        pos += 1

    eng = ContinuousBatchingEngine(
        params, cfg, batch_slots=2, max_len=64, cache_dtype=jnp.float32,
        forward_fn=lambda p, t, c, s: gemma2.forward(p, cfg, t, c, s),
    )
    uid = eng.add_request(prompt, max_new_tokens=n_new)
    assert eng.run()[uid] == ref


def test_cancel_queued_and_running():
    """cancel() removes queued requests and frees running slots (pages too,
    in the paged engine)."""
    import jax

    from hqq_tpu.models import llama
    from hqq_tpu.serving.paged import PagedBatchingEngine

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)

    eng = ContinuousBatchingEngine(params, cfg, batch_slots=1, max_len=64,
                                   cache_dtype=jnp.float32)
    a = eng.add_request([1, 2, 3], max_new_tokens=50)
    b = eng.add_request([4, 5], max_new_tokens=4)
    eng.step()  # admits a
    assert eng.cancel(a)      # running
    assert not eng.cancel(999)
    outs = eng.run()
    assert set(outs) == {a, b} and len(outs[b]) == 4

    peng = PagedBatchingEngine(params, cfg, batch_slots=1, num_pages=16,
                               page_size=4, max_pages_per_seq=16,
                               cache_dtype=jnp.float32)
    free0 = len(peng.free_pages)
    big = peng.add_request([1] * 4, max_new_tokens=40)
    small = peng.add_request([2, 3], max_new_tokens=4)
    peng.step()
    assert peng.cancel(big)
    assert len(peng.free_pages) == free0  # pages released
    outs = peng.run()
    assert len(outs[small]) == 4


def test_dense_engine_quantized_kv_close_to_fp(model):
    """int8 KV pools (quantize_kv=True): first token exact (fp prefill,
    quantize-at-splice), later tokens mostly agree on a tiny random model —
    same contract as the paged engine's int8 pages."""
    cfg, qparams = model
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 250, (int(n),))) for n in (6, 14)]

    fp = ContinuousBatchingEngine(qparams, cfg, batch_slots=2, max_len=64,
                                  cache_dtype=jnp.float32)
    q8 = ContinuousBatchingEngine(qparams, cfg, batch_slots=2, max_len=64,
                                  cache_dtype=jnp.float32, quantize_kv=True)
    for p in prompts:
        fp.add_request(p, max_new_tokens=8)
        q8.add_request(p, max_new_tokens=8)
    out_fp = fp.run()
    out_q8 = q8.run()
    total = same = 0
    for uid in out_fp:
        assert out_fp[uid][0] == out_q8[uid][0]
        for a, b in zip(out_fp[uid], out_q8[uid]):
            total += 1
            same += int(a == b)
    assert same / total > 0.5, (same, total)


def test_dense_engine_quantized_kv_horizon(model):
    """quantize_kv composes with horizon stepping (multi-token scan carries
    the int8 pools + scales through the loop)."""
    cfg, qparams = model
    eng1 = ContinuousBatchingEngine(qparams, cfg, batch_slots=1, max_len=64,
                                    cache_dtype=jnp.float32, quantize_kv=True)
    engh = ContinuousBatchingEngine(qparams, cfg, batch_slots=1, max_len=64,
                                    cache_dtype=jnp.float32, quantize_kv=True,
                                    horizon=4)
    u1 = eng1.add_request([3, 17, 29, 5], max_new_tokens=9)
    uh = engh.add_request([3, 17, 29, 5], max_new_tokens=9)
    assert eng1.run()[u1] == engh.run()[uh]


def test_close_releases_engine_without_gc(model):
    """`close()` must break the jit-wrapper reference cycle so the engine
    (KV cache, params ref, executables) frees at refcount zero — without it
    a discarded engine pins its HBM until a full gc pass happens to run
    (measured as bench OOMs on the real chip)."""
    import weakref

    cfg, params = model
    eng = ContinuousBatchingEngine(
        params, cfg, batch_slots=2, max_len=64, cache_dtype=jnp.float32
    )
    uid = eng.add_request([1, 7, 3], max_new_tokens=4)
    assert len(eng.run()[uid]) == 4

    ref = weakref.ref(eng)
    del eng
    assert ref() is not None  # the cycle keeps it alive: close() is needed

    eng2 = ref()
    eng2.close()
    eng2.close()  # idempotent
    assert eng2.cache is None and eng2.params is None
    del eng2
    assert ref() is None, "engine still alive after close() + del (cycle?)"


def test_close_paged_and_speculative(model):
    import weakref

    from hqq_tpu.serving.paged import PagedBatchingEngine
    from hqq_tpu.serving.speculative import SpeculativePagedEngine

    cfg, params = model
    eng = PagedBatchingEngine(
        params, cfg, batch_slots=2, num_pages=16, page_size=4,
        max_pages_per_seq=4, cache_dtype=jnp.float32,
    )
    uid = eng.add_request([1, 7, 3], max_new_tokens=4)
    assert len(eng.run()[uid]) == 4
    ref = weakref.ref(eng)
    eng.close()
    del eng
    assert ref() is None

    spec = SpeculativePagedEngine(
        params, params, cfg, k_draft=2, batch_slots=2, num_pages=16,
        page_size=4, max_pages_per_seq=4, cache_dtype=jnp.float32,
    )
    uid = spec.add_request([1, 7, 3], max_new_tokens=4)
    assert len(spec.run()[uid]) == 4
    inner = weakref.ref(spec._eng)
    ref = weakref.ref(spec)
    spec.close()
    del spec
    assert ref() is None and inner() is None
