# SPDX-License-Identifier: Apache-2.0
"""Automatic prefix caching in the paged engine (vLLM's flagship serving
feature, which the reference inherits): shared page-aligned prompt prefixes
reuse pooled KV pages — skipping their prefill compute and memory — with
refcounting and LRU eviction."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hqq_tpu.models import llama
from hqq_tpu.serving.paged import PagedBatchingEngine


@pytest.fixture(scope="module")
def model():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params


def _engine(params, cfg, **kw):
    base = dict(batch_slots=1, num_pages=32, page_size=4, max_pages_per_seq=8,
                cache_dtype=jnp.float32)
    base.update(kw)
    return PagedBatchingEngine(params, cfg, **base)


def test_prefix_reuse_matches_uncached(model):
    """Second request with a shared 2-page prefix: pages reused, outputs
    token-for-token identical to the cache-disabled engine."""
    cfg, params = model
    prefix = [3, 17, 29, 5, 11, 2, 7, 23]  # 2 full pages (pg=4)
    p1 = prefix + [9, 13]
    p2 = prefix + [21, 1, 6]

    ref_eng = _engine(params, cfg)
    u1 = ref_eng.add_request(p1, max_new_tokens=5)
    u2 = ref_eng.add_request(p2, max_new_tokens=5)
    ref = ref_eng.run()

    eng = _engine(params, cfg, enable_prefix_cache=True)
    v1 = eng.add_request(p1, max_new_tokens=5)
    v2 = eng.add_request(p2, max_new_tokens=5)
    got = eng.run()

    assert got[v1] == ref[u1]
    assert got[v2] == ref[u2]
    assert eng.prefix_cache_hits == 2  # p2 reused p1's two prefix pages


def test_page_aligned_prompt_never_shares_last_page(model):
    """A fully page-aligned prompt keeps its last page private (decode writes
    there; the last token must re-run for logits)."""
    cfg, params = model
    prompt = [3, 17, 29, 5, 11, 2, 7, 23]  # exactly 2 pages
    eng = _engine(params, cfg, enable_prefix_cache=True)
    a = eng.add_request(prompt, max_new_tokens=3)
    eng.run()
    b = eng.add_request(prompt, max_new_tokens=3)
    outs = eng.run()
    # only page 0 of the prompt is shareable
    assert eng.prefix_cache_hits == 1
    assert outs[b] == eng.finished[a].output


def test_cached_pages_survive_release_and_evict_under_pressure(model):
    cfg, params = model
    prompt = [1, 2, 3, 4, 5, 6, 7, 8, 9]  # 2 cacheable pages
    eng = _engine(params, cfg, num_pages=9, enable_prefix_cache=True)
    free0 = len(eng.free_pages)  # 8 usable
    a = eng.add_request(prompt, max_new_tokens=3)
    eng.run()
    # cached pages stay resident after release
    assert len(eng.free_pages) < free0
    assert eng._evictable() == 2
    # a large unrelated request forces eviction of the unreferenced pages
    big = eng.add_request([42] * 9, max_new_tokens=20)  # needs 8 pages
    eng.run()
    assert len(eng.finished[big].output) > 0


def test_prefix_cache_with_quantized_pages(model):
    """int8 KV pools gather+dequantize cached pages into the prefill cache."""
    cfg, params = model
    prefix = [3, 17, 29, 5, 11, 2, 7, 23]
    eng = _engine(params, cfg, enable_prefix_cache=True, quantize_kv=True)
    a = eng.add_request(prefix + [9], max_new_tokens=3)
    b = eng.add_request(prefix + [4], max_new_tokens=3)
    outs = eng.run()
    assert eng.prefix_cache_hits == 2
    ref_eng = _engine(params, cfg, quantize_kv=True)
    ra = ref_eng.add_request(prefix + [9], max_new_tokens=3)
    rb = ref_eng.add_request(prefix + [4], max_new_tokens=3)
    refs = ref_eng.run()
    assert outs[a] == refs[ra] and outs[b] == refs[rb]


def test_chunked_prefill_matches_unchunked(model):
    """prefill_chunk splits a long prompt across step()s; outputs must be
    token-for-token identical, and decode of already-active slots proceeds
    between chunks."""
    cfg, params = model
    long_prompt = list(np.random.default_rng(0).integers(0, 200, 24))
    short_prompt = [5, 9, 2]

    ref_eng = _engine(params, cfg, batch_slots=2, num_pages=64,
                      max_pages_per_seq=12)
    ra = ref_eng.add_request(short_prompt, max_new_tokens=8)
    rb = ref_eng.add_request(long_prompt, max_new_tokens=6)
    refs = ref_eng.run()

    eng = _engine(params, cfg, batch_slots=2, num_pages=64,
                  max_pages_per_seq=12, prefill_chunk=8)
    a = eng.add_request(short_prompt, max_new_tokens=8)
    b = eng.add_request(long_prompt, max_new_tokens=6)
    # first step: short admits fully; long starts chunking
    eng.step()
    assert eng._prefilling  # long prompt mid-prefill
    outs = eng.run()
    assert outs[a] == refs[ra]
    assert outs[b] == refs[rb]


def test_chunked_prefill_with_prefix_cache(model):
    """Chunked prefill composes with prefix caching: the shared prefix is
    skipped, only the suffix chunks run."""
    cfg, params = model
    prefix = list(range(1, 17))  # 4 full pages
    p1 = prefix + [21, 22]
    p2 = prefix + [31, 32, 33]

    ref_eng = _engine(params, cfg)
    r1 = ref_eng.add_request(p1, max_new_tokens=4)
    r2 = ref_eng.add_request(p2, max_new_tokens=4)
    refs = ref_eng.run()

    eng = _engine(params, cfg, enable_prefix_cache=True, prefill_chunk=8)
    u1 = eng.add_request(p1, max_new_tokens=4)
    u2 = eng.add_request(p2, max_new_tokens=4)
    outs = eng.run()
    assert outs[u1] == refs[r1]
    assert outs[u2] == refs[r2]
    assert eng.prefix_cache_hits >= 3  # p2 reused p1's cached prefix pages


def test_cancel_mid_chunked_prefill(model):
    cfg, params = model
    eng = _engine(params, cfg, prefill_chunk=8)
    free0 = len(eng.free_pages)
    uid = eng.add_request(list(range(24)), max_new_tokens=4)
    eng.step()
    assert eng._prefilling
    assert eng.cancel(uid)
    assert not eng._prefilling
    assert len(eng.free_pages) == free0  # pages released


def test_fuzz_page_accounting_invariant(model):
    """Random workload fuzz: adds, cancels, steps — across prefix caching,
    chunked prefill and int8 pages — must never leak or double-free pages:
    free + in-flight + cached-unreferenced == total usable, and every
    finished request respects max_new_tokens."""
    cfg, params = model
    rng = np.random.default_rng(7)
    eng = _engine(params, cfg, batch_slots=3, num_pages=24,
                  max_pages_per_seq=8, enable_prefix_cache=True,
                  prefill_chunk=8, quantize_kv=True)
    total_usable = 24 - 1  # page 0 reserved

    def check_invariant():
        in_flight = set()
        for pages in eng.slot_pages:
            in_flight.update(pages)
        for st in eng._prefilling.values():
            in_flight.update(st["pages"])
        cached_idle = {
            p for p in (eng._prefix_cache or {}).values()
            if eng._page_ref.get(p, 0) == 0 and p not in in_flight
        }
        free = set(eng.free_pages)
        assert not (free & in_flight), "freed page still in a block table"
        assert len(free) + len(in_flight | cached_idle) == total_usable, (
            len(free), len(in_flight), len(cached_idle))

    uids = []
    shared = [3, 1, 4, 1, 5, 9, 2, 6]
    for it in range(40):
        op = rng.integers(0, 10)
        if op < 4:
            plen = int(rng.integers(1, 14))
            prompt = (shared + list(rng.integers(0, 200, plen)))[: 6 + plen]
            try:
                uids.append(eng.add_request(prompt,
                                            max_new_tokens=int(rng.integers(1, 10))))
            except ValueError:
                pass
        elif op < 5 and uids:
            eng.cancel(int(rng.choice(uids)))
        else:
            eng.step()
        check_invariant()
    outs = eng.run()
    check_invariant()
    for uid, r in eng.finished.items():
        assert len(r.output) <= r.max_new_tokens
