# SPDX-License-Identifier: Apache-2.0
"""Per-request sampling params + stop tokens + paged multi-LoRA.

≙ the vLLM SamplingParams / multi-lora roles behind
`/root/reference/hqq/utils/vllm.py:578-868` and
`/root/reference/hqq/core/peft.py:414` — the reference delegates both to
vLLM; here the engines own them natively.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_params, quantize_model
from hqq_tpu.serving.batching import ContinuousBatchingEngine
from hqq_tpu.serving.paged import PagedBatchingEngine


@pytest.fixture(scope="module")
def small_model():
    cfg = LlamaConfig.tiny(vocab_size=128)
    params = quantize_model(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32),
        BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32,
    )
    return params, cfg


def _dense(params, cfg, **kw):
    return ContinuousBatchingEngine(params, cfg, batch_slots=2, max_len=64,
                                    cache_dtype=jnp.float32, **kw)


def _paged(params, cfg, **kw):
    return PagedBatchingEngine(params, cfg, batch_slots=2, num_pages=32,
                               page_size=8, max_pages_per_seq=8,
                               cache_dtype=jnp.float32, **kw)


@pytest.mark.parametrize("make", [_dense, _paged], ids=["dense", "paged"])
def test_mixed_greedy_and_sampled_batch(small_model, rng, make):
    """A greedy and a sampled request decode side by side; the greedy one is
    token-equal to a solo all-greedy run, the sampled one genuinely samples."""
    params, cfg = small_model
    p_greedy = list(rng.integers(1, 128, (6,)))
    p_sample = list(rng.integers(1, 128, (5,)))

    eng = make(params, cfg)  # engine default: greedy
    ug = eng.add_request(p_greedy, max_new_tokens=8)
    us = eng.add_request(p_sample, max_new_tokens=8,
                         do_sample=True, temperature=5.0, top_k=32)
    res = eng.run()

    solo = make(params, cfg)
    sg = solo.add_request(p_greedy, max_new_tokens=8)
    ss = solo.add_request(p_sample, max_new_tokens=8)
    sres = solo.run()

    assert res[ug] == sres[sg], "greedy request must ignore its neighbor's sampling"
    assert len(res[us]) == 8 and all(0 <= t < 128 for t in res[us])
    # at temperature 5 / top_k 32 on a random model, matching all 8 greedy
    # tokens is (1/32)^8-unlikely; seeds are fixed so this is deterministic
    assert res[us] != sres[ss], "sampled request should not be greedy"


@pytest.mark.parametrize("make", [_dense, _paged], ids=["dense", "paged"])
def test_per_request_stop_token(small_model, rng, make):
    params, cfg = small_model
    prompt = list(rng.integers(1, 128, (6,)))

    eng = make(params, cfg)
    uid = eng.add_request(prompt, max_new_tokens=8)
    full = eng.run()[uid]
    assert len(full) == 8

    stop = full[2]
    eng2 = make(params, cfg)
    uid2 = eng2.add_request(prompt, max_new_tokens=8, stop_token_ids=[stop])
    out = eng2.run()[uid2]
    cut = full.index(stop) + 1
    assert out == full[:cut], "must stop at (and keep) the stop token"


def test_per_request_temperature_zero_is_engine_default_greedy(small_model, rng):
    """Explicit per-request greedy (do_sample=False) on a sampling-default
    engine overrides the engine default."""
    params, cfg = small_model
    prompt = list(rng.integers(1, 128, (6,)))

    eng = _dense(params, cfg, do_sample=True, temperature=2.0)
    uid = eng.add_request(prompt, max_new_tokens=6, do_sample=False)
    out = eng.run()[uid]

    ref = _dense(params, cfg)  # greedy default
    ru = ref.add_request(prompt, max_new_tokens=6)
    assert out == ref.run()[ru]


def _multi_lora_tree(rng):
    from hqq_tpu.core.peft import PeftUtils, lora_config
    from hqq_tpu.nn.multilora import stack_adapters
    from tests.test_multilora import _bump_lora

    cfg = LlamaConfig.tiny(vocab_size=128)
    base = quantize_model(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32),
        BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32,
    )
    lora0 = _bump_lora(PeftUtils.add_lora(base, lora_config(r=4)), 0.03, rng)
    lora1 = _bump_lora(PeftUtils.add_lora(base, lora_config(r=4)), 0.08, rng)
    return cfg, stack_adapters([lora0, lora1], base)


def test_paged_multilora_matches_dense(rng):
    """Multi-LoRA on the PAGED engine: per-request adapters are token-equal
    to the dense engine's multi-LoRA (round-3 gap: adapter routing existed
    only on the dense engine)."""
    cfg, multi = _multi_lora_tree(rng)
    prompts = [list(rng.integers(1, 128, (7,))), list(rng.integers(1, 128, (5,)))]

    paged = _paged(multi, cfg)
    p0 = paged.add_request(prompts[0], max_new_tokens=8, adapter_id=0)
    p1 = paged.add_request(prompts[1], max_new_tokens=8, adapter_id=1)
    pres = paged.run()

    dense = _dense(multi, cfg)
    d0 = dense.add_request(prompts[0], max_new_tokens=8, adapter_id=0)
    d1 = dense.add_request(prompts[1], max_new_tokens=8, adapter_id=1)
    dres = dense.run()

    assert pres[p0] == dres[d0]
    assert pres[p1] == dres[d1]
    assert pres[p0] != pres[p1] or prompts[0] == prompts[1]


def test_paged_multilora_prefix_cache_keyed_by_adapter(rng):
    """The SAME prompt under two adapters must not share prefix pages (LoRA
    changes KV content): outputs stay per-adapter correct with the prefix
    cache on, and the second adapter takes no hits from the first's pages."""
    cfg, multi = _multi_lora_tree(rng)
    prompt = list(rng.integers(1, 128, (17,)))  # 2 full pages + tail at pg=8

    eng = PagedBatchingEngine(multi, cfg, batch_slots=1, num_pages=32,
                              page_size=8, max_pages_per_seq=8,
                              cache_dtype=jnp.float32,
                              enable_prefix_cache=True)
    u0 = eng.add_request(prompt, max_new_tokens=6, adapter_id=0)
    res0 = eng.run()[u0]
    hits_after_first = eng.prefix_cache_hits
    u1 = eng.add_request(prompt, max_new_tokens=6, adapter_id=1)
    res1 = eng.run()[u1]
    assert eng.prefix_cache_hits == hits_after_first, (
        "adapter 1 must not reuse adapter 0's pages")
    # same adapter again -> hits, same tokens
    u2 = eng.add_request(prompt, max_new_tokens=6, adapter_id=0)
    res2 = eng.run()[u2]
    assert eng.prefix_cache_hits > hits_after_first
    assert res2 == res0

    dense = _dense(multi, cfg)
    d0 = dense.add_request(prompt, max_new_tokens=6, adapter_id=0)
    d1 = dense.add_request(prompt, max_new_tokens=6, adapter_id=1)
    dres = dense.run()
    assert res0 == dres[d0]
    assert res1 == dres[d1]


def test_server_per_request_sampling(small_model, rng):
    """HTTP: per-request temperature (0 = greedy), stop_token_ids, and a
    sampled request all through the JSON API."""
    import http.client
    import json

    from hqq_tpu.serving.server import InferenceServer

    params, cfg = small_model
    eng = _dense(params, cfg)
    srv = InferenceServer(eng, port=0).start()
    try:
        def post(obj):
            conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=120)
            conn.request("POST", "/generate", json.dumps(obj),
                         {"Content-Type": "application/json"})
            r = conn.getresponse()
            return r.status, json.loads(r.read())

        prompt = list(int(x) for x in rng.integers(1, 128, (5,)))
        st, greedy = post({"prompt_ids": prompt, "max_new_tokens": 6,
                           "temperature": 0})
        assert st == 200 and len(greedy["tokens"]) == 6

        st, sampled = post({"prompt_ids": prompt, "max_new_tokens": 6,
                            "temperature": 5.0, "top_k": 32})
        assert st == 200 and len(sampled["tokens"]) == 6
        assert sampled["tokens"] != greedy["tokens"]

        stop = greedy["tokens"][1]
        st, stopped = post({"prompt_ids": prompt, "max_new_tokens": 6,
                            "temperature": 0, "stop_token_ids": [stop]})
        assert st == 200
        cut = greedy["tokens"].index(stop) + 1
        assert stopped["tokens"] == greedy["tokens"][:cut]
    finally:
        srv.stop()
