# SPDX-License-Identifier: Apache-2.0
"""Paged-KV serving: reference paged attention vs dense attention, and the
paged engine vs the dense engine on identical greedy workloads."""

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_params, quantize_model
from hqq_tpu.serving.batching import ContinuousBatchingEngine
from hqq_tpu.serving.paged import (
    PagedBatchingEngine,
    init_paged_cache,
    paged_attention_ref,
)


def test_paged_attention_ref_matches_dense(rng):
    b, h, hd, pg, mp = 2, 4, 32, 4, 8
    s_max = pg * mp
    q = jnp.asarray(rng.standard_normal((b, h, hd)).astype(np.float32)) * 0.3
    kv = rng.standard_normal((b, h, s_max, hd)).astype(np.float32) * 0.3
    vv = rng.standard_normal((b, h, s_max, hd)).astype(np.float32) * 0.3
    lengths = jnp.asarray([13, 29], jnp.int32)

    # scatter kv into pages with a shuffled block table
    perm = rng.permutation(np.arange(1, 1 + b * mp)).reshape(b, mp)
    k_pages = np.zeros((h, 1 + b * mp, pg, hd), np.float32)
    v_pages = np.zeros_like(k_pages)
    for bi in range(b):
        for j in range(mp):
            k_pages[:, perm[bi, j]] = kv[bi, :, j * pg : (j + 1) * pg]
            v_pages[:, perm[bi, j]] = vv[bi, :, j * pg : (j + 1) * pg]

    out = paged_attention_ref(
        q, jnp.asarray(k_pages), jnp.asarray(v_pages), lengths, jnp.asarray(perm)
    )

    # dense oracle
    neg = np.finfo(np.float32).min
    for bi in range(b):
        L = int(lengths[bi])
        scores = np.einsum("hd,hsd->hs", np.asarray(q)[bi], kv[bi, :, :L])
        p = jax.nn.softmax(jnp.asarray(scores), axis=-1)
        expect = np.einsum("hs,hsd->hd", np.asarray(p), vv[bi, :, :L])
        np.testing.assert_allclose(np.asarray(out)[bi], expect, rtol=2e-4, atol=2e-4)


def test_paged_engine_matches_dense_engine(rng):
    cfg = LlamaConfig.tiny(vocab_size=512)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                             compute_dtype=jnp.float32)

    prompts = [
        list(rng.integers(1, 512, (int(n),))) for n in (5, 11, 19, 7)
    ]

    dense = ContinuousBatchingEngine(
        qparams, cfg, batch_slots=2, max_len=64, cache_dtype=jnp.float32
    )
    paged = PagedBatchingEngine(
        qparams, cfg, batch_slots=2, num_pages=64, page_size=8,
        max_pages_per_seq=8, cache_dtype=jnp.float32,
    )
    for p in prompts:
        dense.add_request(p, max_new_tokens=10)
        paged.add_request(p, max_new_tokens=10)

    out_d = dense.run()
    out_p = paged.run()
    assert set(out_d) == set(out_p)
    for uid in out_d:
        assert out_d[uid] == out_p[uid], (uid, out_d[uid], out_p[uid])


def test_paged_engine_quantized_kv_close_to_fp():
    # own rng (NOT the session fixture): this is a statistical-tolerance test
    # and must see the same prompts regardless of which tests ran before it
    import numpy as np

    rng = np.random.default_rng(42)
    cfg = LlamaConfig.tiny(vocab_size=512)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                             compute_dtype=jnp.float32)
    prompts = [list(rng.integers(1, 512, (int(n),))) for n in (6, 14)]

    fp = PagedBatchingEngine(qparams, cfg, batch_slots=2, num_pages=64,
                             page_size=8, max_pages_per_seq=8,
                             cache_dtype=jnp.float32)
    q8 = PagedBatchingEngine(qparams, cfg, batch_slots=2, num_pages=64,
                             page_size=8, max_pages_per_seq=8,
                             cache_dtype=jnp.float32, quantize_kv=True)
    for p in prompts:
        fp.add_request(p, max_new_tokens=8)
        q8.add_request(p, max_new_tokens=8)
    out_fp = fp.run()
    out_q8 = q8.run()
    # int8 KV on a random tiny model: the first token (pre-cache-decode) must
    # agree; later tokens may diverge slightly — require >= half matching
    total = same = 0
    for uid in out_fp:
        assert out_fp[uid][0] == out_q8[uid][0]
        for a, b in zip(out_fp[uid], out_q8[uid]):
            total += 1
            same += int(a == b)
    assert same / total > 0.5, (same, total)


def test_paged_horizon_matches_single_step(rng):
    cfg = LlamaConfig.tiny(vocab_size=512)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    prompts = [list(rng.integers(1, 512, (int(n),))) for n in (5, 11, 8)]

    kw = dict(batch_slots=2, num_pages=64, page_size=8, max_pages_per_seq=8,
              cache_dtype=jnp.float32)
    e1 = PagedBatchingEngine(q, cfg, horizon=1, **kw)
    e4 = PagedBatchingEngine(q, cfg, horizon=4, **kw)
    for p in prompts:
        e1.add_request(p, max_new_tokens=10)
        e4.add_request(p, max_new_tokens=10)
    r1, r4 = e1.run(), e4.run()
    for uid in r1:
        assert r1[uid] == r4[uid], (uid, r1[uid], r4[uid])
