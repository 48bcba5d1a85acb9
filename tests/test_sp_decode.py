# SPDX-License-Identifier: Apache-2.0
"""Sequence-parallel paged decode: the page pool SPLIT across 8 devices
(contiguous page ranges), decode attention merged via online-softmax
partials (pmax + psum) — token-equal to the single-device paged engine
(SURVEY §5.7 decode side; VERDICT r4 item 10)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_params, quantize_model
from hqq_tpu.parallel import make_mesh, sp_paged_forward_fn
from hqq_tpu.serving.paged import PagedBatchingEngine


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny(vocab_size=256)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    return cfg, q


def _run(params, cfg, forward_fn=None, mesh=None):
    # 24 pages of 4 rows: a 40+ token sequence spans pages on >=3 of the 8
    # devices when the pool is split (3 pages/device)
    eng = PagedBatchingEngine(
        params, cfg, batch_slots=2, num_pages=24, page_size=4,
        max_pages_per_seq=12, cache_dtype=jnp.float32, forward_fn=forward_fn,
    )
    prompts = [list(range(3, 31)), [7, 5, 3, 2]]  # 28-token + short prompt
    uids = [eng.add_request(p, max_new_tokens=14) for p in prompts]
    if mesh is not None:
        with mesh:
            out = eng.run()
    else:
        out = eng.run()
    res = [out[u] for u in uids]
    eng.close()
    return res


def test_sp_decode_token_equal_to_single_device(model):
    cfg, q = model
    ref = _run(q, cfg)

    n = len(jax.devices())
    mesh = make_mesh(data=1, model=n)
    fwd = sp_paged_forward_fn(mesh, cfg, page_size=4)
    got = _run(q, cfg, forward_fn=fwd, mesh=mesh)
    assert got == ref, (got, ref)


def test_sp_decode_context_beyond_one_shard(model):
    """A single sequence whose pages EXCEED one device's share of the pool
    (3 pages/device here, the request holds 12): only the pooled capacity
    serves it; outputs must still match the single-device engine."""
    cfg, q = model

    def run_one(forward_fn=None, mesh=None):
        eng = PagedBatchingEngine(
            q, cfg, batch_slots=1, num_pages=24, page_size=4,
            max_pages_per_seq=12, cache_dtype=jnp.float32,
            forward_fn=forward_fn,
        )
        uid = eng.add_request(list(range(2, 34)), max_new_tokens=16)
        if mesh is not None:
            with mesh:
                out = eng.run()
        else:
            out = eng.run()
        res = out[uid]
        eng.close()
        return res

    ref = run_one()
    n = len(jax.devices())
    mesh = make_mesh(data=1, model=n)
    fwd = sp_paged_forward_fn(mesh, cfg, page_size=4)
    got = run_one(forward_fn=fwd, mesh=mesh)
    assert got == ref, (got, ref)
