# SPDX-License-Identifier: Apache-2.0
"""Serving engines under tensor parallelism (VERDICT r1 item 2).

The flagship serving story — continuous batching over TP-sharded quantized
weights — executed end-to-end on the virtual device mesh: both engines must
produce token-for-token the same outputs as their single-device twins.
≙ what the reference's users get from vLLM's TP workers
(`/root/reference/hqq/utils/vllm.py:111-170`), here as one SPMD program."""

import jax
import jax.numpy as jnp
import pytest

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import llama
from hqq_tpu.models.base import quantize_model
from hqq_tpu.parallel import (
    make_mesh,
    prepare_tp_llama,
    tp_forward_fn,
    tp_serving_forward_fn,
)
from hqq_tpu.serving.batching import ContinuousBatchingEngine
from hqq_tpu.serving.paged import PagedBatchingEngine
from hqq_tpu.utils.patching import prepare_for_inference

PROMPTS = [[3, 17, 29, 5], [11, 2], [7, 7, 23, 23, 41, 9]]


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qparams = quantize_model(
        params, BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32
    )
    mesh = make_mesh(data=1, model=2)
    tp_params, tp_specs, local_cfg = prepare_tp_llama(qparams, cfg, mesh)
    single_params = prepare_for_inference(qparams, "pallas")
    return cfg, qparams, mesh, tp_params, tp_specs, local_cfg, single_params


def _run(engine):
    uids = [engine.add_request(p, max_new_tokens=6) for p in PROMPTS]
    outs = engine.run()
    return [outs[u] for u in uids]


def test_tp_dense_engine_matches_single(setup):
    cfg, qparams, mesh, tp_params, tp_specs, local_cfg, single_params = setup
    ref = _run(ContinuousBatchingEngine(
        single_params, cfg, batch_slots=2, max_len=64, cache_dtype=jnp.float32
    ))
    fwd = tp_forward_fn(mesh, tp_specs, local_cfg)
    got = _run(ContinuousBatchingEngine(
        tp_params, cfg, batch_slots=2, max_len=64, cache_dtype=jnp.float32,
        forward_fn=fwd,
    ))
    assert got == ref


def test_tp_paged_engine_matches_single(setup):
    cfg, qparams, mesh, tp_params, tp_specs, local_cfg, single_params = setup
    kw = dict(batch_slots=2, num_pages=32, page_size=4, max_pages_per_seq=8,
              cache_dtype=jnp.float32)
    ref = _run(PagedBatchingEngine(single_params, cfg, **kw))
    fwd = tp_serving_forward_fn(mesh, tp_specs, local_cfg, page_size=4)
    got = _run(PagedBatchingEngine(tp_params, cfg, forward_fn=fwd, **kw))
    assert got == ref


def test_tp_paged_pool_is_head_sharded(setup):
    """The page pool's KV-head axis must actually shard over the model axis
    (per-device pool bytes ~ global/tp)."""
    cfg, qparams, mesh, tp_params, tp_specs, local_cfg, single_params = setup
    from hqq_tpu.parallel import tp_paged_forward_fn
    from hqq_tpu.ops.paged import init_paged_cache

    fwd = tp_paged_forward_fn(mesh, tp_specs, local_cfg, page_size=4)
    cache = init_paged_cache(cfg, num_pages=16, page_size=4, dtype=jnp.float32)
    tokens = jnp.ones((2, 1), jnp.int32)
    lengths = jnp.asarray([1, 2], jnp.int32)
    ptab = jnp.arange(2 * 8, dtype=jnp.int32).reshape(2, 8) % 16
    logits, cache2 = fwd(tp_params, tokens, cache, lengths, ptab)
    assert bool(jnp.isfinite(logits).all())
    shard_shapes = {s.data.shape for s in cache2.k.addressable_shards}
    tp = mesh.shape["model"]
    assert all(sh[1] == cfg.num_key_value_heads // tp for sh in shard_shapes), (
        shard_shapes
    )


def test_tp_dense_w4a8_backend_forward(setup):
    """The int8-MXU-operand kernel layout shards through TP with the SAME
    activation quantization as single-device: K-sharded (row-parallel)
    layers pmax their activation amax over the model axis (A8QuantLinear
    reduce_axis, set by prepare_tp), so every rank's int8 codes are the
    single-device codes restricted to its K slice and the psum reproduces
    the single-device result to f32 association (was 5%-tolerance in r2)."""
    import numpy as np

    cfg, qparams, mesh, *_ = setup
    tp_params, tp_specs, local_cfg = prepare_tp_llama(
        qparams, cfg, mesh, backend="w4a8"
    )
    single_params = prepare_for_inference(qparams, "w4a8")
    fwd = tp_forward_fn(mesh, tp_specs, local_cfg)
    tokens = jnp.asarray([[3, 17, 29, 5]], jnp.int32)
    cache_tp = llama.init_cache(cfg, 1, 16, jnp.float32)
    got, _ = fwd(tp_params, tokens, cache_tp, 0)
    cache_1 = llama.init_cache(cfg, 1, 16, jnp.float32)
    ref, _ = llama.forward(single_params, cfg, tokens, cache_1, 0)
    g, r = np.asarray(got), np.asarray(ref)
    denom = np.abs(r).max()
    assert np.abs(g - r).max() / denom < 1e-4, np.abs(g - r).max() / denom


def test_tp_paged_engine_w4a8_matches_single(setup):
    """Engine-level w4a8 TP: token-for-token equal to the single-device
    w4a8 paged engine (possible because of the shard-consistent activation
    scales — see test above)."""
    cfg, qparams, mesh, *_ = setup
    tp_params, tp_specs, local_cfg = prepare_tp_llama(
        qparams, cfg, mesh, backend="w4a8"
    )
    kw = dict(batch_slots=2, num_pages=32, page_size=4, max_pages_per_seq=8,
              cache_dtype=jnp.float32)
    ref = _run(PagedBatchingEngine(
        prepare_for_inference(qparams, "w4a8"), cfg, **kw
    ))
    fwd = tp_serving_forward_fn(mesh, tp_specs, local_cfg, page_size=4)
    got = _run(PagedBatchingEngine(tp_params, cfg, forward_fn=fwd, **kw))
    assert got == ref


def test_tp_paged_engine_70b_shape_gqa():
    """The north-star serving config in miniature: GQA 70B head ratios
    (nh = 8×nkv), 4-bit weights TP-sharded, paged continuous batching on the
    mesh — token-for-token equal to the single-device paged engine."""
    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=16, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qparams = quantize_model(
        params, BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32
    )
    mesh = make_mesh(data=1, model=2)
    tp_params, tp_specs, local_cfg = prepare_tp_llama(qparams, cfg, mesh)
    kw = dict(batch_slots=2, num_pages=32, page_size=4, max_pages_per_seq=8,
              cache_dtype=jnp.float32)
    ref = _run(PagedBatchingEngine(
        prepare_for_inference(qparams, "pallas"), cfg, **kw
    ))
    fwd = tp_serving_forward_fn(mesh, tp_specs, local_cfg, page_size=4)
    got = _run(PagedBatchingEngine(tp_params, cfg, forward_fn=fwd, **kw))
    assert got == ref
