# SPDX-License-Identifier: Apache-2.0
"""Sharding tests on the virtual 8-device CPU mesh: TP forward equals the
single-device forward; GSPMD-sharded params produce identical results."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, forward, init_cache, init_params, quantize_model
from hqq_tpu.parallel import make_mesh, prepare_tp_llama, shard_params, tp_forward_fn


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    qparams = quantize_model(
        params, BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32
    )
    return cfg, params, qparams


def test_mesh():
    mesh = make_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "model": 4}


def test_tp_forward_matches_single(model):
    cfg, params, qparams = model
    mesh = make_mesh(data=2, model=2)
    # pallas kernels run in interpret mode on CPU automatically
    tp_params, tp_specs, local_cfg = prepare_tp_llama(
        qparams, cfg, mesh, use_pallas=True
    )
    fwd = tp_forward_fn(mesh, tp_specs, local_cfg)

    b, t, s_max = 2, 8, 32
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (b, t)), jnp.int32
    )
    cache = init_cache(cfg, b, s_max, jnp.float32)

    with mesh:
        logits_tp, cache_tp = fwd(tp_params, tokens, cache, 0)

    logits_ref, cache_ref = forward(qparams, cfg, tokens, cache, 0)
    np.testing.assert_allclose(
        np.asarray(logits_tp), np.asarray(logits_ref), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache_tp.k), np.asarray(cache_ref.k), rtol=1e-5, atol=1e-5
    )


def test_tp_decode_steps(model):
    cfg, params, qparams = model
    mesh = make_mesh(data=1, model=2)  # tiny cfg has 2 kv heads
    tp_params, tp_specs, local_cfg = prepare_tp_llama(
        qparams, cfg, mesh, use_pallas=True
    )
    fwd = tp_forward_fn(mesh, tp_specs, local_cfg)

    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    cache = init_cache(cfg, 1, 16, jnp.float32)
    cache_ref = init_cache(cfg, 1, 16, jnp.float32)

    with mesh:
        logits, cache = fwd(tp_params, tokens, cache, 0)
    logits_ref, cache_ref = forward(qparams, cfg, tokens, cache_ref, 0)

    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    tok_ref = jnp.argmax(logits_ref[:, -1:], -1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(tok_ref))

    for pos in range(4, 7):
        with mesh:
            logits, cache = fwd(tp_params, tok, cache, pos)
        logits_ref, cache_ref = forward(qparams, cfg, tok_ref, cache_ref, pos)
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        tok_ref = jnp.argmax(logits_ref[:, -1:], -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(tok), np.asarray(tok_ref))


def test_gspmd_shard_params(model):
    cfg, params, qparams = model
    mesh = make_mesh(data=1, model=8)
    sharded = shard_params(qparams, mesh)
    tokens = jnp.asarray([[5, 6, 7, 8]], jnp.int32)

    logits_ref, _ = forward(qparams, cfg, tokens)
    with mesh:
        logits, _ = jax.jit(lambda p, t: forward(p, cfg, t))(sharded, tokens)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_ref), rtol=2e-4, atol=2e-4
    )
    # check a weight is actually sharded
    w = sharded["layers"][0]["self_attn"]["q_proj"].qweight.scale
    assert len(w.sharding.device_set) == 8


def test_mixtral_expert_parallel_sharding():
    """EP: stacked expert weights shard their E axis over 'model'; sharded
    forward == unsharded forward (GSPMD inserts the collectives)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import mixtral
    from hqq_tpu.parallel import make_mesh, shard_params

    cfg = mixtral.MixtralConfig.tiny()
    assert cfg.num_local_experts == 4
    params = mixtral.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = mixtral.quantize_mixtral(
        params,
        attn_config=BaseQuantizeConfig(nbits=4, group_size=32),
        expert_config=BaseQuantizeConfig(nbits=4, group_size=32),
        compute_dtype=jnp.float32,
    )

    tokens = jnp.asarray([[1, 5, 9, 12, 3, 7, 2, 8]], jnp.int32)
    ref_logits, _ = mixtral.forward(qparams, cfg, tokens)

    mesh = make_mesh(data=1, model=4)  # 4 experts over 4-way model axis
    sharded = shard_params(qparams, mesh)

    # verify the expert leaves actually got an expert-axis sharding
    gl = sharded["layers"][0]["block_sparse_moe"]["experts"]["w1"]
    spec = gl.wq.sharding.spec
    assert spec[0] == "model", spec

    with mesh:
        logits, _ = jax.jit(lambda p, t: mixtral.forward(p, cfg, t))(sharded, tokens)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-3, atol=2e-3
    )


def test_phi_gspmd_tensor_parallel():
    """GSPMD TP generalizes beyond llama: phi's q/k/v+fc1 shard column-wise,
    dense+fc2 row-wise; sharded forward == unsharded."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import phi, quantize_model
    from hqq_tpu.parallel import make_mesh, shard_params

    cfg = phi.PhiConfig.tiny()
    params = phi.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    tokens = jnp.asarray([[1, 5, 9, 12]], jnp.int32)
    ref, _ = phi.forward(q, cfg, tokens)

    mesh = make_mesh(data=1, model=4)
    sharded = shard_params(q, mesh)
    # fc1 bias must be model-sharded (column split)
    fc1 = sharded["layers"][0]["mlp"]["fc1"]
    assert fc1.bias.sharding.spec[0] == "model"
    with mesh:
        out, _ = jax.jit(lambda p, t: phi.forward(p, cfg, t))(sharded, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_tp_serving_gqa_70b_shape():
    """shard_map TP with GQA head ratios like Llama-2-70B (nh=8x nkv): each
    device gets nh/tp q heads and nkv/tp kv heads; logits match unsharded."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import LlamaConfig, init_cache, init_params, quantize_model
    from hqq_tpu.models.llama import forward
    from hqq_tpu.parallel import make_mesh, prepare_tp_llama, tp_forward_fn

    # 70B-shaped ratios at toy size: 16 q heads, 2 kv heads (GQA 8:1), tp=2
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=16, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    tokens = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    cache_ref = init_cache(cfg, 1, 16, jnp.float32)
    ref, _ = forward(q, cfg, tokens, cache_ref, 0)

    mesh = make_mesh(data=1, model=2)
    tp_params, tp_specs, local_cfg = prepare_tp_llama(q, cfg, mesh, use_pallas=False)
    assert local_cfg.num_attention_heads == 8
    assert local_cfg.num_key_value_heads == 1
    fwd = tp_forward_fn(mesh, tp_specs, local_cfg)
    cache = init_cache(cfg, 1, 16, jnp.float32)
    with mesh:
        out, _ = fwd(tp_params, tokens, cache, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_tp_serving_gqa_70b_shape_w4a8():
    """Same 70B-shaped GQA TP as above, but through the w4a8 kernel layout —
    the flagship '70B 4-bit tensor-sharded' config's fast path. Tolerance
    covers the per-shard dynamic activation quantization (~1%)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import LlamaConfig, init_cache, init_params, quantize_model
    from hqq_tpu.models.llama import forward
    from hqq_tpu.parallel import make_mesh, prepare_tp_llama, tp_forward_fn

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=16, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    tokens = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    cache_ref = init_cache(cfg, 1, 16, jnp.float32)
    ref, _ = forward(q, cfg, tokens, cache_ref, 0)

    mesh = make_mesh(data=1, model=2)
    tp_params, tp_specs, local_cfg = prepare_tp_llama(q, cfg, mesh, backend="w4a8")
    fwd = tp_forward_fn(mesh, tp_specs, local_cfg)
    cache = init_cache(cfg, 1, 16, jnp.float32)
    with mesh:
        out, _ = fwd(tp_params, tokens, cache, 0)
    g, r = np.asarray(out), np.asarray(ref)
    assert np.abs(g - r).max() / np.abs(r).max() < 0.05


def test_hybrid_mesh_layout_and_collective_placement():
    """make_hybrid_mesh: the outer 'dcn' axis strides across host granules,
    inner axes stay inside one granule — asserted BEHAVIORALLY: a psum over
    'model' must only combine values from one granule, a psum over 'dcn'
    must combine exactly one value per granule (≙ TP all-reduces on ICI, DP
    gradient reduce on DCN; SURVEY §5.8 / VERDICT r4 item 6)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from hqq_tpu.parallel.mesh import make_hybrid_mesh

    mesh = make_hybrid_mesh(dcn=2, data=1, model=4)
    assert mesh.axis_names == ("dcn", "data", "model")
    dev = np.asarray(mesh.devices)
    assert dev.shape == (2, 1, 4)
    # granule = all devices of one dcn index: one process each (virtual CPU
    # devices share a process; ids must at least be the contiguous blocks the
    # constructor guarantees)
    ids = np.vectorize(lambda d: d.id)(dev)
    procs = np.vectorize(lambda d: d.process_index)(dev)
    for gidx in range(2):
        assert len(set(procs[gidx].flat)) == 1, "granule spans processes"
    assert sorted(ids.flat) == list(range(8))
    assert set(ids[0].flat) == set(range(4)) and set(ids[1].flat) == set(range(4, 8))

    # device-id-valued operand, fully sharded
    x = jnp.arange(8.0).reshape(2, 1, 4)

    def model_psum(v):
        return jax.lax.psum(v, "model")

    def dcn_psum(v):
        return jax.lax.psum(v, "dcn")

    spec = P("dcn", "data", "model")
    with mesh:
        got_m = shard_map(model_psum, mesh=mesh, in_specs=spec,
                          out_specs=spec)(x)
        got_d = shard_map(dcn_psum, mesh=mesh, in_specs=spec,
                          out_specs=spec)(x)
    # psum over model: every element of granule g == sum of that granule only
    exp_m = np.repeat(np.asarray([[ [0+1+2+3] ], [[4+5+6+7]]], np.float32), 4, -1)
    np.testing.assert_array_equal(np.asarray(got_m), exp_m)
    # psum over dcn: element (i) pairs with its same-position peer in the
    # OTHER granule — exactly one value per granule crosses DCN
    exp_d = np.asarray(x) + np.asarray(x)[::-1]
    np.testing.assert_array_equal(np.asarray(got_d), exp_d)


def test_hybrid_mesh_dp_over_dcn_train_step():
    """DP-over-dcn x TP-over-model GSPMD train step on the hybrid mesh: the
    batch shards over the DCN axis, weights over the ICI model axis, loss is
    finite and matches the flat-mesh loss (geometry changes placement, not
    math)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hqq_tpu.core.peft import PeftUtils, TrainableParams, lora_config
    from hqq_tpu.parallel.mesh import make_hybrid_mesh
    from hqq_tpu.utils.training import make_lora_train_step

    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    lp = PeftUtils.add_lora(q, lora_config(r=4, lora_alpha=4))

    losses = {}
    for name, mesh, bspec in (
        ("hybrid", make_hybrid_mesh(dcn=2, data=1, model=4), P("dcn", None)),
        ("flat", make_mesh(data=2, model=4), P("data", None)),
    ):
        lparams = shard_params(lp, mesh)
        trainable = TrainableParams(lparams)
        train_vals = trainable.values()
        optimizer = optax.adamw(1e-3)
        opt_state = optimizer.init(train_vals)
        step = make_lora_train_step(cfg, trainable, optimizer)
        batch = jax.device_put(
            jnp.ones((4, 16), jnp.int32), NamedSharding(mesh, bspec)
        )
        with mesh:
            _, _, loss = step(train_vals, opt_state, lparams, batch)
            loss.block_until_ready()
        assert bool(jnp.isfinite(loss)), (name, loss)
        losses[name] = float(loss)
    assert abs(losses["hybrid"] - losses["flat"]) < 1e-4, losses
