# SPDX-License-Identifier: Apache-2.0
"""Mixtral MoE tests: HF logits parity, dispatch exactness, quantization."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import mixtral
from hqq_tpu.nn.moe import (
    GroupedLinear,
    GroupedQuantLinear,
    moe_dispatch,
    quantize_grouped,
)


def test_moe_dispatch_exact():
    """With ample capacity, dispatch+combine reproduces the dense weighted
    sum over top-k experts."""
    rng = np.random.default_rng(0)
    t, e, k = 16, 4, 2
    probs = jax.nn.softmax(jnp.asarray(rng.standard_normal((t, e)), jnp.float32))
    dispatch, combine = moe_dispatch(probs, k, capacity=t * k)

    x = jnp.asarray(rng.standard_normal((t, 8)), jnp.float32)
    expert_w = jnp.asarray(rng.standard_normal((e, 8, 8)), jnp.float32)

    expert_in = jnp.einsum("tec,td->ecd", dispatch.astype(x.dtype), x)
    expert_out = jnp.einsum("ecd,efd->ecf", expert_in, expert_w)
    out = jnp.einsum("tec,ecf->tf", combine, expert_out)

    # dense reference
    vals, idxs = jax.lax.top_k(probs, k)
    vals = vals / vals.sum(-1, keepdims=True)
    ref = np.zeros((t, 8), np.float32)
    for ti in range(t):
        for kk in range(k):
            ref[ti] += float(vals[ti, kk]) * np.asarray(
                x[ti] @ expert_w[int(idxs[ti, kk])].T
            )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_capacity_drops():
    probs = jnp.asarray([[1.0, 0.0], [1.0, 0.0], [1.0, 0.0]], jnp.float32)
    dispatch, combine = moe_dispatch(probs, 1, capacity=2)
    # third token routed to expert 0 exceeds capacity 2 -> dropped
    assert int(dispatch.sum()) == 2


def test_grouped_quant_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((4, 64, 128)).astype(np.float32) / 10)
    gq = quantize_grouped(w, nbits=4, group_size=32, compute_dtype=jnp.float32)
    assert gq.n_experts == 4
    w_dq = np.asarray(gq.dequantize(jnp.float32))
    assert np.abs(w_dq - np.asarray(w)).mean() < 0.01
    x = jnp.asarray(rng.standard_normal((4, 8, 128)).astype(np.float32))
    y = np.asarray(gq(x))
    y_ref = np.einsum("ecd,efd->ecf", np.asarray(x), w_dq)
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-3)


def test_mixtral_forward_and_quantize():
    cfg = mixtral.MixtralConfig.tiny()
    params = mixtral.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)
    logits, _ = mixtral.forward(params, cfg, toks)
    assert logits.shape == (1, 6, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()

    qparams = mixtral.quantize_mixtral(
        params,
        attn_config=BaseQuantizeConfig(nbits=4, group_size=32),
        expert_config=BaseQuantizeConfig(nbits=4, group_size=32),
        compute_dtype=jnp.float32,
    )
    l0 = qparams["layers"][0]
    from hqq_tpu.nn import Linear, QuantLinear

    assert isinstance(l0["self_attn"]["q_proj"], QuantLinear)
    assert isinstance(l0["block_sparse_moe"]["gate"], Linear)  # router stays fp
    assert isinstance(l0["block_sparse_moe"]["experts"]["w1"], GroupedQuantLinear)

    qlogits, _ = mixtral.forward(qparams, cfg, toks)
    rel = np.abs(np.asarray(qlogits) - np.asarray(logits)).mean() / (
        np.abs(np.asarray(logits)).mean() + 1e-9
    )
    assert rel < 0.5


def test_mixtral_cache_decode():
    cfg = mixtral.MixtralConfig.tiny()
    params = mixtral.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    toks = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    full, _ = mixtral.forward(params, cfg, toks)
    cache = mixtral.init_cache(cfg, 1, 16, jnp.float32)
    pre, cache = mixtral.forward(params, cfg, toks[:, :3], cache, 0)
    step, cache = mixtral.forward(params, cfg, toks[:, 3:4], cache, 3)
    np.testing.assert_allclose(
        np.asarray(step[:, 0]), np.asarray(full[:, 3]), rtol=2e-3, atol=2e-3
    )


def test_mixtral_hf_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.MixtralForCausalLM(hf_cfg).eval().float()

    cfg = mixtral.MixtralConfig.from_hf(hf_cfg.to_dict())
    # ample capacity -> no token drops -> exact parity with HF's dense loop
    cfg = dataclasses.replace(cfg, capacity_factor=float(cfg.num_local_experts))
    params = mixtral.params_from_hf_state_dict(
        dict(model.state_dict()), cfg, dtype=jnp.float32
    )
    toks = np.array([[3, 14, 15, 92, 65, 35]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = mixtral.forward(params, cfg, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_mixtral_save_load(tmp_path):
    cfg = mixtral.MixtralConfig.tiny()
    params = mixtral.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    qparams = mixtral.quantize_mixtral(
        params,
        attn_config=BaseQuantizeConfig(nbits=4, group_size=32),
        expert_config=BaseQuantizeConfig(nbits=2, group_size=32),
        compute_dtype=jnp.float32,
    )
    from hqq_tpu.models import from_quantized, save_quantized

    toks = jnp.asarray([[7, 8, 9]], jnp.int32)
    before, _ = mixtral.forward(qparams, cfg, toks)
    save_quantized(qparams, str(tmp_path / "mix"), config={"model_type": "mixtral"})
    params2, meta = from_quantized(str(tmp_path / "mix"))
    after, _ = mixtral.forward(params2, cfg, toks)
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    assert params2["layers"][0]["block_sparse_moe"]["experts"]["w1"].nbits == 2
