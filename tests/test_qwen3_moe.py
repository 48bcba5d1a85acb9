# SPDX-License-Identifier: Apache-2.0
"""Qwen3-MoE family: HF logits parity, quantization, paged decode, EP."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import qwen3_moe
from hqq_tpu.nn.moe import GroupedQuantLinear


def test_qwen3_moe_hf_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        max_position_embeddings=128, tie_word_embeddings=False,
        mlp_only_layers=[], decoder_sparse_step=1,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.Qwen3MoeForCausalLM(hf_cfg).eval().float()

    cfg = qwen3_moe.Qwen3MoeConfig.from_hf(hf_cfg.to_dict())
    # ample capacity -> no token drops -> exact parity with HF's dense loop
    cfg = dataclasses.replace(cfg, capacity_factor=float(cfg.num_experts))
    params = qwen3_moe.params_from_hf_state_dict(
        dict(model.state_dict()), cfg, dtype=jnp.float32
    )
    toks = np.array([[3, 14, 15, 92, 65, 35]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = qwen3_moe.forward(params, cfg, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_qwen3_moe_quantize_and_decode():
    cfg = qwen3_moe.Qwen3MoeConfig.tiny()
    params = qwen3_moe.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = qwen3_moe.quantize_qwen3_moe(
        params,
        attn_config=BaseQuantizeConfig(nbits=4, group_size=32),
        expert_config=BaseQuantizeConfig(nbits=4, group_size=32),
        compute_dtype=jnp.float32,
    )
    assert isinstance(q["layers"][0]["mlp"]["experts"]["gate_proj"], GroupedQuantLinear)
    toks = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    cache = qwen3_moe.init_cache(cfg, 1, 16, jnp.float32)
    logits, cache = qwen3_moe.forward(q, cfg, toks, cache, 0)
    assert np.isfinite(np.asarray(logits)).all()
    # cached decode continues
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    logits2, _ = qwen3_moe.forward(q, cfg, tok, cache, 4)
    assert np.isfinite(np.asarray(logits2)).all()


def test_qwen3_moe_paged_matches_dense():
    from hqq_tpu.serving.paged import PagedBatchingEngine

    cfg = qwen3_moe.Qwen3MoeConfig.tiny()
    params = qwen3_moe.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    prompt = [3, 17, 29, 5]
    n_new = 5

    # dense greedy reference
    cache = qwen3_moe.init_cache(cfg, 1, 64, jnp.float32)
    toks = jnp.asarray([prompt], jnp.int32)
    logits, cache = qwen3_moe.forward(params, cfg, toks, cache, 0)
    out = [int(jnp.argmax(logits[0, len(prompt) - 1]))]
    pos = len(prompt)
    for _ in range(n_new - 1):
        logits, cache = qwen3_moe.forward(
            params, cfg, jnp.asarray([[out[-1]]], jnp.int32), cache, pos
        )
        out.append(int(jnp.argmax(logits[0, -1])))
        pos += 1

    eng = PagedBatchingEngine(
        params, cfg, batch_slots=1, num_pages=32, page_size=4,
        max_pages_per_seq=8, cache_dtype=jnp.float32,
        forward_fn=lambda p, t, c, s, ptab=None: qwen3_moe.forward(
            p, cfg, t, c, s, page_indices=ptab
        ),
    )
    uid = eng.add_request(prompt, max_new_tokens=n_new)
    assert eng.run()[uid] == out


def test_qwen3_moe_expert_parallel():
    from hqq_tpu.parallel import make_mesh, shard_params

    cfg = qwen3_moe.Qwen3MoeConfig.tiny()
    params = qwen3_moe.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    q = qwen3_moe.quantize_qwen3_moe(
        params,
        attn_config=BaseQuantizeConfig(nbits=4, group_size=32),
        expert_config=BaseQuantizeConfig(nbits=4, group_size=32),
        compute_dtype=jnp.float32,
    )
    toks = jnp.asarray([[1, 5, 9, 12, 3, 7, 2, 8]], jnp.int32)
    ref, _ = qwen3_moe.forward(q, cfg, toks)
    mesh = make_mesh(data=1, model=4)
    sharded = shard_params(q, mesh)
    spec = sharded["layers"][0]["mlp"]["experts"]["gate_proj"].wq.sharding.spec
    assert spec[0] == "model", spec
    with mesh:
        got, _ = jax.jit(lambda p, t: qwen3_moe.forward(p, cfg, t))(sharded, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)
