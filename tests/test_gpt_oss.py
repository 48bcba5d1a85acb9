# SPDX-License-Identifier: Apache-2.0
"""GPT-OSS family: HF parity (sinks + sliding/full + YaRN + clamped-SwiGLU
MoE with expert biases), quantization, paged decode."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import gpt_oss
from hqq_tpu.nn.moe import GroupedQuantLinear


def test_gpt_oss_hf_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.GptOssConfig(
        vocab_size=128, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=8, layer_types=["sliding_attention", "full_attention"],
        max_position_embeddings=256, tie_word_embeddings=False,
        pad_token_id=0, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.GptOssForCausalLM(hf_cfg).eval().float()

    cfg = gpt_oss.GptOssConfig.from_hf(hf_cfg.to_dict())
    assert cfg.rope_scaling_dict["rope_type"] == "yarn"
    # ample capacity -> no token drops -> exact parity with HF's dense loop
    cfg = dataclasses.replace(cfg, capacity_factor=float(cfg.num_local_experts))
    params = gpt_oss.params_from_hf_state_dict(
        dict(model.state_dict()), cfg, dtype=jnp.float32
    )
    toks = np.array([[3, 14, 15, 92, 65, 35, 89, 79, 32, 38, 46, 26]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = gpt_oss.forward(params, cfg, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)


def test_gpt_oss_quantize_and_cached_decode():
    cfg = gpt_oss.GptOssConfig.tiny()
    params = gpt_oss.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = gpt_oss.quantize_gpt_oss(
        params,
        attn_config=BaseQuantizeConfig(nbits=4, group_size=32),
        expert_config=BaseQuantizeConfig(nbits=4, group_size=32),
        compute_dtype=jnp.float32,
    )
    assert isinstance(q["layers"][0]["mlp"]["experts"]["gate_up_proj"],
                      GroupedQuantLinear)
    toks = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    full, _ = gpt_oss.forward(q, cfg, toks)
    cache = gpt_oss.init_cache(cfg, 1, 32, jnp.float32)
    logits = None
    for pos in range(4):
        logits, cache = gpt_oss.forward(q, cfg, toks[:, pos:pos + 1], cache, pos)
    np.testing.assert_allclose(
        np.asarray(logits[0, -1]), np.asarray(full[0, -1]), rtol=2e-4, atol=2e-4
    )


def test_gpt_oss_paged_matches_dense():
    from hqq_tpu.serving.paged import PagedBatchingEngine

    cfg = gpt_oss.GptOssConfig.tiny()
    params = gpt_oss.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    # give the sinks nontrivial values so the sink path is actually exercised
    for layer in params["layers"]:
        layer["self_attn"]["sinks"] = jnp.asarray([0.5, -0.3, 1.2, 0.0], jnp.float32)
    prompt = [3, 17, 29, 5]
    n_new = 5

    cache = gpt_oss.init_cache(cfg, 1, 64, jnp.float32)
    toks = jnp.asarray([prompt], jnp.int32)
    logits, cache = gpt_oss.forward(params, cfg, toks, cache, 0)
    ref = [int(jnp.argmax(logits[0, len(prompt) - 1]))]
    pos = len(prompt)
    for _ in range(n_new - 1):
        logits, cache = gpt_oss.forward(
            params, cfg, jnp.asarray([[ref[-1]]], jnp.int32), cache, pos
        )
        ref.append(int(jnp.argmax(logits[0, -1])))
        pos += 1

    eng = PagedBatchingEngine(
        params, cfg, batch_slots=1, num_pages=32, page_size=4,
        max_pages_per_seq=8, cache_dtype=jnp.float32,
        forward_fn=lambda p, t, c, s, ptab=None: gpt_oss.forward(
            p, cfg, t, c, s, page_indices=ptab
        ),
    )
    uid = eng.add_request(prompt, max_new_tokens=n_new)
    assert eng.run()[uid] == ref


def test_gpt_oss_paged_speculative_matches_paged():
    """Sinks + per-layer windows through the width-k verify window."""
    from hqq_tpu.serving.paged import PagedBatchingEngine
    from hqq_tpu.serving.speculative import SpeculativePagedEngine

    cfg = gpt_oss.GptOssConfig.tiny()
    params = gpt_oss.init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    for layer in params["layers"]:
        layer["self_attn"]["sinks"] = jnp.asarray([0.4, -0.2, 0.9, 0.1], jnp.float32)
    prompt = [3, 17, 29, 5]
    n_new = 6
    fwd = lambda p, t, c, s, ptab=None: gpt_oss.forward(  # noqa: E731
        p, cfg, t, c, s, page_indices=ptab
    )

    ref_eng = PagedBatchingEngine(params, cfg, batch_slots=1, num_pages=32,
                                  page_size=4, max_pages_per_seq=8,
                                  cache_dtype=jnp.float32, forward_fn=fwd)
    u = ref_eng.add_request(prompt, max_new_tokens=n_new)
    refs = ref_eng.run()

    eng = SpeculativePagedEngine(
        params, params, cfg, k_draft=3, batch_slots=1, num_pages=32,
        page_size=4, max_pages_per_seq=8, cache_dtype=jnp.float32,
        forward_fn=fwd,
        draft_forward_fn=lambda p, t, c, s: gpt_oss.forward(p, cfg, t, c, s),
    )
    v = eng.add_request(prompt, max_new_tokens=n_new)
    outs = eng.run()
    assert outs[v] == refs[u], (outs[v], refs[u])
