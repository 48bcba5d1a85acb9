# SPDX-License-Identifier: Apache-2.0
"""DeepSeek-V3 (MLA + shared-expert MoE): HF parity, cached decode,
quantization of attention + stacked routed experts."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import deepseek3


def test_deepseek3_hf_logits_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.DeepseekV3Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        moe_intermediate_size=64, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=4,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        n_group=4, topk_group=2, norm_topk_prob=True, routed_scaling_factor=2.5,
        first_k_dense_replace=1, q_lora_rank=64, kv_lora_rank=32,
        qk_nope_head_dim=32, qk_rope_head_dim=16, v_head_dim=32,
        max_position_embeddings=128, rope_interleave=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.DeepseekV3ForCausalLM(hf_cfg).eval().float()
    # correction bias is a buffer initialized to zeros; give it structure
    with torch.no_grad():
        for layer in model.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.05, 0.05)

    cfg = deepseek3.DeepseekV3Config.from_hf(hf_cfg.to_dict())
    params = deepseek3.params_from_hf_state_dict(dict(model.state_dict()), cfg)

    tokens = np.array([[3, 14, 15, 92, 65, 35, 19, 41]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = deepseek3.forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=4e-4, atol=4e-4)


def test_deepseek3_cached_decode_matches_full():
    cfg = deepseek3.DeepseekV3Config.tiny()
    params = deepseek3.init_params(cfg, jax.random.PRNGKey(0))
    t = 10
    toks = (jnp.arange(t, dtype=jnp.int32) * 5 + 1).reshape(1, t) % cfg.vocab_size
    full, _ = deepseek3.forward(params, cfg, toks)
    cache = deepseek3.init_cache(cfg, 1, 16)
    _, cache = deepseek3.forward(params, cfg, toks[:, :6], cache, 0)
    outs = []
    for i in range(6, t):
        lg, cache = deepseek3.forward(params, cfg, toks[:, i:i+1], cache, i)
        outs.append(lg[:, 0])
    dec = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(dec, np.asarray(full[:, 6:]), rtol=2e-3, atol=2e-3)


def test_deepseek3_quantized():
    from hqq_tpu.models.base import quantize_model
    from hqq_tpu.nn.moe import GroupedQuantLinear, quantize_grouped

    import dataclasses

    # rope_interleave=False: on random tiny weights the interleaved rotation
    # happens to land a token near a gate top-k tie, and 8-bit quantization
    # flips the routing -> a large (but legitimate) logit diff. Interleave
    # correctness is covered exactly by the HF parity tests.
    cfg = dataclasses.replace(deepseek3.DeepseekV3Config.tiny(),
                              rope_interleave=False)
    params = deepseek3.init_params(cfg, jax.random.PRNGKey(1))
    # quantize attention/dense linears (router gate + norms stay fp)
    q = quantize_model(params, BaseQuantizeConfig(nbits=8, group_size=32),
                       compute_dtype=jnp.float32)
    # quantize the stacked routed experts
    for layer in q["layers"]:
        if "experts" in layer["mlp"]:
            ex = layer["mlp"]["experts"]
            for name in ("w1", "w2", "w3"):
                ex[name] = quantize_grouped(ex[name].weight, nbits=8, group_size=32,
                                            compute_dtype=jnp.float32)
            assert isinstance(ex["w1"], GroupedQuantLinear)

    toks = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    logits_fp, _ = deepseek3.forward(params, cfg, toks)
    logits_q, _ = deepseek3.forward(q, cfg, toks)
    rel = np.abs(np.asarray(logits_q) - np.asarray(logits_fp)).mean() / (
        np.abs(np.asarray(logits_fp)).mean() + 1e-9)
    assert rel < 0.1, rel


def test_deepseek3_yarn_rope_parity():
    """Real V3 checkpoints ship YaRN rope scaling with an mscale^2 softmax
    correction (HF DeepseekV3Attention); logits must match HF."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import numpy as np

    hf_cfg = transformers.DeepseekV3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=4, n_shared_experts=1,
        num_experts_per_tok=2, n_group=2, topk_group=2,
        q_lora_rank=24, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16, first_k_dense_replace=1,
        max_position_embeddings=256, tie_word_embeddings=False,
        rope_scaling={"rope_type": "yarn", "factor": 16.0,
                      "beta_fast": 32.0, "beta_slow": 1.0,
                      "mscale": 1.0, "mscale_all_dim": 1.0,
                      "original_max_position_embeddings": 32},
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.DeepseekV3ForCausalLM(hf_cfg).eval().float()

    cfg = deepseek3.DeepseekV3Config.from_hf(hf_cfg.to_dict())
    assert cfg.rope_scaling is not None
    import dataclasses as dc

    cfg = dc.replace(cfg)  # sanity: frozen ok
    params = deepseek3.params_from_hf_state_dict(
        dict(model.state_dict()), cfg, dtype=jnp.float32
    )
    toks = np.array([np.arange(48) % 120], np.int64)  # past the 32-token knee
    with torch.no_grad():
        ref = model(torch.from_numpy(toks)).logits.numpy()
    ours, _ = deepseek3.forward(params, cfg, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)
