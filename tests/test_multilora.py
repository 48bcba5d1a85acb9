# SPDX-License-Identifier: Apache-2.0
"""Multi-LoRA serving: per-row adapter selection in one batched forward
matches per-adapter single runs."""

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.peft import PeftUtils, lora_config
from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, forward, init_params, quantize_model
from hqq_tpu.nn.multilora import MultiLoRALinear, adapter_context, stack_adapters


def _bump_lora(tree, value, rng):
    """Give an adapter tree a distinctive nonzero B."""
    import dataclasses as dc

    from hqq_tpu.core.peft import LoRALinear

    def rec(node):
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, list):
            return [rec(v) for v in node]
        if isinstance(node, LoRALinear):
            b = jnp.asarray(rng.standard_normal(node.lora_b.shape) * value,
                            node.lora_b.dtype)
            return dc.replace(node, lora_b=b)
        return node

    return rec(tree)


def test_multilora_matches_individual_adapters(rng):
    cfg = LlamaConfig.tiny(vocab_size=128)
    base = quantize_model(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32),
        BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32,
    )
    lora0 = _bump_lora(PeftUtils.add_lora(base, lora_config(r=4)), 0.02, rng)
    lora1 = _bump_lora(PeftUtils.add_lora(base, lora_config(r=4)), 0.05, rng)

    multi = stack_adapters([lora0, lora1], base)
    assert isinstance(multi["layers"][0]["self_attn"]["q_proj"], MultiLoRALinear)

    tokens = jnp.asarray(rng.integers(1, 128, (2, 6)), jnp.int32)

    # batched multi-adapter: row 0 -> adapter 0, row 1 -> adapter 1
    @jax.jit
    def multi_fwd(params, toks, ids):
        with adapter_context(ids):
            return forward(params, cfg, toks)[0]

    out = multi_fwd(multi, tokens, jnp.asarray([0, 1], jnp.int32))

    # singles
    ref0, _ = forward(lora0, cfg, tokens[:1])
    ref1, _ = forward(lora1, cfg, tokens[1:])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref1[0]),
                               rtol=2e-4, atol=2e-4)
    # the two adapters genuinely differ
    assert np.abs(np.asarray(out[0]) - np.asarray(out[1])).max() > 1e-3

    # no context bound -> bare base behavior
    out_base, _ = forward(multi, cfg, tokens)
    ref_base, _ = forward(base, cfg, tokens)
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(ref_base),
                               rtol=1e-5, atol=1e-5)


def test_multilora_through_engine(rng):
    """Per-request adapters in the continuous-batching engine: each request
    gets its adapter's tokens (equal to single-adapter engine runs)."""
    from hqq_tpu.serving.batching import ContinuousBatchingEngine

    cfg = LlamaConfig.tiny(vocab_size=128)
    base = quantize_model(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32),
        BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32,
    )
    lora0 = _bump_lora(PeftUtils.add_lora(base, lora_config(r=4)), 0.03, rng)
    lora1 = _bump_lora(PeftUtils.add_lora(base, lora_config(r=4)), 0.08, rng)
    multi = stack_adapters([lora0, lora1], base)

    prompts = [list(rng.integers(1, 128, (7,))), list(rng.integers(1, 128, (5,)))]

    eng = ContinuousBatchingEngine(multi, cfg, batch_slots=2, max_len=64,
                                   cache_dtype=jnp.float32)
    u0 = eng.add_request(prompts[0], max_new_tokens=8, adapter_id=0)
    u1 = eng.add_request(prompts[1], max_new_tokens=8, adapter_id=1)
    res = eng.run()

    # singles through dedicated engines on the individual adapter trees
    for tree, prompt, uid in ((lora0, prompts[0], u0), (lora1, prompts[1], u1)):
        solo = ContinuousBatchingEngine(tree, cfg, batch_slots=1, max_len=64,
                                        cache_dtype=jnp.float32)
        su = solo.add_request(prompt, max_new_tokens=8)
        sres = solo.run()
        assert res[uid] == sres[su], (uid, res[uid], sres[su])
