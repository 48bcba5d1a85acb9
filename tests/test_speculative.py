# SPDX-License-Identifier: Apache-2.0
"""Speculative decoding invariant: output is bit-identical to the target's
vanilla greedy decode, for both a perfect draft (same model) and a weak
draft (2-bit quant of the same weights)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_params, quantize_model
from hqq_tpu.serving.generate import Generator
from hqq_tpu.serving.speculative import SpeculativeGenerator


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny(vocab_size=256)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    target = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                            compute_dtype=jnp.float32)
    draft = quantize_model(params, BaseQuantizeConfig(nbits=2, group_size=32),
                           compute_dtype=jnp.float32)
    prompt = np.array([3, 17, 92, 41, 5], np.int32)
    ref = Generator(target, cfg, do_sample=False, cache_dtype=jnp.float32,
                    compile_mode="partial").generate(prompt, max_new_tokens=24)
    return cfg, target, draft, prompt, np.asarray(ref)


def test_spec_decode_perfect_draft(setup):
    cfg, target, draft, prompt, ref = setup
    spec = SpeculativeGenerator(target, target, cfg, k=4, cache_dtype=jnp.float32)
    out = spec.generate(prompt, max_new_tokens=24)
    np.testing.assert_array_equal(out[0], ref[0])


def test_spec_decode_weak_draft(setup):
    cfg, target, draft, prompt, ref = setup
    spec = SpeculativeGenerator(target, draft, cfg, k=3, cache_dtype=jnp.float32)
    out = spec.generate(prompt, max_new_tokens=24)
    np.testing.assert_array_equal(out[0], ref[0])


def test_spec_decode_sampling_runs(setup):
    cfg, target, draft, prompt, ref = setup
    spec = SpeculativeGenerator(target, draft, cfg, k=3, cache_dtype=jnp.float32,
                                do_sample=True, temperature=0.8, seed=3)
    out = spec.generate(prompt, max_new_tokens=16)
    assert out.shape == (1, 16)
    assert (out >= 0).all() and (out < cfg.vocab_size).all()


def test_spec_decode_eos_stops(setup):
    cfg, target, draft, prompt, ref = setup
    eos = int(ref[0][5])  # force an eos hit mid-stream
    spec = SpeculativeGenerator(target, target, cfg, k=4, cache_dtype=jnp.float32,
                                eos_token_id=eos)
    out = spec.generate(prompt, max_new_tokens=24)
    assert out[0][-1] == eos
    assert len(out[0]) <= 24
    np.testing.assert_array_equal(out[0], ref[0][: len(out[0])])
