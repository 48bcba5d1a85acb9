# SPDX-License-Identifier: Apache-2.0
"""Speculative decoding demo: a 2-bit draft accelerates a 4-bit target with
bit-identical greedy output (feature absent from the reference library).

Run: PYTHONPATH=. python examples/speculative_demo.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_params, quantize_model
from hqq_tpu.serving.generate import Generator
from hqq_tpu.serving.speculative import SpeculativeGenerator

cfg = LlamaConfig.tiny(vocab_size=512)
fp = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
target = quantize_model(fp, BaseQuantizeConfig(nbits=4, group_size=32),
                        compute_dtype=jnp.float32)
draft = quantize_model(fp, BaseQuantizeConfig(nbits=2, group_size=32),
                       compute_dtype=jnp.float32)

prompt = np.array([3, 17, 92, 41, 5], np.int32)

vanilla = Generator(target, cfg, do_sample=False, cache_dtype=jnp.float32,
                    compile_mode="partial").generate(prompt, max_new_tokens=24)
spec = SpeculativeGenerator(target, draft, cfg, k=4, cache_dtype=jnp.float32)
out = spec.generate(prompt, max_new_tokens=24)

print("vanilla:", vanilla[0].tolist())
print("spec:   ", out[0].tolist())
print("identical:", bool((vanilla[0] == out[0]).all()))
