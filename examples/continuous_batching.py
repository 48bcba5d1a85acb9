# SPDX-License-Identifier: Apache-2.0
"""Continuous-batching engine demo: requests of different lengths admitted
into decode slots as they free up (the TPU-native replacement for the
reference's vLLM serving path)."""

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_params, quantize_model
from hqq_tpu.serving.batching import ContinuousBatchingEngine

cfg = LlamaConfig.tiny(vocab_size=512)
params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
qparams = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                         compute_dtype=jnp.float32)

engine = ContinuousBatchingEngine(
    qparams, cfg, batch_slots=4, max_len=128, cache_dtype=jnp.float32
)

rng = np.random.default_rng(0)
for i in range(6):
    prompt = rng.integers(1, cfg.vocab_size, (int(rng.integers(4, 24)),))
    rid = engine.add_request(prompt.tolist(), max_new_tokens=16)
    print(f"request {rid}: prompt len {len(prompt)}")

results = engine.run()
for rid, toks in sorted(results.items()):
    print(f"request {rid}: {len(toks)} new tokens -> {toks[:8]}...")
