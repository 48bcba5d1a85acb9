# SPDX-License-Identifier: Apache-2.0
"""Multi-LoRA serving demo: two fine-tunes of one 4-bit base served in the
SAME continuous batch, each request routed to its adapter (LoRAX-style;
the reference can only serve one merged adapter at a time).

Run: PYTHONPATH=. python examples/multi_lora_serving.py
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.peft import LoRALinear, PeftUtils, lora_config
from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_params, quantize_model
from hqq_tpu.nn.multilora import stack_adapters
from hqq_tpu.serving.batching import ContinuousBatchingEngine

rng = np.random.default_rng(0)
cfg = LlamaConfig.tiny(vocab_size=256)
base = quantize_model(
    init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32),
    BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32,
)


def make_adapter(seed, strength):
    """Stand-in for a trained fine-tune: a LoRA tree with distinctive B."""
    tree = PeftUtils.add_lora(base, lora_config(r=4), key=jax.random.PRNGKey(seed))

    def bump(node):
        if isinstance(node, dict):
            return {k: bump(v) for k, v in node.items()}
        if isinstance(node, list):
            return [bump(v) for v in node]
        if isinstance(node, LoRALinear):
            b = jnp.asarray(rng.standard_normal(node.lora_b.shape) * strength,
                            node.lora_b.dtype)
            return dataclasses.replace(node, lora_b=b)
        return node

    return bump(tree)


adapters = [make_adapter(1, 0.03), make_adapter(2, 0.08)]
multi = stack_adapters(adapters, base)

engine = ContinuousBatchingEngine(multi, cfg, batch_slots=4, max_len=64,
                                  cache_dtype=jnp.float32)
for i in range(4):
    prompt = list(rng.integers(1, 256, (int(rng.integers(4, 12)),)))
    uid = engine.add_request(prompt, max_new_tokens=10, adapter_id=i % 2)
    print(f"request {uid}: adapter {i % 2}")

for uid, toks in sorted(engine.run().items()):
    print(f"request {uid}: {toks}")
