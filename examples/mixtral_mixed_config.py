# SPDX-License-Identifier: Apache-2.0
"""Mixed per-tag quantization of a Mixtral-style MoE
(≙ reference `examples/models/mixtral_13GB_example.py:21-33`: 4-bit
attention, 3-bit experts, gate kept fp)."""

import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import mixtral

cfg = mixtral.MixtralConfig.tiny(vocab_size=512)
params = mixtral.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

# per-tag configs: attention 4-bit g64-like, experts 3-bit, router skipped
attn_cfg = BaseQuantizeConfig(nbits=4, group_size=32)
expert_cfg = BaseQuantizeConfig(nbits=3, group_size=32)

qparams = mixtral.quantize_mixtral(
    params,
    attn_config=attn_cfg,
    expert_config=expert_cfg,
)

cache = mixtral.init_cache(cfg, batch=1, max_len=64)
tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
logits, cache = jax.jit(
    lambda p, t, c: mixtral.forward(p, cfg, t, c, 0)
)(qparams, tokens, cache)
print("mixed-config mixtral logits:", logits.shape,
      "finite:", bool(jnp.isfinite(logits).all()))
