# SPDX-License-Identifier: Apache-2.0
"""HQQ+ demo: LoRA adapters on a quantized model, trained with optax
(≙ reference `examples/hqq_plus.py`, which delegates the loop to TRL;
here the training step is native JAX — jitted, grads only to A/B).

Run: PYTHONPATH=. python examples/hqq_plus.py
"""

import numpy as np
import optax
import jax
import jax.numpy as jnp

from hqq_tpu.core.peft import PeftUtils, TrainableParams, lora_config
from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_params, quantize_model
from hqq_tpu.utils.training import make_lora_train_step

cfg = LlamaConfig.tiny(vocab_size=512)
params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)

# 2-bit base + LoRA = the HQQ+ recipe (low-bit quality recovered by adapters)
qparams = quantize_model(
    params, BaseQuantizeConfig(nbits=2, group_size=32), compute_dtype=jnp.float32
)
lparams = PeftUtils.add_lora(qparams, lora_config(r=8, lora_alpha=8))

trainable = TrainableParams(lparams)
train_vals = trainable.values()
n_train = sum(int(np.prod(v.shape)) for v in train_vals)
print(f"trainable LoRA params: {n_train:,}")

optimizer = optax.adamw(3e-4)
opt_state = optimizer.init(train_vals)
step = make_lora_train_step(cfg, trainable, optimizer)

rng = np.random.default_rng(0)
for i in range(20):
    batch = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)
    train_vals, opt_state, loss = step(train_vals, opt_state, lparams, batch)
    if i % 5 == 0:
        print(f"step {i:3d}  loss {float(loss):.4f}")

# merge adapters back into the quantized base
lparams = trainable.inject(train_vals, lparams)
merged = PeftUtils.merge_lora(lparams, BaseQuantizeConfig(nbits=2, group_size=32))
print("merged LoRA back into 2-bit base:", type(merged["layers"][0]["self_attn"]["q_proj"]).__name__)
