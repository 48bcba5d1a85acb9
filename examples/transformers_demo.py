# SPDX-License-Identifier: Apache-2.0
"""Engine demo (≙ reference `examples/transformers_demo.py`): the five-line
quantize → save → load → generate workflow.

With a local HF checkpoint:   PYTHONPATH=. python examples/transformers_demo.py /path/to/llama
Without one (tiny random):    PYTHONPATH=. python examples/transformers_demo.py
"""

import sys
import tempfile

import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.engine.hf import HQQModel, HQQModelForCausalLM

if len(sys.argv) > 1:
    model = HQQModelForCausalLM.from_pretrained(sys.argv[1])
else:
    # no checkpoint handy: build a tiny random llama through the same engine
    from hqq_tpu.models import LlamaConfig, init_params

    cfg = LlamaConfig.tiny(vocab_size=512)
    model = HQQModel(
        params=init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16),
        cfg=cfg,
        model_type="llama",
    )

model.quantize_model(BaseQuantizeConfig(nbits=4, group_size=32))

with tempfile.TemporaryDirectory() as d:
    model.save_quantized(d)
    model = HQQModelForCausalLM.from_quantized(d)

model.prepare_for_inference(backend="int8")  # or "pallas" for batched serving

prompt_ids = jnp.asarray([[1, 5, 9, 12]], jnp.int32)
out = model.generate(prompt_ids, max_new_tokens=16)
print("generated ids:", out)
