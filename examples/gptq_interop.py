# SPDX-License-Identifier: Apache-2.0
"""GPTQ ecosystem interop: serve an AutoGPTQ/vLLM-convention checkpoint on
TPU, and export one for the GPU ecosystem.

    JAX_PLATFORMS=cpu PYTHONPATH=. python examples/gptq_interop.py [gptq_dir]

Without a directory, a tiny model is quantized, exported to the GPTQ format
(`save_to_gptq`: sharded safetensors + index + HF quantization_config),
reloaded (`load_gptq`) and served through the w4a8 backend — the full round
trip an ecosystem user would take. ≙ the reference's vLLM/GPTQ packing
interop (`/root/reference/hqq/utils/vllm.py:53-99`)."""

import os
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import llama
from hqq_tpu.models.base import quantize_model
from hqq_tpu.models.interop import load_gptq, save_to_gptq
from hqq_tpu.utils.patching import fuse_for_decode, prepare_for_inference

if len(sys.argv) > 1:
    gptq_dir = sys.argv[1]
else:
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    # GPTQ needs integral zero-points: round_zero on, solver off
    qcfg = BaseQuantizeConfig(nbits=4, group_size=32, optimize=False)
    qparams = quantize_model(params, qcfg, compute_dtype=jnp.float32)
    gptq_dir = os.path.join(tempfile.mkdtemp(), "gptq")
    save_to_gptq(qparams, cfg, gptq_dir, shard_layers=1)
    print(f"exported GPTQ checkpoint -> {gptq_dir}")
    print(" ", sorted(os.listdir(gptq_dir)))

params, cfg = load_gptq(gptq_dir, compute_dtype=jnp.float32)
params = fuse_for_decode(prepare_for_inference(params, "w4a8"), pad_to=0)
cache = llama.init_cache(cfg, 1, 32, jnp.float32)
toks = jnp.asarray([[3, 17, 29, 5]], jnp.int32)
logits, cache = llama.forward(params, cfg, toks, cache, 0)
print("served GPTQ checkpoint via w4a8:", logits.shape,
      "finite:", bool(jnp.isfinite(logits).all()))
