# SPDX-License-Identifier: Apache-2.0
"""BASELINE quality-mode configs end-to-end (configs 3 and 4):

* 2-bit / 3-bit AXIS=0 quantization (HQQ's quality-mode grouping — the ONLY
  axis the reference's native kernel layer serves, `hqq_aten_cuda.cpp:42`)
  decoding through the fused axis=0 Pallas kernel on the paged engine.
* HQQ+ 1-bit with low-rank adapters FUSED into the decode kernel: the bf16
  path (`PallasLoRAQuantLinear`) and the int8-MXU w4a8 path
  (`A8LoRAQuantLinear`) — adapters ride the fast decode kernels.

Run: PYTHONPATH=. python examples/quality_modes.py   (CPU ok; TPU for speed)
"""

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.peft import LoRALinear, PeftUtils, lora_config
from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import llama
from hqq_tpu.models.base import quantize_model
from hqq_tpu.serving.paged import PagedBatchingEngine
from hqq_tpu.utils.patching import prepare_for_inference

cfg = llama.LlamaConfig.tiny()
params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)

# --- config 3: axis=0 quality grouping, 2-bit ------------------------------
q0 = quantize_model(
    params,
    BaseQuantizeConfig(nbits=2, group_size=16, axis=0, compute_dtype=jnp.float32),
    compute_dtype=jnp.float32,
)
served = prepare_for_inference(q0, "pallas")  # axis=0 fuses (KernelQTensor0)
eng = PagedBatchingEngine(served, cfg, batch_slots=2, num_pages=32,
                          page_size=4, max_pages_per_seq=8,
                          cache_dtype=jnp.float32)
uid = eng.add_request([3, 17, 29, 5], max_new_tokens=8)
print("axis=0 2-bit paged decode:", eng.run()[uid])

# --- config 4: HQQ+ 1-bit, adapters fused into the decode kernel -----------
q1 = quantize_model(
    params,
    BaseQuantizeConfig(nbits=1, group_size=32, compute_dtype=jnp.float32),
    compute_dtype=jnp.float32,
)
lora = PeftUtils.add_lora(q1, lora_config(r=8, lora_alpha=16))
# (train the adapters here — see examples/hqq_plus.py; we fake a delta)
import dataclasses as dc


def bump(node):
    if isinstance(node, dict):
        return {k: bump(v) for k, v in node.items()}
    if isinstance(node, list):
        return [bump(v) for v in node]
    if isinstance(node, LoRALinear):
        b = jax.random.normal(jax.random.PRNGKey(1), node.lora_b.shape,
                              node.lora_b.dtype) * 0.01
        return dc.replace(node, lora_b=b)
    return node


lora = bump(lora)
for backend in ("pallas", "w4a8"):
    fused = prepare_for_inference(lora, backend)  # LoRA fused into the kernel
    logits, _ = llama.forward(fused, cfg, jnp.asarray([[3, 17, 29]], jnp.int32))
    ref, _ = llama.forward(lora, cfg, jnp.asarray([[3, 17, 29]], jnp.int32))
    rel = float(jnp.max(jnp.abs(logits - ref)) / jnp.max(jnp.abs(ref)))
    print(f"HQQ+ 1-bit fused adapters [{backend}]: rel err vs unfused = {rel:.4f}")
print("ok")
