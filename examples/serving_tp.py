# SPDX-License-Identifier: Apache-2.0
"""Tensor-parallel sharded serving demo (≙ the reference's vLLM integration,
`/root/reference/hqq/utils/vllm.py` — but TPU-native: shard_map over a JAX
device mesh with explicit psum/all-gather dataflow).

Runs on any host with 8 virtual CPU devices:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        PYTHONPATH=. python examples/serving_tp.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_cache, init_params, quantize_model
from hqq_tpu.parallel import make_mesh, prepare_tp_llama, tp_forward_fn

n = len(jax.devices())
mesh = make_mesh(data=1, model=n)
print(f"mesh: {mesh}")

cfg = LlamaConfig(
    vocab_size=512, hidden_size=256, intermediate_size=512,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
    head_dim=32, max_position_embeddings=128,
)
params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
qparams = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                         compute_dtype=jnp.float32)

tp_params, tp_specs, local_cfg = prepare_tp_llama(qparams, cfg, mesh)
fwd = tp_forward_fn(mesh, tp_specs, local_cfg)

cache = init_cache(cfg, batch=1, max_len=32, dtype=jnp.float32)
tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
with mesh:
    logits, cache = fwd(tp_params, tokens, cache, 0)
print("TP logits:", logits.shape, "finite:", bool(jnp.isfinite(logits).all()))

# ---- TP through the serving engines (round 2): both continuous-batching
# engines take the same sharded forward via `forward_fn` — ≙ what vLLM's TP
# workers give the reference, as ONE SPMD program ----
from hqq_tpu.parallel import tp_serving_forward_fn
from hqq_tpu.serving.batching import ContinuousBatchingEngine
from hqq_tpu.serving.paged import PagedBatchingEngine

sfwd = tp_serving_forward_fn(mesh, tp_specs, local_cfg, page_size=4)

eng = ContinuousBatchingEngine(tp_params, cfg, batch_slots=2, max_len=32,
                               cache_dtype=jnp.float32, forward_fn=sfwd)
eng.add_request([1, 2, 3], max_new_tokens=4)
eng.add_request([5, 6], max_new_tokens=4)
print("TP dense engine:", eng.run())

peng = PagedBatchingEngine(tp_params, cfg, batch_slots=2, num_pages=16,
                           page_size=4, max_pages_per_seq=4,
                           cache_dtype=jnp.float32, forward_fn=sfwd)
peng.add_request([1, 2, 3], max_new_tokens=4)
print("TP paged engine:", peng.run())

# Multi-host note: on a pod slice, call `hqq_tpu.parallel.init_multihost()`
# first, build the mesh over all devices, and run THIS SAME script in every
# host process. The engines' host-side scheduling (slot assignment, page
# tables, admission) is deterministic pure-Python over identical inputs, so
# every host takes identical decisions and the jitted steps run as one SPMD
# program over the global mesh — no scheduler RPC needed (feed all hosts the
# same request stream, e.g. via a shared queue with a deterministic order).
