# SPDX-License-Identifier: Apache-2.0
"""Long-context forward via context parallelism: the sequence is sharded
across the mesh and attention runs as ring attention (ppermute K/V rotation,
online softmax) — no device ever holds the full sequence. Scales prefill /
PPL eval / training forward passes past single-chip activation limits.

Run on 8 virtual devices:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        PYTHONPATH=. python examples/long_context_cp.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_params, quantize_model
from hqq_tpu.models.llama import forward
from hqq_tpu.parallel import make_mesh
from hqq_tpu.parallel.cp import cp_forward_fn

cfg = LlamaConfig.tiny(vocab_size=512)
params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
qparams = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                         compute_dtype=jnp.float32)

n = len(jax.devices())
mesh = make_mesh(data=1, model=n)
fwd = cp_forward_fn(mesh, cfg)

T = 64 * n  # sequence sharded n ways
rng = np.random.default_rng(0)
tokens = jnp.asarray(rng.integers(1, 512, (1, T)), jnp.int32)

with mesh:
    logits = fwd(qparams, tokens)
print(f"context-parallel logits over {n} devices:", logits.shape)

# verify against the unsharded forward on a prefix that fits one device
ref, _ = forward(qparams, cfg, tokens)
err = float(jnp.abs(logits - ref).max())
print(f"max diff vs single-device forward: {err:.2e}")
assert err < 5e-3
