# SPDX-License-Identifier: Apache-2.0
"""Ring attention (context parallelism): sharded result == full causal
attention computed on one device."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.parallel import make_mesh
from hqq_tpu.parallel.ring import ring_attention_sharded


def _full_causal(q, k, v):
    hd = q.shape[-1]
    s = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(hd)
    t = q.shape[2]
    neg = jnp.finfo(jnp.float32).min
    s = s + jnp.where(jnp.tril(jnp.ones((t, t), bool)), 0.0, neg)[None, None]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, v.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize("n_dev", [4, 8])
def test_ring_attention_matches_full(n_dev, rng):
    b, h, t, hd = 2, 4, 8 * n_dev, 32
    q = jnp.asarray(rng.standard_normal((b, h, t, hd)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.standard_normal((b, h, t, hd)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.standard_normal((b, h, t, hd)).astype(np.float32)) * 0.3

    ref = _full_causal(q, k, v)
    mesh = make_mesh(data=1, model=n_dev)
    with mesh:
        out = ring_attention_sharded(mesh, q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_context_parallel_forward_matches_unsharded(rng):
    """Full-model context-parallel prefill (sequence sharded over the mesh,
    ring attention) == single-device forward, on a quantized model."""
    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import LlamaConfig, init_params, quantize_model
    from hqq_tpu.models.llama import forward
    from hqq_tpu.parallel.cp import cp_forward_fn

    cfg = LlamaConfig.tiny(vocab_size=256)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)

    t = 64
    tokens = jnp.asarray(rng.integers(1, 256, (2, t)), jnp.int32)
    ref, _ = forward(q, cfg, tokens)

    mesh = make_mesh(data=1, model=8)
    fwd = cp_forward_fn(mesh, cfg)
    with mesh:
        out = fwd(q, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
