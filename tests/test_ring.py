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
