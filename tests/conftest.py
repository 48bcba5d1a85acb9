# SPDX-License-Identifier: Apache-2.0
"""Test configuration: run everything on a virtual 8-device CPU mesh so the
suite is deterministic and hardware-independent (sharding tests included)."""

import os
import sys

# Must be set before jax initializes a backend. The environment may register
# an experimental TPU plugin via sitecustomize and force JAX_PLATFORMS onto
# it, so setting the env var is not enough — override the config directly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite is compile-dominated; repeat runs of
# unchanged tests hit the cache
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".cache", "jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
