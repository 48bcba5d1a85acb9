# SPDX-License-Identifier: Apache-2.0
"""Observability utilities: benchmark, roofline report, event log."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from hqq_tpu.nn import QuantLinear
from hqq_tpu.utils.profiling import EventLog, benchmark, hbm_bandwidth, roofline_report


def test_benchmark_runs():
    f = jax.jit(lambda x: (x @ x.T).sum())
    x = jnp.ones((64, 64), jnp.float32)
    stats = benchmark(f, x, iters=3, warmup=1)
    assert stats["best_s"] > 0 and stats["mean_s"] >= stats["best_s"]


def test_roofline_report(rng):
    w = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    layer = QuantLinear.quantize(w, None, nbits=4, group_size=64)
    r = roofline_report(layer, batch=1)
    assert r["weight_bytes"] < r["bf16_bytes"]
    assert r["ideal_speedup"] > 2.5
    assert r["hbm_floor_s"] > 0
    assert hbm_bandwidth() > 1e11


def test_event_log(tmp_path):
    path = str(tmp_path / "events.jsonl")
    log = EventLog(path=path)
    log.emit("quantize_start", model="tiny", nbits=4)
    log.emit("quantize_done", seconds=1.5)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[0]["event"] == "quantize_start" and lines[0]["nbits"] == 4


def test_debug_numerics_catches_nan():
    import pytest as _pytest

    from hqq_tpu.utils.profiling import debug_numerics

    with debug_numerics():
        with _pytest.raises(FloatingPointError):
            jax.block_until_ready(jnp.log(jnp.zeros(4)) * 0 / 0)
    # config restored
    assert not jax.config.jax_debug_nans
