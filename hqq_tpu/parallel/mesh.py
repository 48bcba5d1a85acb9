# SPDX-License-Identifier: Apache-2.0
"""Device mesh helpers.

The reference has no communication backend of its own (SURVEY §2.9: it
delegates TP to vLLM/NCCL and uses naive `.to(device)` block placement,
`/root/reference/hqq/models/base.py:307-394`). The TPU framework owns this
natively: a `jax.sharding.Mesh` over ICI (and DCN for multi-slice), with

  * "data"  axis — batch/data parallelism
  * "model" axis — tensor parallelism (column/row-parallel linears, sharded
    KV heads)

Training uses GSPMD (jit + NamedSharding) so collectives and gradient
reductions are derived automatically; the serving hot path uses `shard_map`
with explicit psums over kernel-layout weights (see `parallel/tp.py`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_hybrid_mesh", "local_mesh", "init_multihost",
           "P", "NamedSharding"]


def make_mesh(
    data: int = 1,
    model: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_names: tuple = ("data", "model"),
) -> Mesh:
    """Create a 2-D (data, model) mesh. model=None uses all remaining devices.

    Multi-host: call `jax.distributed.initialize()` first; `jax.devices()`
    then spans the full slice and the mesh rides ICI within a slice / DCN
    across slices (put "data" on the outer/DCN dimension).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model is None:
        assert n % data == 0, f"{n} devices not divisible by data={data}"
        model = n // data
    assert data * model <= n, f"mesh {data}x{model} needs more than {n} devices"
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names)


def make_hybrid_mesh(
    dcn: int = 1,
    data: int = 1,
    model: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_names: tuple = ("dcn", "data", "model"),
) -> Mesh:
    """Hierarchical DCN x ICI mesh: the outer ``dcn`` axis strides across
    host/process granules (collectives over it ride the data-center network),
    the inner ``data``/``model`` axes stay within a granule (ICI). The
    idiomatic scale-out geometry is DP-over-dcn x TP-over-ici: weight-heavy
    all-reduces never leave a slice, only the (small) gradient/data exchange
    crosses DCN (scaling-book recipe; the reference has no comm story at
    all — SURVEY §5.8).

    Placement is guaranteed, not hoped for: devices are ordered by
    (process_index, device id) and the dcn axis is the outermost reshape
    dimension, so every (data, model) sub-grid is contained in one process
    granule whenever ``dcn`` divides ``process_count``. On a single process
    (CPU-virtual testing) the granules are contiguous device blocks.
    """
    devices = list(devices if devices is not None else jax.devices())
    devices.sort(key=lambda d: (d.process_index, d.id))
    n = len(devices)
    if model is None:
        assert n % (dcn * data) == 0, (n, dcn, data)
        model = n // (dcn * data)
    need = dcn * data * model
    assert need <= n, f"mesh {dcn}x{data}x{model} needs more than {n} devices"
    nproc = max(jax.process_count(), 1)
    if nproc > 1:
        assert nproc % dcn == 0, (
            f"dcn={dcn} must divide process_count={nproc} so inner axes stay "
            f"on ICI"
        )
    arr = np.asarray(devices[:need]).reshape(dcn, data, model)
    return Mesh(arr, axis_names)


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX (one process per host of a TPU slice).

    On Cloud TPU the arguments auto-detect from the metadata server; set them
    explicitly elsewhere. After this, `jax.devices()` spans the whole slice
    and `make_mesh` builds pod-wide meshes (collectives ride ICI within a
    slice, DCN across slices). Returns the process index. Safe to call twice.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return jax.process_index()


def local_mesh(model: Optional[int] = None, data: int = 1) -> Mesh:
    """Mesh over this process's addressable devices only."""
    return make_mesh(data=data, model=model, devices=jax.local_devices())
