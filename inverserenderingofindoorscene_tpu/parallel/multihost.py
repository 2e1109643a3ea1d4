"""Multi-host initialization and per-host data sharding.

The reference has no multi-node story (single-process DataParallel,
SURVEY.md §5.8). Here multi-host runs are standard JAX SPMD: every host
runs the same program, `jax.distributed.initialize` wires the cluster,
the {data, tile} mesh spans all chips (data-parallel groups ride DCN
across hosts, tile stays within a slice on ICI), and each host feeds only
its local shard of the batch through
`jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Wire up the cluster. No-ops on a single process.

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly only for CPU/GPU clusters."""
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise


def initialize_cpu_cluster(coordinator: str, num_processes: int,
                           process_id: int, local_devices: int = 4,
                           collectives: str = "gloo") -> None:
    """Wire a multi-PROCESS CPU cluster — the no-pod validation path.

    Gives this process the same world a real pod run gets from
    ``initialize()``: ``num_processes`` cooperating processes with
    ``local_devices`` devices each (``jax.process_index() == process_id``,
    ``len(jax.devices()) == num_processes * local_devices``), with
    cross-process collectives over gloo standing in for DCN. Must run
    before the JAX backend initializes; forces the platform to cpu (the
    container's sitecustomize pins the single-chip axon TPU backend).

    Used by tests/test_multiprocess.py to execute the training step as a
    genuine multi-process SPMD program — each process feeding only its
    ``local_batch_slice`` through ``global_batch_from_local`` — rather
    than the single-process 8-virtual-device mesh the rest of the suite
    uses."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    jax.config.update("jax_cpu_collectives_implementation", collectives)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_batch_from_local(local_batch: dict, mesh: Mesh,
                            tile_dims: Optional[dict] = None) -> dict:
    """Assemble per-host numpy shards into global sharded arrays.

    Each host passes the slice of the global batch it loaded (global batch
    size = per_host_batch * num_hosts, split over dim 0). ``tile_dims``
    optionally maps keys to the dim sharded over the 'tile' axis
    (e.g. {'env_gt': 2})."""
    tile_dims = tile_dims or {}
    out = {}
    for k, v in local_batch.items():
        spec = [None] * v.ndim
        spec[0] = "data"
        td = tile_dims.get(k)
        if td is not None:
            spec[td] = "tile"
        sharding = NamedSharding(mesh, P(*spec))
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out


def local_batch_slice(host_index: int, num_hosts: int, global_batch: int):
    """Which rows of the global batch this host should load."""
    per_host = global_batch // num_hosts
    start = host_index * per_host
    return start, start + per_host
