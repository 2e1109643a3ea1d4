"""Device mesh + sharding story.

The reference's only parallelism is single-process ``nn.DataParallel``
(/root/reference/trainBRDF.py:105-109).  Here the whole training step is ONE
XLA SPMD program over a {data, tile} mesh:

  * ``data``: batch dimension (the DataParallel equivalent, but with the
    gradient all-reduce emitted by XLA and overlapped with the backward).
  * ``tile``: the lighting-grid column dimension — the scaling axis of this
    workload (SURVEY.md §5.7): the per-pixel SG shading integral is
    embarrassingly parallel over pixels, so sharding envmap/light tensors
    over ``tile`` splits the hot kernel across chips with zero communication
    until the (psum-ed) loss reductions.

Params are replicated; batches are sharded over ``data`` (and the env
direction tensors additionally over ``tile``).  Losses are global masked
means, so under jit+GSPMD the pixel-count normalization matches single-chip
numerics exactly (XLA inserts the cross-chip sums).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    tile: int = 1,
) -> Mesh:
    """Build a {data, tile} mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // tile
    assert data * tile == n, (data, tile, n)
    arr = np.asarray(devices).reshape(data, tile)
    return Mesh(arr, axis_names=("data", "tile"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, tile_dim: Optional[int] = None):
    """NamedSharding: dim 0 over 'data', optionally tile_dim over 'tile'."""
    spec = [None] * ndim
    spec[0] = "data"
    if tile_dim is not None and ndim > tile_dim:
        spec[tile_dim] = "tile"
    return NamedSharding(mesh, P(*spec))


# Batch keys whose lighting-grid *column* dim should be tile-sharded.
_TILE_DIMS = {"env_gt": 2, "env_pre": 2}


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a batch dict: batch dim over 'data', env cols over 'tile'."""
    out = {}
    for k, v in batch.items():
        tile_dim = _TILE_DIMS.get(k)
        sh = batch_sharding(mesh, v.ndim, tile_dim)
        out[k] = jax.device_put(v, sh)
    return out
