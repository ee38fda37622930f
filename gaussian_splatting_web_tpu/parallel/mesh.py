"""Device mesh construction.

The reference is a single-browser-process, single-GPUDevice app
(gpu_context.ts:12-26) — it has no distribution at all (SURVEY.md §2.3).
This module is the new capability: a 2D logical mesh

    ('data', 'tile')

where 'data' shards the camera batch (data parallelism over views) and
'tile' shards image tiles within a view (the TPU analogue of the reference's
per-pixel fragment-shader parallelism, i.e. context/sequence parallelism for
a rasterizer). Gaussians are replicated in round 1; parameter gradients are
psum-reduced over both axes.

Collectives ride ICI inside a host and DCN across hosts; keeping 'tile' the
minor (fast-varying) axis places tile exchange on ICI neighbors.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    tile: str = "tile"


AXES = MeshAxes()


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    tile: Optional[int] = None,
) -> Mesh:
    """Build a ('data', 'tile') mesh over the given (default: all) devices.

    With neither axis size given, all devices go to 'tile' (maximize pixel
    parallelism for single-view interactive rendering); pass data=… for
    multi-view training.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and tile is None:
        data, tile = 1, n
    elif data is None:
        data = n // tile
    elif tile is None:
        tile = n // data
    if data * tile != n:
        raise ValueError(f"mesh {data}x{tile} != {n} devices")
    arr = np.asarray(devices).reshape(data, tile)
    return Mesh(arr, (AXES.data, AXES.tile))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tile_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (tile-chunk) axis across the 'tile' mesh axis."""
    return NamedSharding(mesh, P(AXES.tile))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (camera-batch) axis across 'data'."""
    return NamedSharding(mesh, P(AXES.data))
