"""Tile-sharded forward rendering with shard_map.

Pixel tiles are the unit of parallelism — the multi-chip generalization of
the reference's fragment-shader parallelism (SURVEY.md §2.3). Projection and
binning are O(N) vector maps and are computed replicated in round 1 (cheap
relative to compositing); each device composites only the tiles it owns and
the image is assembled with an `all_gather` over the 'tile' axis.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import RenderConfig
from ..core.types import CameraParams, GaussianCloud
from ..ops.projection import project_gaussians
from ..ops.rasterize import assemble_image, composite_tiles_auto
from .mesh import AXES


def _padded_tile_ids(num_tiles: int, n_shards: int, chunk: int):
    """Tile ids padded so each shard gets an equal, chunk-aligned strip.

    Tiles are dealt round-robin (strided) across shards rather than in
    contiguous strips: splats cluster spatially, and striding is the cheap
    static load-balancer (SURVEY.md §7 "Load balance")."""
    per = -(-num_tiles // n_shards)
    per = -(-per // chunk) * chunk
    total = per * n_shards
    ids = jnp.arange(total, dtype=jnp.int32) % num_tiles
    # strided deal: shard s gets ids [s], [s+n], [s+2n] ... then re-flatten
    return ids.reshape(per, n_shards).T.reshape(-1), per


def render_sharded(
    cloud: GaussianCloud,
    camera: CameraParams,
    width: int,
    height: int,
    mesh: Mesh,
    config: RenderConfig = RenderConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward render with tiles sharded over the mesh's 'tile' axis.

    Returns (rgb [H, W, 3], alpha [H, W]), replicated.
    """
    gx, gy = config.grid_size(width, height)
    num_tiles = gx * gy
    n_shards = mesh.shape[AXES.tile]
    tile_ids, per = _padded_tile_ids(num_tiles, n_shards, config.tile_chunk)
    mesh_platform = mesh.devices.flat[0].platform

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(AXES.tile)),
        out_specs=P(),
        check_vma=False,
    )
    def run(cloud, camera, my_tiles):
        splats = project_gaussians(cloud, camera, width, height, config)
        local = composite_tiles_auto(
            splats, my_tiles, width, height, config, gx,
            platform=mesh_platform,
        )                                                            # [per, ts, ts, 4]
        return jax.lax.all_gather(local, AXES.tile, tiled=True)      # [per·S, ...]

    gathered = run(cloud, camera, tile_ids)
    # gathered is in dealt order: shard-major [s, k] ↔ tile id (k*S + s) % T
    ts = config.tile_size
    dealt = gathered.reshape(n_shards, per, ts, ts, 4)
    row_major = dealt.transpose(1, 0, 2, 3, 4).reshape(-1, ts, ts, 4)
    img = assemble_image(row_major, width, height, gx, gy)
    return img[..., :3], img[..., 3]
