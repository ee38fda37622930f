"""Gaussian-sharded rendering/training: ring exchange of projected-splat
shards around pixel-tile owners.

SURVEY.md §2.3 / §5: ring-attention's moral equivalent for a rasterizer is a
ring-style exchange of Gaussian shards around pixel-tile owners. Here the
Gaussian parameter arrays (and their Adam moments) live SHARDED over the
'tile' mesh axis — per-device parameter + optimizer memory is N/S — and a
`lax.scan` of `ppermute` steps walks every shard's PROJECTED splats around
the ring (projection itself runs only on the owning device, so the O(N)
vertex work is sharded too). Projected splats are 12 f32 per gaussian vs up
to 59 for raw SH-degree-3 parameters, so the ring moves ~5× fewer bytes
than exchanging raw parameters, and XLA's latency-hiding scheduler can
overlap each hop with the previous block's key-building work.

Because `ppermute` has an exact transpose (the reversed ring), the whole
exchange is differentiable: each device's loss cotangents flow backward
around the ring and accumulate at each shard's home device, which is
exactly the gradient reduce-scatter the sharded optimizer needs — no
explicit `psum` over 'tile' for parameter gradients.

Honest scaling notes (round 2):
  * compositing compute is sharded by tile ownership (strided deal, the
    static load balancer), projection by gaussian ownership;
  * the binning SORT still runs over the full N·d slot array on every
    device — pair-level streaming through the ring (sorting only owned
    tiles' pairs per hop) is the follow-up that makes the sort scale;
  * transient render activations are O(N) per device; the O(N/S) win is
    parameters + optimizer state, which is what bounds trainable scene
    size (params + 2 Adam moments = 3× model memory).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..core.types import CameraParams, GaussianCloud
from ..models.gaussian_model import GaussianModel
from ..ops.projection import project_gaussians
from ..ops.rasterize import assemble_image, composite_tiles_auto
from ..train.loss import photometric_loss
from ..train.trainer import TrainState
from .mesh import AXES
from .render_sharded import _padded_tile_ids


def ring_all_gather(tree, axis: str, n_shards: int):
    """Reassemble full arrays from per-device shards with an explicit
    ppermute ring (the collective all_gather would lower to on ICI, but
    written as a scan so each hop can overlap downstream per-block work,
    and so its transpose — the cotangent ring — is explicit).

    Every leaf [n_s, ...] → [S·n_s, ...] in global shard order, identical
    on all devices of `axis`."""
    my = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def step(blk, _):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis, perm), blk
        ), blk

    _, blocks = jax.lax.scan(step, tree, None, length=n_shards)
    # at step k this device held the block that originated at shard
    # (my - k) mod S; reorder stacked blocks into global order 0..S-1
    k_of_src = jnp.mod(my - jnp.arange(n_shards), n_shards)
    return jax.tree_util.tree_map(
        lambda b: b[k_of_src].reshape((-1,) + b.shape[2:]), blocks
    )


def shard_model(model: GaussianModel, mesh: Mesh) -> GaussianModel:
    """Place a model with its leading (gaussian) axis sharded over 'tile'.
    N must divide the axis size (pad with dead gaussians upstream if not)."""
    s = mesh.shape[AXES.tile]
    n = model.num_gaussians
    if n % s:
        raise ValueError(f"N={n} not divisible by tile axis {s}")
    sharding = NamedSharding(mesh, P(AXES.tile))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), model
    )


def render_gaussian_sharded(
    cloud: GaussianCloud,
    camera: CameraParams,
    width: int,
    height: int,
    mesh: Mesh,
    config: RenderConfig = RenderConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward render with the GAUSSIANS sharded over 'tile' (each device
    also owns a strided strip of tiles). Returns (rgb, alpha), replicated.
    """
    gx, gy = config.grid_size(width, height)
    num_tiles = gx * gy
    s = mesh.shape[AXES.tile]
    tile_ids, per = _padded_tile_ids(num_tiles, s, config.tile_chunk)
    mesh_platform = mesh.devices.flat[0].platform

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXES.tile), P(), P(AXES.tile)),
        out_specs=P(),
        check_vma=False,
    )
    def run(cloud_shard, camera, my_tiles):
        splats_shard = project_gaussians(
            cloud_shard, camera, width, height, config
        )
        splats = ring_all_gather(splats_shard, AXES.tile, s)
        local = composite_tiles_auto(
            splats, my_tiles, width, height, config, gx,
            platform=mesh_platform)
        return jax.lax.all_gather(local, AXES.tile, tiled=True)

    gathered = run(cloud, camera, tile_ids)
    ts = config.tile_size
    dealt = gathered.reshape(s, per, ts, ts, 4)
    row_major = dealt.transpose(1, 0, 2, 3, 4).reshape(-1, ts, ts, 4)
    img = assemble_image(row_major, width, height, gx, gy)
    return img[..., :3], img[..., 3]


def make_gaussian_sharded_train_step(
    optimizer: optax.GradientTransformation,
    width: int,
    height: int,
    mesh: Mesh,
    config: RenderConfig = RenderConfig(),
    lambda_dssim: float = 0.2,
    active_sh_degree: Optional[int] = None,
):
    """Sharded-parameter training step (BASELINE.md config 5).

    Signature: (state, cameras, targets) → (state, loss). `state.params`
    leaves are sharded P('tile') on the gaussian axis (see shard_model);
    the optimizer state inherits that sharding, so parameter + moment
    memory per device is N/S. Parameter gradients arrive PRE-SHARDED from
    the ring transpose; only the loss and the 'data'-axis mean use
    collectives.
    """
    gx, gy = config.grid_size(width, height)
    num_tiles = gx * gy
    n_tile = mesh.shape[AXES.tile]
    n_data = mesh.shape[AXES.data]
    tile_ids, per = _padded_tile_ids(num_tiles, n_tile, config.tile_chunk)
    ts = config.tile_size
    mesh_platform = mesh.devices.flat[0].platform
    del n_data

    def local_loss(params_shard: GaussianModel, cameras, targets, my_tiles):
        cloud_shard = params_shard.to_cloud(active_sh_degree)

        def one_cam(camera, target):
            splats_shard = project_gaussians(
                cloud_shard, camera, width, height, config
            )
            splats = ring_all_gather(splats_shard, AXES.tile, n_tile)
            local = composite_tiles_auto(
                splats, my_tiles, width, height, config, gx,
                platform=mesh_platform)
            gathered = jax.lax.all_gather(local, AXES.tile, tiled=True)
            dealt = gathered.reshape(n_tile, per, ts, ts, 4)
            row_major = dealt.transpose(1, 0, 2, 3, 4).reshape(-1, ts, ts, 4)
            out = assemble_image(row_major, width, height, gx, gy)
            bg = jnp.asarray(config.background, dtype=out.dtype)
            img = out[..., :3] + (1.0 - out[..., 3:4]) * bg
            return photometric_loss(img, target, lambda_dssim)

        losses = jax.lax.map(lambda ct: one_cam(ct[0], ct[1]),
                             (cameras, targets))
        return jnp.mean(losses) / n_tile  # pre-scale for the tile psum

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXES.tile), P(AXES.data), P(AXES.data), P(AXES.tile)),
        out_specs=(P(), P(AXES.tile)),
        check_vma=False,
    )
    def grads_shard(params_shard, cameras, targets, my_tiles):
        loss, g = jax.value_and_grad(local_loss)(
            params_shard, cameras, targets, my_tiles
        )
        loss = jax.lax.pmean(jax.lax.psum(loss, AXES.tile), AXES.data)
        # parameter grads are shard-local already (ring transpose); only
        # average over the data-parallel camera batch
        g = jax.lax.pmean(g, AXES.data)
        return loss, g

    @jax.jit
    def step(state: TrainState, cameras: CameraParams, targets: jnp.ndarray):
        loss, grads = grads_shard(state.params, cameras, targets, tile_ids)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    return step


def init_sharded_train_state(
    model: GaussianModel, optimizer, mesh: Mesh
) -> TrainState:
    """TrainState with params AND Adam moments sharded over 'tile'.

    Per-gaussian moment leaves (leading dim == N) get the params' P('tile')
    sharding; scalar state (step counts, schedules) stays replicated."""
    n = model.num_gaussians
    params = shard_model(model, mesh)

    def shd(leaf):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == n:
            return NamedSharding(mesh, P(AXES.tile))
        return NamedSharding(mesh, P())

    abstract = jax.eval_shape(optimizer.init, params)
    opt_state = jax.jit(
        optimizer.init,
        out_shardings=jax.tree_util.tree_map(shd, abstract),
    )(params)
    return TrainState(
        params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32)
    )
