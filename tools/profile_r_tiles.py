"""Sweep R_TILES (tiles per kernel grid step) for the forward and backward
compositor kernels at the bench scene. Run on TPU. Not part of the API."""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gaussian_splatting_web_tpu import bench_lib
from gaussian_splatting_web_tpu.config import RenderConfig
from gaussian_splatting_web_tpu.core import camera as cam
from gaussian_splatting_web_tpu.ops.projection import project_gaussians
from gaussian_splatting_web_tpu.ops.sort import bin_splats
from gaussian_splatting_web_tpu.ops.pallas.raster import (
    composite_tiles_pallas, k_cap_for, _sorted_fields_t,
)
from gaussian_splatting_web_tpu.ops.pallas.raster_bwd import (
    backward_pair_grads,
)
from gaussian_splatting_web_tpu.utils.metrics import (
    enable_compile_cache, time_fn_device,
)

W, H, N = 1920, 1080, 1_000_000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    enable_compile_cache()
    config = RenderConfig()
    cloud = jax.device_put(bench_lib.make_scene(N))
    camera = jax.device_put(
        cam.default_camera(W, H, eye=np.array([0, 0, -8.0]),
                           center=np.zeros(3)))
    splats = jax.jit(
        lambda c: project_gaussians(c, camera, W, H, config))(cloud)
    bins = jax.jit(
        lambda s: bin_splats(s, W, H, config, carry_fields=True))(splats)
    splats, bins = jax.device_put((splats, bins))
    k_cap = k_cap_for(config)
    fields_t = jax.jit(lambda s, b: _sorted_fields_t(s, b, k_cap))(splats, bins)
    fields_t = jax.device_put(fields_t)
    log(f"pairs={int(bins.num_pairs)}")

    for r in (1, 2, 4, 8):
        def fwd(carry, r=r):
            ft = tuple(f + carry * 1e-30 for f in fields_t)
            tiles, _, _ = composite_tiles_pallas(
                splats, bins, W, H, config, fields_t=ft, r_tiles=r)
            return jnp.sum(tiles) * 1e-30

        t = time_fn_device(fwd, iters=6)
        log(f"composite r_tiles={r}: {t*1e3:8.2f} ms")

    tiles, carries, _ = jax.jit(
        lambda s, b, ft: composite_tiles_pallas(
            s, b, W, H, config, fields_t=ft))(splats, bins, fields_t)
    carries = jax.device_put(carries)
    gx, gy = config.grid_size(W, H)
    cot_tiles = jax.device_put(
        jnp.ones((gx * gy, config.tile_size ** 2, 4), jnp.float32))

    for r in (1, 2, 4, 8):
        def bwd(carry, r=r):
            dp = backward_pair_grads(
                tuple(f + carry * 1e-30 for f in fields_t), carries,
                cot_tiles, bins.tile_start, bins.tile_count, W, H, config,
                r_tiles=r)
            return jnp.sum(dp[:, ::997]) * 1e-30

        t = time_fn_device(bwd, iters=4)
        log(f"backward  r_tiles={r}: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
