"""Cumulative stage timing of the full forward pipeline at the bench scene.

The round-2 bench measured forward=108.7 ms while the composite kernel alone
times at 25.6 ms and bin+sort at 21 ms — ~60 ms is hiding in the glue
(project, payload assembly, grouping permute, assemble). Each step below
times a jitted program that runs the pipeline UP TO stage k, so
differences are attributable per stage. Run on TPU. Not library API.
"""

from __future__ import annotations

import dataclasses
import sys

import jax.numpy as _jnp_go


def _grouping_order(bins):
    # count-sorted grouping order (was a raster.py helper; the library
    # removed it after measuring no kernel win — kept here so this
    # harness can still reproduce that measurement)
    return _jnp_go.argsort(-bins.tile_count).astype(_jnp_go.int32)


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
    KC, _sorted_fields_t, composite_tiles_pallas, k_cap_for,
)
from gaussian_splatting_web_tpu.ops.rasterize import assemble_image
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
    k_cap = k_cap_for(config)
    ts = config.tile_size
    gx, gy = config.grid_size(W, H)

    def perturbed(c):
        return dataclasses.replace(cloud, xyz=cloud.xyz + c * 1e-30)

    def upto_project(c):
        s = project_gaussians(perturbed(c), camera, W, H, config)
        return jnp.sum(s.depth) * 1e-30

    def upto_bin(c):
        s = project_gaussians(perturbed(c), camera, W, H, config)
        b = bin_splats(s, W, H, config, carry_fields=True)
        return jnp.sum(b.tile_count.astype(jnp.float32)) * 1e-30

    def upto_fields(c):
        s = project_gaussians(perturbed(c), camera, W, H, config)
        b = bin_splats(s, W, H, config, carry_fields=True)
        ft = _sorted_fields_t(s, b, k_cap)
        return (jnp.sum(ft[0][:, ::1013]) + jnp.sum(b.tile_start)) * 1e-30

    def upto_comp_rowmajor(c):
        s = project_gaussians(perturbed(c), camera, W, H, config)
        b = bin_splats(s, W, H, config, carry_fields=True)
        tiles, carr, _ = composite_tiles_pallas(s, b, W, H, config)
        return jnp.sum(tiles) * 1e-30

    def upto_comp_bycount(c):
        s = project_gaussians(perturbed(c), camera, W, H, config)
        b = bin_splats(s, W, H, config, carry_fields=True)
        order = _grouping_order(b)
        tiles, carr, _ = composite_tiles_pallas(
            s, b, W, H, config, tile_ids=order)
        return jnp.sum(tiles) * 1e-30

    def full_bycount(c):
        s = project_gaussians(perturbed(c), camera, W, H, config)
        b = bin_splats(s, W, H, config, carry_fields=True)
        order = _grouping_order(b)
        tiles, carr, _ = composite_tiles_pallas(
            s, b, W, H, config, tile_ids=order)
        inv = jnp.argsort(order)
        out = assemble_image(
            tiles[inv].reshape(-1, ts, ts, 4), W, H, gx, gy)
        return jnp.sum(out) * 1e-30

    def full_rowmajor(c):
        s = project_gaussians(perturbed(c), camera, W, H, config)
        b = bin_splats(s, W, H, config, carry_fields=True)
        tiles, carr, _ = composite_tiles_pallas(s, b, W, H, config)
        out = assemble_image(tiles.reshape(-1, ts, ts, 4), W, H, gx, gy)
        return jnp.sum(out) * 1e-30

    for name, f in (
        ("project", upto_project),
        ("+bin/sort", upto_bin),
        ("+fields_t", upto_fields),
        ("+composite(rowmajor)", upto_comp_rowmajor),
        ("+composite(bycount)", upto_comp_bycount),
        ("full(rowmajor)", full_rowmajor),
        ("full(bycount)", full_bycount),
    ):
        t = time_fn_device(f, iters=6)
        log(f"{name:24s} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
