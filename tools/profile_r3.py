"""Round-3 cumulative stage attribution for the full forward pipeline.

BENCH_r02 reported forward=90.6 ms with composite-kernel-only measurements
(tools/kexp2, profile_r_tiles) near 23 ms and bin+sort at 34.8 ms — so up
to ~30 ms may live in glue (payload assembly, pallas_call operand copies,
assemble_image) rather than in the kernel. Each step times a jitted
program running the pipeline UP TO stage k with every intermediate
consumed (sort payloads must be summed or XLA's sort simplifier DCEs
them); differences attribute time per stage. Run on TPU. Not library API.
"""

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
from gaussian_splatting_web_tpu.ops.rasterize import assemble_image, render_impl
from gaussian_splatting_web_tpu.ops.sort import bin_splats
from gaussian_splatting_web_tpu.ops.pallas.raster import (
    KC, _sorted_fields_t, composite_tiles_pallas, k_cap_for,
)
from gaussian_splatting_web_tpu.utils.metrics import (
    enable_compile_cache, time_fn_device,
)

W, H, N = 1920, 1080, 1_000_000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _consume(x):
    if isinstance(x, (tuple, list)):
        return sum(_consume(v) for v in x)
    if x is None:
        return 0.0
    return jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32 else x)


def main():
    enable_compile_cache()
    config = RenderConfig()
    log(f"platform={jax.default_backend()} config=shipped defaults")
    cloud = jax.device_put(bench_lib.make_scene(N))
    camera = jax.device_put(
        cam.default_camera(W, H, eye=np.array([0, 0, -8.0]),
                           center=np.zeros(3)))
    k_cap = k_cap_for(config)

    def perturbed(c):
        return dataclasses.replace(cloud, xyz=cloud.xyz + c * 1e-30)

    def s0_project(c):
        s = project_gaussians(perturbed(c), camera, W, H, config)
        return (_consume((s.mean2d, s.conic, s.depth, s.rgb, s.opacity))
                * 1e-30)

    def s1_bin(c):
        s = project_gaussians(perturbed(c), camera, W, H, config)
        b = bin_splats(s, W, H, config, carry_fields=True)
        return (_consume((b.tile_count, b.sorted_slot))
                + _consume(b.sorted_fields)) * 1e-30

    def s2_fields(c):
        s = project_gaussians(perturbed(c), camera, W, H, config)
        b = bin_splats(s, W, H, config, carry_fields=True)
        ft = _sorted_fields_t(s, b, k_cap, quantize=config.pack_fields)
        return (_consume(ft) + _consume(b.tile_count)) * 1e-30

    def s3_kernel(c):
        s = project_gaussians(perturbed(c), camera, W, H, config)
        b = bin_splats(s, W, H, config, carry_fields=True)
        tiles, carries, _ = composite_tiles_pallas(s, b, W, H, config)
        return _consume(tiles) * 1e-30

    def s4_full(c):
        img, aux = render_impl(perturbed(c), camera, W, H, config)
        return jnp.sum(img) * 1e-30

    stages = [
        ("project", s0_project),
        ("+bin/sort", s1_bin),
        ("+fields_t", s2_fields),
        ("+kernel", s3_kernel),
        ("full fwd", s4_full),
    ]
    prev = 0.0
    for name, fn in stages:
        t = time_fn_device(fn, iters=6)
        log(f"{name:<12s} {t*1e3:8.2f} ms   (delta {max(t-prev,0)*1e3:7.2f} ms)")
        prev = t

    # isolated kernel with pre-staged operands (what kexp2/profile_r_tiles
    # measured) for comparison with the in-pipeline s3-s2 delta
    splats = jax.jit(
        lambda c: project_gaussians(c, camera, W, H, config))(cloud)
    bins = jax.jit(
        lambda s: bin_splats(s, W, H, config, carry_fields=True))(splats)
    fields_t = jax.jit(
        lambda s, b: _sorted_fields_t(s, b, k_cap,
                                      quantize=config.pack_fields)
    )(splats, bins)
    splats, bins, fields_t = jax.device_put((splats, bins, fields_t))

    def k_iso(c):
        ft = tuple(
            (x + jnp.uint32(0) if x.dtype == jnp.uint32 else x + c * 1e-30)
            for x in fields_t)
        tiles, carries, _ = composite_tiles_pallas(
            splats, bins, W, H, config, fields_t=ft)
        return _consume(tiles) * 1e-30 + c * 1e-30

    t = time_fn_device(k_iso, iters=6)
    log(f"{'kernel-iso':<12s} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
