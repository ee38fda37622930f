"""Measure the effect of Morton-ordering the cloud on gather + forward time.

Same compiled programs as bench/profile_stages (data-only change).
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
from gaussian_splatting_web_tpu.ops.rasterize import render_impl
from gaussian_splatting_web_tpu.ops.sort import bin_splats
from gaussian_splatting_web_tpu.utils.metrics import (
    enable_compile_cache,
    time_fn,
    time_fn_device,
)

W, H, N = 1920, 1080, 1_000_000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    enable_compile_cache()
    config = RenderConfig(
        max_dup=16, max_per_tile=1024, tile_chunk=32, depth_bits=19,
        tier_split=4, big_frac=1.0 / 16, gather_cap_factor=3.0,
    )
    camera = jax.device_put(
        cam.default_camera(W, H, eye=np.array([0, 0, -8.0]), center=np.zeros(3))
    )

    for label, sort in (("unsorted", False), ("morton", True)):
        cloud = bench_lib.make_scene(N)
        if sort:
            cloud = cloud.spatial_sort()
        cloud = jax.device_put(cloud)
        splats = jax.jit(
            lambda c: project_gaussians(c, camera, W, H, config)
        )(cloud)
        bins = jax.jit(lambda s: bin_splats(s, W, H, config))(splats)
        splats, bins = jax.device_put((splats, bins))

        def pgather8(carry):
            packed = jnp.stack(
                [splats.mean2d[:, 0], splats.mean2d[:, 1],
                 splats.conic[:, 0], splats.conic[:, 1], splats.conic[:, 2],
                 splats.rgb[:, 0], splats.rgb[:, 1],
                 splats.opacity + carry * 1e-30], axis=-1)
            return jnp.sum(packed[bins.sorted_gidx]) * 1e-30

        t = time_fn_device(pgather8)
        log(f"{label}: gather[3Mx8]  {t*1e3:8.2f} ms")

        def perturbed(c):
            return dataclasses.replace(
                cloud, opacity_logit=cloud.opacity_logit + c * 1e-30
            )

        floor = time_fn(jax.jit(lambda x: x + 1.0), jnp.float32(0.0),
                        iters=6, warmup=2)
        fwd_fn = jax.jit(
            lambda c: jnp.sum(
                render_impl(perturbed(c), camera, W, H, config)[0]
            )
        )
        t = max(time_fn(fwd_fn, jnp.float32(0.0), iters=8, warmup=2) - floor,
                1e-6)
        log(f"{label}: forward       {t*1e3:8.2f} ms  "
            f"({W*H/t/1e6:.1f} Mpix/s)")


if __name__ == "__main__":
    main()
