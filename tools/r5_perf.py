"""Round-5 perf harness: stage timings at the SHIPPED RenderConfig
defaults with the on-device fori_loop timer (amortizes the axon relay's
30-90 ms dispatch jitter like bench_lib does).

Usage: python tools/r5_perf.py [stage ...] [r_tiles_bwd=N] [r_tiles=N]
Stages: comp fwd bwd bwdk fold (default: comp fwd bwd)
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
from gaussian_splatting_web_tpu.ops.pallas import raster as pr
from gaussian_splatting_web_tpu.utils.metrics import (
    enable_compile_cache,
    time_fn_device,
)

W, H, N = 1920, 1080, 1_000_000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    enable_compile_cache()
    kw = {}
    stages = []
    for a in sys.argv[1:]:
        if "=" in a:
            k, v = a.split("=")
            kw[k] = int(v)
        else:
            stages.append(a)
    if not stages:
        stages = ["comp", "fwd", "bwd"]
    config = RenderConfig(**kw)
    log(f"platform={jax.default_backend()} config_overrides={kw}")

    cloud = jax.device_put(bench_lib.make_scene(N))
    camera = jax.device_put(
        cam.default_camera(W, H, eye=np.array([0, 0, -8.0]),
                           center=np.zeros(3)))

    splats = jax.jit(
        lambda c: project_gaussians(c, camera, W, H, config))(cloud)
    splats = jax.device_put(splats)
    bins = jax.jit(
        lambda s: bin_splats(s, W, H, config, carry_fields=True))(splats)
    bins = jax.device_put(bins)
    k_cap = pr.k_cap_for(config)
    fields_t = jax.jit(
        lambda b: pr._sorted_fields_t(None, b, k_cap,
                                      quantize=config.pack_fields))(bins)
    fields_t = jax.device_put(fields_t)
    packed = len(fields_t) == 1

    def perturb_f(c):
        if packed:
            # flip no bits but consume the carry: add 0-valued int
            f = (fields_t[0] + (c * 0).astype(jnp.uint32),)
        else:
            f = (fields_t[0] + c * 1e-30, fields_t[1])
        return f

    if "comp" in stages:
        def comp_only(c):
            tiles, fins, _ = pr.composite_tiles_pallas(
                splats, bins, W, H, config, fields_t=perturb_f(c))
            return (jnp.sum(tiles) * 1e-30
                    + jnp.sum(fins[:, 0, 0]) * 1e-30)

        t = time_fn_device(comp_only, iters=8)
        log(f"composite kernel:  {t*1e3:8.2f} ms")

    def pc(c):
        return dataclasses.replace(cloud, xyz=cloud.xyz + c * 1e-30)

    if "fwd" in stages:
        def fwd_body(c):
            img, _ = render_impl(pc(c), camera, W, H, config)
            return jnp.sum(img) * 1e-30

        t = time_fn_device(fwd_body, iters=8)
        log(f"forward total:     {t*1e3:8.2f} ms  "
            f"({W*H/t/1e6:.1f} Mpix/s)")

    if "bwd" in stages:
        def loss(c):
            img, _ = render_impl(pc(c), camera, W, H, config)
            return jnp.sum(img)

        def bwd_body(c):
            return jax.grad(loss)(c) * 1e-30

        t = time_fn_device(bwd_body, iters=6)
        log(f"fwd+bwd total:     {t*1e3:8.2f} ms  "
            f"({W*H/t/1e6:.1f} Mpix/s)")

    if "bwdk" in stages:
        from gaussian_splatting_web_tpu.ops.pallas.raster_bwd import (
            backward_pair_grads,
        )

        gx, gy = config.grid_size(W, H)
        cot = jnp.ones((gx * gy, config.tile_size ** 2, 4), jnp.float32)
        _, fins, _ = jax.jit(
            lambda: pr.composite_tiles_pallas(
                splats, bins, W, H, config, fields_t=fields_t))()
        fins = jax.device_put(fins)

        def bwdk_body(c):
            dp = backward_pair_grads(
                perturb_f(c), fins, cot, bins.tile_start,
                bins.tile_count, W, H, config)
            return jnp.sum(dp[:, ::137]) * 1e-30

        t = time_fn_device(bwdk_body, iters=6)
        log(f"backward kernel:   {t*1e3:8.2f} ms")

    if "fold" in stages:
        m_pad = fields_t[0].shape[1]
        r = config.r_tiles_bwd
        dpairs = jnp.ones((r * pr.F_PAD, m_pad), jnp.float32)

        def fold_body(c):
            seg = pr._fold_pair_grads(dpairs + c * 1e-30, bins, N, config)
            return jnp.sum(seg) * 1e-30

        t = time_fn_device(fold_body, iters=6)
        log(f"pair-grad fold:    {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
