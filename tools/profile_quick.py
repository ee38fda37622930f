"""Quick stage-level TPU profile using single-program timings with the
dispatch floor subtracted (same harness as bench_lib — the device-loop
variant costs multi-minute remote compiles per stage).

Stages: project / bin+sort / composite fwd (incl. bin) / full fwd /
backward-only (grad - fwd) / backward kernel / fold.
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
    time_fn,
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
    log(f"platform={jax.default_backend()}")

    cloud = jax.device_put(bench_lib.make_scene(N))
    camera = jax.device_put(
        cam.default_camera(W, H, eye=np.array([0, 0, -8.0]),
                           center=np.zeros(3))
    )

    floor = time_fn(jax.jit(lambda x: x + 1.0), jnp.float32(0.0),
                    iters=8, warmup=2)
    log(f"dispatch floor:    {floor*1e3:8.2f} ms")

    def pc(c):
        return dataclasses.replace(
            cloud, opacity_logit=cloud.opacity_logit + c * 1e-30
        )

    # project
    t = time_fn(
        jax.jit(lambda c: jnp.sum(
            project_gaussians(pc(c), camera, W, H, config).depth)),
        jnp.float32(0.0), iters=8, warmup=2,
    ) - floor
    log(f"project:           {t*1e3:8.2f} ms")

    splats = jax.jit(lambda c: project_gaussians(c, camera, W, H, config))(
        cloud)
    splats = jax.device_put(splats)

    def ps(c):
        return dataclasses.replace(splats, depth=splats.depth + c * 1e-30)

    # bin+sort (no field payloads)
    t = time_fn(
        jax.jit(lambda c: jnp.sum(
            bin_splats(ps(c), W, H, config).tile_count.astype(jnp.float32))),
        jnp.float32(0.0), iters=8, warmup=2,
    ) - floor
    log(f"bin+sort:          {t*1e3:8.2f} ms")

    # bin+sort with carry_fields
    t = time_fn(
        jax.jit(lambda c: jnp.sum(
            bin_splats(ps(c), W, H, config, carry_fields=True)
            .tile_count.astype(jnp.float32))),
        jnp.float32(0.0), iters=8, warmup=2,
    ) - floor
    log(f"bin+sort+fields:   {t*1e3:8.2f} ms")

    # composite kernel only (bins + fields precomputed)
    bins = jax.jit(
        lambda s: bin_splats(s, W, H, config, carry_fields=True)
    )(splats)
    bins = jax.device_put(bins)
    k_cap = pr.k_cap_for(config)
    fields_t = jax.jit(
        lambda b: pr._sorted_fields_t(None, b, k_cap)
    )(bins)
    fields_t = jax.device_put(fields_t)

    def comp_only(c):
        f8 = fields_t[0] + c * 1e-30
        tiles, carries, _ = pr.composite_tiles_pallas(
            splats, bins, W, H, config, fields_t=(f8, fields_t[1]))
        return jnp.sum(tiles) * 1e-30 + jnp.sum(carries[:, 0, 0]) * 1e-30

    t = time_fn(jax.jit(comp_only), jnp.float32(0.0), iters=8, warmup=2) - floor
    log(f"composite kernel:  {t*1e3:8.2f} ms")

    # full forward
    fwd = jax.jit(lambda c: jnp.sum(render_impl(pc(c), camera, W, H, config)[0]))
    tf = time_fn(fwd, jnp.float32(0.0), iters=8, warmup=2) - floor
    log(f"full forward:      {tf*1e3:8.2f} ms")

    # full fwd+bwd
    def loss(c):
        img, _ = render_impl(pc(c), camera, W, H, config)
        return jnp.sum(img)

    tg = time_fn(jax.jit(jax.grad(loss)), jnp.float32(0.0),
                 iters=6, warmup=2) - floor
    log(f"fwd+bwd:           {tg*1e3:8.2f} ms  (bwd-only ≈ {(tg-tf)*1e3:.2f})")

    # backward kernel only
    from gaussian_splatting_web_tpu.ops.pallas.raster_bwd import (
        backward_pair_grads,
    )

    gx, gy = config.grid_size(W, H)
    cot = jnp.ones((gx * gy, config.tile_size**2, 4), jnp.float32)
    _, carries, _ = jax.jit(
        lambda: pr.composite_tiles_pallas(
            splats, bins, W, H, config, fields_t=fields_t)
    )()
    carries = jax.device_put(carries)

    def bwdk(c):
        f8 = fields_t[0] + c * 1e-30
        dp = backward_pair_grads(
            (f8, fields_t[1]), carries, cot, bins.tile_start,
            bins.tile_count, W, H, config)
        return jnp.sum(dp[:, ::137]) * 1e-30

    t = time_fn(jax.jit(bwdk), jnp.float32(0.0), iters=6, warmup=2) - floor
    log(f"backward kernel:   {t*1e3:8.2f} ms")

    # fold only
    m_pad = fields_t[0].shape[1]
    dpairs = jnp.ones((pr.F_PAD, m_pad), jnp.float32)

    def fold(c):
        seg = pr._fold_pair_grads(dpairs + c * 1e-30, bins, N)
        return jnp.sum(seg) * 1e-30

    t = time_fn(jax.jit(fold), jnp.float32(0.0), iters=6, warmup=2) - floor
    log(f"pair-grad fold:    {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
