"""Stage-level TPU profiling for the forward/backward render pipeline.

Times each pipeline stage (project / key-build / sort / searchsorted /
pack-gather / composite kernel / backward kernel / segment-sum) with the
amortized device-loop harness, at the bench configuration (1M splats,
1080p). Prints a table to stderr. Not part of the library API.
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
from gaussian_splatting_web_tpu.ops import rasterize as rz
from gaussian_splatting_web_tpu.ops.projection import project_gaussians
from gaussian_splatting_web_tpu.ops.sort import bin_splats
from gaussian_splatting_web_tpu.ops.pallas.raster import (
    composite_tiles_pallas,
    k_cap_for,
    _sorted_fields_t,
)
from gaussian_splatting_web_tpu.utils.metrics import (
    enable_compile_cache,
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
    log(f"platform={jax.default_backend()}")

    cloud = jax.device_put(bench_lib.make_scene(N))
    camera = jax.device_put(
        cam.default_camera(W, H, eye=np.array([0, 0, -8.0]), center=np.zeros(3))
    )

    def perturb(c, carry):
        return dataclasses.replace(
            c, opacity_logit=c.opacity_logit + carry * 1e-30
        )

    # --- stage 1: project
    t = time_fn_device(
        lambda carry: jnp.sum(
            project_gaussians(perturb(cloud, carry), camera, W, H, config).depth
        ) * 1e-30
    )
    log(f"project:           {t*1e3:8.2f} ms")

    splats = jax.jit(
        lambda c: project_gaussians(c, camera, W, H, config)
    )(cloud)
    splats = jax.device_put(splats)

    def psplat(carry):
        return dataclasses.replace(splats, depth=splats.depth + carry * 1e-30)

    # --- stage 2: bin+sort total
    t = time_fn_device(
        lambda carry: jnp.sum(
            bin_splats(psplat(carry), W, H, config).tile_count.astype(jnp.float32)
        ) * 1e-30
    )
    log(f"bin+sort total:    {t*1e3:8.2f} ms")

    bins = jax.jit(lambda s: bin_splats(s, W, H, config))(splats)
    bins = jax.device_put(bins)
    n_pairs = int(bins.num_pairs)
    m = int(bins.sorted_gidx.shape[0])
    log(f"  live pairs={n_pairs}  M(cap)={m}")

    # --- stage 3: pack gather (at current M)
    k_cap = k_cap_for(config)

    def pgather(carry):
        b2 = dataclasses.replace(
            bins, sorted_gidx=(bins.sorted_gidx + (carry * 1e-30).astype(jnp.int32))
        )
        return jnp.sum(rz.pack_sorted_fields(psplat(0.0), b2, pad=k_cap + 128)) * 1e-30

    t = time_fn_device(pgather)
    log(f"pack gather[{m}x16]: {t*1e3:8.2f} ms")

    # gather at half rows (8 lanes)
    def pgather8(carry):
        packed = jnp.stack(
            [splats.mean2d[:, 0], splats.mean2d[:, 1],
             splats.conic[:, 0], splats.conic[:, 1], splats.conic[:, 2],
             splats.rgb[:, 0], splats.rgb[:, 1],
             splats.opacity + carry * 1e-30], axis=-1)
        return jnp.sum(packed[bins.sorted_gidx]) * 1e-30

    t = time_fn_device(pgather8)
    log(f"pack gather[{m}x8]:  {t*1e3:8.2f} ms")

    # --- stage 4: composite kernel (with fields pre-packed)
    fields_t = jax.jit(
        lambda s, b: _sorted_fields_t(s, b, k_cap)
    )(splats, bins)
    fields_t = jax.device_put(fields_t)

    def comp(carry):
        ft = tuple(f + carry * 1e-30 for f in fields_t)
        tiles, carr, _ = composite_tiles_pallas(
            splats, bins, W, H, config, fields_t=ft
        )
        return jnp.sum(tiles) * 1e-30

    t = time_fn_device(comp)
    log(f"composite kernel:  {t*1e3:8.2f} ms")

    # --- backward pieces
    tiles, carries, _ = jax.jit(
        lambda s, b, ft: composite_tiles_pallas(s, b, W, H, config, fields_t=ft)
    )(splats, bins, fields_t)
    carries = jax.device_put(carries)

    from gaussian_splatting_web_tpu.ops.pallas.raster_bwd import (
        backward_pair_grads,
    )

    gx, gy = config.grid_size(W, H)
    cot_tiles = jnp.ones((gx * gy, config.tile_size**2, 4), jnp.float32)

    def bwd(carry):
        dp = backward_pair_grads(
            tuple(f + carry * 1e-30 for f in fields_t), carries, cot_tiles,
            bins.tile_start, bins.tile_count, W, H, config,
        )
        return jnp.sum(dp[:, ::997]) * 1e-30

    t = time_fn_device(bwd, iters=4)
    log(f"backward kernel:   {t*1e3:8.2f} ms")

    dpairs = jax.jit(
        lambda ft: backward_pair_grads(
            ft, carries, cot_tiles, bins.tile_start, bins.tile_count,
            W, H, config)
    )(fields_t)
    dpairs = jax.device_put(dpairs)

    def segsum(carry):
        rows = (dpairs[:9, :m] + carry * 1e-30).T
        return jnp.sum(
            jax.ops.segment_sum(rows, bins.sorted_gidx, num_segments=N)
        ) * 1e-30

    t = time_fn_device(segsum, iters=4)
    log(f"segment_sum:       {t*1e3:8.2f} ms")

    # alternative: unsort via a second sort (invert the permutation), then
    # reshape-sum over slots
    def unsort_gather(carry):
        pos = jnp.arange(m, dtype=jnp.int32)
        # key: gaussian id; payload: position in sorted order
        _, inv = jax.lax.sort(
            (bins.sorted_gidx.astype(jnp.uint32), pos), num_keys=1
        )
        rows = (dpairs[:9, :m] + carry * 1e-30).T
        g = rows[inv]
        return jnp.sum(g) * 1e-30

    t = time_fn_device(unsort_gather, iters=4)
    log(f"sort+gather alt:   {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
