"""Round-3 kernel variant timing: the rewritten forward/backward kernels
(final-carry outputs, reconstruction backward, pure-store pair grads) at
the 1M/1080p bench, sweeping EARLY_EXIT and R_TILES_BWD. Run on TPU after
the rewrite; not library API."""

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
from gaussian_splatting_web_tpu.ops.pallas import raster, raster_bwd
from gaussian_splatting_web_tpu.ops.pallas.raster import (
    _sorted_fields_t, composite_tiles_pallas, k_cap_for,
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
    k_cap = k_cap_for(config)
    fields_t = jax.jit(
        lambda s, b: _sorted_fields_t(s, b, k_cap, quantize=True)
    )(splats, bins)
    splats, bins, fields_t = jax.device_put((splats, bins, fields_t))
    gx, gy = config.grid_size(W, H)
    p = config.tile_size ** 2

    def pert_fields(c):
        return tuple(
            x ^ jnp.uint32(0) if x.dtype == jnp.uint32 else x + c * 1e-30
            for x in fields_t)

    # ---- forward kernel: early-exit while vs fixed fori -------------------
    for ee in (True, False):
        cfg_ee = config.replace(early_exit=ee)

        def fwd(c, cfg_ee=cfg_ee):
            tiles, fin, _ = composite_tiles_pallas(
                splats, bins, W, H, cfg_ee, fields_t=pert_fields(c))
            return (jnp.sum(tiles) + jnp.sum(fin[..., 0])) * 1e-30 + c * 1e-30

        t = time_fn_device(fwd, iters=6)
        log(f"fwd kernel early_exit={ee}: {t*1e3:8.2f} ms")

    # ---- backward kernel: R_TILES_BWD sweep ------------------------------
    tiles, fin, _ = jax.jit(
        lambda s, b, f: composite_tiles_pallas(s, b, W, H, config,
                                               fields_t=f)
    )(splats, bins, fields_t)
    fin = jax.device_put(fin)
    rng = np.random.default_rng(0)
    cot = jax.device_put(
        rng.normal(size=(gx * gy, p, 4)).astype(np.float32) * 0.01)

    for r in (1, 2, 4):
        def bwd(c, r=r):
            dp = raster_bwd.backward_pair_grads(
                pert_fields(c), fin + c * 1e-30, cot, bins.tile_start,
                bins.tile_count, W, H, config, r_tiles=r)
            return jnp.sum(dp) * 1e-30 + c * 1e-30

        try:
            t = time_fn_device(bwd, iters=6)
            log(f"bwd kernel r_tiles={r}: {t*1e3:8.2f} ms")
        except Exception as e:
            log(f"bwd kernel r_tiles={r}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
