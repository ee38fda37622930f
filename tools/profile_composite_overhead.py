"""Isolate the fused compositor's per-grid-step fixed cost.

Hypothesis: at 1080p/16px tiles there are 8160 grid steps but only ~1.3
slab chunks of real work per tile, so per-step overhead (pipeline
bookkeeping, iota/tri rebuild, DMA setup, while_loop entry) dominates the
~30 ms composite time (pure matmul FLOPs estimate is ~5 ms).

Measures the kernel at the bench scene with (a) real counts, (b) all
counts forced to zero (pure per-step floor), (c) counts clamped to one
chunk. Not part of the library API.
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
from gaussian_splatting_web_tpu.ops.sort import bin_splats
from gaussian_splatting_web_tpu.ops.pallas.raster import (
    KC,
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
    cloud = jax.device_put(bench_lib.make_scene(N))
    camera = jax.device_put(
        cam.default_camera(W, H, eye=np.array([0, 0, -8.0]), center=np.zeros(3))
    )
    splats = jax.jit(lambda c: project_gaussians(c, camera, W, H, config))(cloud)
    bins = jax.jit(lambda s: bin_splats(s, W, H, config))(splats)
    splats, bins = jax.device_put((splats, bins))
    k_cap = k_cap_for(config)
    fields_t = jax.jit(lambda s, b: _sorted_fields_t(s, b, k_cap))(splats, bins)
    fields_t = jax.device_put(fields_t)
    n_pairs = int(bins.num_pairs)
    counts = np.asarray(bins.tile_count)
    log(f"pairs={n_pairs}  tiles={counts.size}  "
        f"chunks={int(np.ceil(counts / KC).sum())}  "
        f"mean count={counts.mean():.0f}  max={counts.max()}")

    def run_with(counts_arr):
        b2 = dataclasses.replace(bins, tile_count=counts_arr)

        def f(carry):
            ft = tuple(f_ + carry * 1e-30 for f_ in fields_t)
            tiles, _, _ = composite_tiles_pallas(
                splats, b2, W, H, config, fields_t=ft
            )
            return jnp.sum(tiles) * 1e-30

        return time_fn_device(f)

    t = run_with(bins.tile_count)
    log(f"composite real counts:   {t*1e3:8.2f} ms")
    t = run_with(jnp.zeros_like(bins.tile_count))
    log(f"composite zero counts:   {t*1e3:8.2f} ms  (per-step floor: "
        f"{t/counts.size*1e6:.2f} us/tile)")
    t = run_with(jnp.minimum(bins.tile_count, KC))
    log(f"composite 1-chunk cap:   {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
