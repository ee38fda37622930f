"""Round-2 decision measurements (bench scene: 1M splats, 1080p, v5e).

 1. bin+sort with carry_fields=True vs False (settles whether the 9 field
    payloads cost ~55 ms or are free, as conflicting round-1 notes claim).
 2. lax.sort payload scaling at n_slots.
 3. footprint (tiles-per-splat) histogram → tier sizing.
 4. _fold_pair_grads (the backward's sort-inverting fold) in isolation.
Not part of the library API.
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
from gaussian_splatting_web_tpu.ops.sort import bin_splats, _footprints
from gaussian_splatting_web_tpu.ops.pallas.raster import (
    F_PAD, KC, _fold_pair_grads, k_cap_for,
)
from gaussian_splatting_web_tpu.utils.metrics import (
    enable_compile_cache, time_fn_device,
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
    splats = jax.device_put(splats)

    def psplat(carry):
        return dataclasses.replace(splats, depth=splats.depth + carry * 1e-30)

    # --- 3. footprint histogram -----------------------------------------
    x0, y0, rw, rh = jax.jit(
        lambda s: _footprints(s, W, H, config))(splats)
    ntg = np.asarray(rw) * np.asarray(rh)
    hist = np.bincount(np.minimum(ntg, 20), minlength=21)
    log(f"footprint histogram (tiles/splat, 20=20+): {hist.tolist()}")
    log(f"  live pairs={int(ntg.clip(max=16).sum())} "
        f"sum(ntg>4)*16={int((ntg > 4).sum()) * 16}")
    for da in (1, 2, 4, 6, 8):
        n_big = int((ntg > da).sum())
        log(f"  d_a={da}: tierA slots={N*da/1e6:.1f}M  big={n_big} "
            f"(x16 => {n_big*16/1e6:.2f}M slots)")

    # --- 1. bin+sort with/without field payloads ------------------------
    for cf in (False, True):
        t = time_fn_device(
            lambda carry, cf=cf: jnp.sum(
                bin_splats(psplat(carry), W, H, config, carry_fields=cf)
                .tile_count.astype(jnp.float32)) * 1e-30
        )
        log(f"bin+sort carry_fields={cf}: {t*1e3:8.2f} ms")

    # --- 2. payload scaling ----------------------------------------------
    n_slots = 4 * N + max(min(int(N / 16), N), 256) * 16
    rng = np.random.default_rng(0)
    keys = jax.device_put(rng.integers(0, 2**32, n_slots, dtype=np.uint32))
    pls = [jax.device_put(rng.random(n_slots, dtype=np.float32))
           for _ in range(11)]

    for npay in (1, 2, 3, 5, 8, 11):
        def f(carry, npay=npay):
            k = keys ^ jax.lax.convert_element_type(carry, jnp.uint32)
            out = jax.lax.sort((k,) + tuple(pls[:npay]), num_keys=1)
            return jnp.sum(out[1]) * 1e-30

        t = time_fn_device(f, iters=4)
        log(f"sort 1key+{npay:2d}payloads @ {n_slots}: {t*1e3:8.2f} ms")

    # --- 4. fold in isolation ---------------------------------------------
    bins = jax.jit(lambda s: bin_splats(s, W, H, config))(splats)
    bins = jax.device_put(bins)
    m_pad = int(bins.sorted_gidx.shape[0]) + k_cap_for(config) + KC
    dpairs = jax.device_put(
        rng.random((F_PAD, m_pad), dtype=np.float32))

    def fold(carry):
        return jnp.sum(
            _fold_pair_grads(dpairs + carry * 1e-30, bins, N)) * 1e-30

    t = time_fn_device(fold, iters=4)
    log(f"fold (sort-invert + gathers): {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
