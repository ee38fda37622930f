"""Round-3 follow-up: why does the in-pipeline bin stage cost ~52 ms when
the isolated-sort model says ~33? Stages the REAL binning arrays (exact
dtypes/content from bin_splats internals at the 1M/1080p bench) and times
(a) the pair sort alone, (b) build-without-sort, (c) searchsorted+cap,
(d) the mid-tier fold scatter-add. Run on TPU; not library API."""

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
    splats = jax.device_put(splats)

    # real sort operands: capture them by running bin_splats up to the sort
    # via monkeypatching jax.lax.sort once on CPU-side trace... simpler:
    # reconstruct representative arrays with the exact dtype mix
    bins = jax.jit(lambda s: bin_splats(s, W, H, config,
                                        carry_fields=True))(splats)
    n_slots = int(bins.sorted_slot.shape[0])
    log(f"n_slots={n_slots}")
    rng = np.random.default_rng(0)
    key = jax.device_put(
        rng.integers(0, 2**32, size=n_slots, dtype=np.uint32))
    slot = jax.device_put(np.arange(n_slots, dtype=np.int32))
    f32s = [jax.device_put(rng.normal(size=n_slots).astype(np.float32))
            for _ in range(2)]
    u32s = [jax.device_put(
        rng.integers(0, 2**32, size=n_slots, dtype=np.uint32))
        for _ in range(4)]

    def sort_only(c):
        k = key ^ jnp.uint32(1)
        out = jax.lax.sort(
            (k, slot) + tuple(x + c * 1e-30 for x in f32s) + tuple(u32s),
            num_keys=1)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out) * 1e-30

    t = time_fn_device(sort_only, iters=5)
    log(f"pair sort alone (real dtype mix, {n_slots}): {t*1e3:8.2f} ms")

    # searchsorted over the sorted keys
    skey = jax.lax.sort((key,), num_keys=1)[0]
    skey = jax.device_put(skey)
    gx, gy = config.grid_size(W, H)
    bounds = jnp.arange(gx * gy + 1, dtype=jnp.uint32) << config.depth_bits

    def ss(c):
        s2 = skey ^ jnp.uint32(0)
        e = jnp.searchsorted(s2, bounds, side="left")
        return jnp.sum(e.astype(jnp.float32)) * 1e-30 + c * 1e-30

    t = time_fn_device(ss, iters=5)
    log(f"searchsorted 8161 bounds:    {t*1e3:8.2f} ms")

    # bin WITHOUT consuming payloads (XLA DCEs them): what forward-only
    # render actually pays for binning
    def bin_dce(c):
        s2 = dataclasses.replace(
            splats, depth=splats.depth + c * 1e-30,
            mean2d=splats.mean2d + c * 1e-30)
        b = bin_splats(s2, W, H, config, carry_fields=True)
        return jnp.sum(b.tile_count.astype(jnp.float32)) * 1e-30

    t = time_fn_device(bin_dce, iters=5)
    log(f"bin, payloads DCE'd:         {t*1e3:8.2f} ms")

    # mid-tier fold scatter-add: [cap, 9] onto [N, 9] at sorted unique idx
    cap = max(min(int(N * config.mid_frac), N), 256)
    idx = jax.device_put(np.sort(
        rng.choice(N, size=cap, replace=False)).astype(np.int32))
    rows = jax.device_put(rng.normal(size=(cap, 9)).astype(np.float32))

    def scat(c):
        r = rows + c * 1e-30
        out = jax.ops.segment_sum(r, idx, num_segments=N)
        return jnp.sum(out) * 1e-30

    t = time_fn_device(scat, iters=5)
    log(f"mid-tier segment_sum {cap}x9→{N}: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
