"""Benchmark harness (shared by repo-root bench.py and the CLI `bench`).

Measures, on the current default JAX device:
  * forward render throughput (Mpix/s) at the target resolution,
  * forward+backward throughput,
  * bin+sort throughput (M splats/s).

With no PLY given, a 100k-gaussian synthetic scene is used so the benchmark
is self-contained (the reference ships only toy scenes; its large blobs are
stripped — .MISSING_LARGE_BLOBS).
"""

from __future__ import annotations

import json
import sys
from typing import Optional

import numpy as np

BASELINE_MPIXPS = 60.0  # 30 fps @ 1080p — "interactive" north star (BASELINE.md)


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_scene(n, seed=0, sh_degree=3, log_scale_range=(-6.0, -4.0)):
    """Synthetic scene shaped like an INRIA-trained capture: many small
    splats (screen footprints of a few pixels to a couple of tiles), which
    is what real trained scenes look like (garden/bicycle: 1-6M splats at
    roughly pixel scale)."""
    from .core.types import GaussianCloud

    rng = np.random.default_rng(seed)
    k = {0: 1, 1: 4, 2: 9, 3: 16}[sh_degree]
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return GaussianCloud(
        xyz=(rng.normal(size=(n, 3)) * 2.0).astype(np.float32),
        log_scale=rng.uniform(*log_scale_range, size=(n, 3)).astype(np.float32),
        quat=q,
        opacity_logit=rng.uniform(-3, 1, size=(n,)).astype(np.float32),
        sh=rng.normal(scale=0.3, size=(n, k, 3)).astype(np.float32),
    )


def run(
    ply: Optional[str] = None,
    width: int = 1920,
    height: int = 1080,
    n_synthetic: int = 1_000_000,
    emit_json: bool = True,
) -> dict:
    import jax
    import jax.numpy as jnp

    from .utils.metrics import enable_compile_cache

    enable_compile_cache()

    import dataclasses

    from .config import RenderConfig
    from .core import camera as cam
    from .io.ply import read_ply
    from .ops.projection import project_gaussians
    from .ops.rasterize import render_impl
    from .ops.sort import bin_splats
    from .utils.metrics import time_fn

    config = RenderConfig(
        max_dup=16, max_per_tile=1024, tile_chunk=32, depth_bits=19,
        tier_split=4, big_frac=1.0 / 16, gather_cap_factor=3.0,
    )

    _log(f"platform={jax.default_backend()} devices={jax.devices()}")
    if ply:
        cloud = read_ply(ply)
        lo, hi = cloud.bbox()
        center = (np.asarray(lo) + np.asarray(hi)) / 2
        eye = center + np.array([0, 0, -5.0])
    else:
        cloud = make_scene(n_synthetic)
        center = np.zeros(3)
        eye = np.array([0, 0, -8.0])
    n = cloud.num_gaussians
    cloud = jax.device_put(cloud)
    camera = jax.device_put(
        cam.default_camera(width, height, eye=eye, center=center)
    )

    def perturbed(c):
        return dataclasses.replace(
            cloud, opacity_logit=cloud.opacity_logit + c * 1e-30
        )

    # single-program timings with the dispatch floor subtracted (the
    # device-loop variant costs two multi-minute remote compiles per stage)
    floor = time_fn(jax.jit(lambda x: x + 1.0), jnp.float32(0.0),
                    iters=6, warmup=2)

    fwd_fn = jax.jit(
        lambda c: jnp.sum(
            render_impl(perturbed(c), camera, width, height, config)[0]
        )
    )
    t = max(time_fn(fwd_fn, jnp.float32(0.0), iters=8, warmup=2) - floor, 1e-6)
    mpixps = width * height / t / 1e6
    _log(f"forward: {t*1e3:.2f} ms → {mpixps:.1f} Mpix/s "
         f"({n} gaussians @{width}x{height})")

    result = {
        "metric": f"forward_render_{height}p",
        "value": round(mpixps, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpixps / BASELINE_MPIXPS, 3),
    }

    def loss(c):
        img, _ = render_impl(perturbed(c), camera, width, height, config)
        return jnp.sum(img)

    try:
        # single-program timing (device-loop wrapping would double the
        # already-long remote compile); subtract the measured dispatch floor
        grad_fn = jax.jit(jax.grad(loss))
        tb = max(time_fn(grad_fn, jnp.float32(0.0), iters=6, warmup=2) - floor,
                 1e-6)
        _log(f"forward+backward: {tb*1e3:.2f} ms → "
             f"{width*height/tb/1e6:.1f} Mpix/s")
        result["fwd_bwd_mpixps"] = round(width * height / tb / 1e6, 2)
    except Exception as e:  # pragma: no cover
        _log(f"backward bench failed: {e}")

    splats = jax.jit(
        lambda c, k: project_gaussians(c, k, width, height, config)
    )(cloud, camera)

    sort_fn = jax.jit(
        lambda c: jnp.sum(
            bin_splats(
                dataclasses.replace(splats, depth=splats.depth + c * 1e-30),
                width, height, config,
            ).tile_count.astype(jnp.float32)
        )
    )
    ts = max(time_fn(sort_fn, jnp.float32(0.0), iters=8, warmup=2) - floor,
             1e-6)
    _log(f"bin+sort: {ts*1e3:.2f} ms → {n/ts/1e6:.1f} M splats/s")
    result["sort_msplats_per_s"] = round(n / ts / 1e6, 2)

    if emit_json:
        print(json.dumps({k: result[k] for k in
                          ("metric", "value", "unit", "vs_baseline")}))
    return result
