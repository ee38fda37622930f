"""Isolation harness for the TPU grad mismatch: error DISTRIBUTIONS (not
just max) for (a) the new fused bin+composite entry, (b) the legacy
gather-based Pallas entry — both vs the XLA path compiled on TPU."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gaussian_splatting_web_tpu import bench_lib
from gaussian_splatting_web_tpu.config import RenderConfig
from gaussian_splatting_web_tpu.core import camera as cam
from gaussian_splatting_web_tpu.ops.projection import project_gaussians
from gaussian_splatting_web_tpu.ops.rasterize import rasterize_tiles
from gaussian_splatting_web_tpu.ops.sort import bin_splats
from gaussian_splatting_web_tpu.ops.pallas.raster import (
    rasterize_pallas,
    rasterize_tiles_pallas,
)
from gaussian_splatting_web_tpu.utils.metrics import enable_compile_cache


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def stats(a, b, name):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    scale = np.abs(b).max() + 1e-12
    rel = np.abs(a - b) / scale
    frac = float((rel > 1e-2).mean())
    log(f"  {name:14s} max={rel.max():.2e}  p99.9={np.percentile(rel, 99.9):.2e}"
        f"  p99={np.percentile(rel, 99):.2e}  frac>1e-2={frac:.4f}")
    return rel.max()


def main():
    enable_compile_cache()
    w, h, n = 256, 192, 20_000
    cloud = jax.device_put(bench_lib.make_scene(n, log_scale_range=(-5.0, -2.5)))
    camera = jax.device_put(
        cam.default_camera(w, h, eye=np.array([0, 0, -6.0]),
                           center=np.zeros(3))
    )
    base = dict(max_dup=16, max_per_tile=512, depth_bits=19, tier_split=4,
                gather_cap_factor=3.0)
    cfg_p = RenderConfig(use_pallas="always", **base)

    splats = jax.jit(
        lambda c: project_gaussians(c, camera, w, h, cfg_p)
    )(cloud)
    splats = jax.device_put(splats)
    bins = jax.jit(lambda s: bin_splats(s, w, h, cfg_p))(splats)
    bins = jax.device_put(bins)

    ww = jnp.linspace(0.5, 1.5, w)[None, :, None]

    def loss_xla(s):
        rgb, a = rasterize_tiles(s, bins, w, h, cfg_p)
        return jnp.sum(rgb * ww) + jnp.sum(a)

    def loss_new(s):
        rgb, a, _ = rasterize_pallas(s, w, h, cfg_p)
        return jnp.sum(rgb * ww) + jnp.sum(a)

    def loss_old(s):
        rgb, a = rasterize_tiles_pallas(s, bins, w, h, cfg_p)
        return jnp.sum(rgb * ww) + jnp.sum(a)

    g_x = jax.jit(jax.grad(loss_xla, allow_int=True))(splats)
    g_n = jax.jit(jax.grad(loss_new, allow_int=True))(splats)
    g_o = jax.jit(jax.grad(loss_old, allow_int=True))(splats)

    log("new fused entry (fat sort) vs XLA:")
    for name in ("mean2d", "conic", "rgb", "opacity"):
        stats(getattr(g_n, name), getattr(g_x, name), name)
    log("legacy gather entry vs XLA:")
    for name in ("mean2d", "conic", "rgb", "opacity"):
        stats(getattr(g_o, name), getattr(g_x, name), name)
    log("new vs legacy (should be ~identical):")
    for name in ("mean2d", "conic", "rgb", "opacity"):
        stats(getattr(g_n, name), getattr(g_o, name), name)


if __name__ == "__main__":
    main()
