"""Hardware check: Pallas fused forward/backward vs the portable XLA path,
on the real TPU (the pytest suite runs CPU + interpret mode only, which
cannot catch DMA-ordering races in the backward kernel's RMW pipeline).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gaussian_splatting_web_tpu import bench_lib
from gaussian_splatting_web_tpu.config import RenderConfig
from gaussian_splatting_web_tpu.core import camera as cam
from gaussian_splatting_web_tpu.ops.rasterize import render_impl
from gaussian_splatting_web_tpu.utils.metrics import enable_compile_cache


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    enable_compile_cache()
    w, h, n = 256, 192, 20_000
    cloud = bench_lib.make_scene(n, log_scale_range=(-5.0, -2.5))
    cloud = jax.device_put(cloud)
    camera = jax.device_put(
        cam.default_camera(w, h, eye=np.array([0, 0, -6.0]),
                           center=np.zeros(3))
    )
    base = dict(max_dup=16, max_per_tile=512, depth_bits=19, tier_split=4,
                gather_cap_factor=3.0)

    def loss(c, cfg):
        img, _ = render_impl(c, camera, w, h, cfg)
        # non-uniform weighting so d_rgb varies per pixel
        ww = jnp.linspace(0.5, 1.5, w)[None, :, None]
        return jnp.sum(img * ww)

    cfg_p = RenderConfig(use_pallas="always", **base)
    cfg_x = RenderConfig(use_pallas="never", **base)

    img_p, _ = jax.jit(lambda c: render_impl(c, camera, w, h, cfg_p))(cloud)
    img_x, _ = jax.jit(lambda c: render_impl(c, camera, w, h, cfg_x))(cloud)
    di = float(jnp.max(jnp.abs(img_p - img_x)))
    log(f"forward  max|Δimg| = {di:.2e}")

    g_p = jax.jit(jax.grad(lambda c: loss(c, cfg_p)))(cloud)
    g_x = jax.jit(jax.grad(lambda c: loss(c, cfg_x)))(cloud)
    ok = True
    for name in ("xyz", "log_scale", "quat", "opacity_logit", "sh"):
        a = np.asarray(getattr(g_p, name), np.float64)
        b = np.asarray(getattr(g_x, name), np.float64)
        scale = np.abs(b).max() + 1e-12
        rel = np.abs(a - b).max() / scale
        log(f"grad {name:14s} max rel diff = {rel:.2e}")
        ok &= rel < 2e-3
    # determinism of the RMW pipeline: two runs must agree bit-exactly
    g_p2 = jax.jit(jax.grad(lambda c: loss(c, cfg_p)))(cloud)
    for name in ("xyz", "opacity_logit"):
        a = np.asarray(getattr(g_p, name))
        b = np.asarray(getattr(g_p2, name))
        same = np.array_equal(a, b)
        log(f"determinism {name}: {'OK' if same else 'MISMATCH'}")
        ok &= same
    print("PASS" if ok and di < 1e-3 else "FAIL")


if __name__ == "__main__":
    main()
