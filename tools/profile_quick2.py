"""DCE-proof stage profile: consume EVERY output of each stage so XLA cannot
eliminate sort payloads etc. Also reports the slot/footprint distribution.
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
from gaussian_splatting_web_tpu.ops.pallas import raster as pr
from gaussian_splatting_web_tpu.utils.metrics import (
    enable_compile_cache,
    time_fn,
)

W, H, N = 1920, 1080, 1_000_000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def consume(tree):
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    return sum(
        jnp.sum((x if x.ndim == 0 else x[..., ::173]).astype(jnp.float32))
        * 1e-30
        for x in leaves
    )


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

    # project, all outputs consumed
    t = time_fn(
        jax.jit(lambda c: consume(
            project_gaussians(pc(c), camera, W, H, config))),
        jnp.float32(0.0), iters=8, warmup=2,
    ) - floor
    log(f"project(all):      {t*1e3:8.2f} ms")

    splats = jax.jit(lambda c: project_gaussians(c, camera, W, H, config))(
        cloud)
    splats = jax.device_put(splats)

    def ps(c):
        return dataclasses.replace(splats, depth=splats.depth + c * 1e-30)

    # footprint distribution
    x0, y0, rw, rh = jax.jit(
        lambda s: _footprints(s, W, H, config))(splats)
    ntg = np.asarray(jax.jit(lambda a, b: a * b)(rw, rh))
    for k in (0, 1, 2, 3, 4, 6, 8, 16):
        log(f"  ntg<= {k:2d}: {float(np.mean(ntg <= k)):.4f}")
    log(f"  live pairs (untruncated): {int(ntg.clip(0, 16).sum())}")

    # bin+sort with fields, ALL outputs consumed
    t = time_fn(
        jax.jit(lambda c: consume(
            bin_splats(ps(c), W, H, config, carry_fields=True))),
        jnp.float32(0.0), iters=8, warmup=2,
    ) - floor
    log(f"bin+sort+fields(all): {t*1e3:8.2f} ms")

    # bin+sort without fields, all outputs consumed
    t = time_fn(
        jax.jit(lambda c: consume(
            bin_splats(ps(c), W, H, config, carry_fields=False))),
        jnp.float32(0.0), iters=8, warmup=2,
    ) - floor
    log(f"bin+sort-nofields(all): {t*1e3:8.2f} ms")

    # fold only
    bins = jax.jit(
        lambda s: bin_splats(s, W, H, config, carry_fields=True)
    )(splats)
    bins = jax.device_put(bins)
    k_cap = pr.k_cap_for(config)
    m_pad = bins.sorted_gidx.shape[0] + k_cap + pr.KC
    dpairs = jax.device_put(jnp.ones((pr.F_PAD, m_pad), jnp.float32))

    def fold(c):
        seg = pr._fold_pair_grads(dpairs + c * 1e-30, bins, N)
        return jnp.sum(seg) * 1e-30

    t = time_fn(jax.jit(fold), jnp.float32(0.0), iters=6, warmup=2) - floor
    log(f"pair-grad fold:    {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
