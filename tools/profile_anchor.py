"""Stage attribution for the anchor pipeline at bench scale (1M @1080p):
binning sort, then the forward kernel truncated at each merge phase
(0 = DMA loads only, 1 = + touch/rank, 2 = + one-hot merge, 3 = full
composite), over r_tiles.

Usage: python tools/profile_anchor.py [--n 1000000]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    from gaussian_splatting_web_tpu.bench_lib import make_scene
    from gaussian_splatting_web_tpu.config import RenderConfig
    from gaussian_splatting_web_tpu.core import camera as cam
    from gaussian_splatting_web_tpu.ops.projection import project_gaussians
    from gaussian_splatting_web_tpu.ops.pallas.anchor import (
        bin_splats_anchor, composite_tiles_anchor)
    from gaussian_splatting_web_tpu.utils.metrics import (
        enable_compile_cache, time_fn_device)

    enable_compile_cache()
    w, h = args.width, args.height
    config = RenderConfig()
    cloud = make_scene(args.n)
    camera = jax.device_put(
        cam.default_camera(w, h, eye=np.array([0, 0, -8.0]),
                           center=np.zeros(3)))
    cloud = jax.device_put(cloud)
    splats = jax.jit(
        lambda c: project_gaussians(c, camera, w, h, config))(cloud)
    splats = jax.device_put(splats)

    import dataclasses

    def perturb(c):
        return dataclasses.replace(
            splats, mean2d=splats.mean2d + c * 1e-30)

    t_bin = time_fn_device(lambda c: jnp.sum(
        bin_splats_anchor(perturb(c), w, h, config).starts
        .astype(jnp.float32)) * 1e-30)
    print(f"bin_splats_anchor: {t_bin*1e3:8.2f} ms")

    ab = jax.jit(lambda s: bin_splats_anchor(s, w, h, config))(splats)
    ab = jax.device_put(ab)

    def comp_body(phase, r):
        def body(c):
            ab2 = dataclasses.replace(
                ab, slab=tuple(x ^ c.astype(jnp.uint32) * 0
                               for x in ab.slab))
            tiles, fin = composite_tiles_anchor(
                ab2, w, h, config, profile_phase=phase, r_tiles=r)
            return (jnp.sum(tiles[::97]) + jnp.sum(fin[::97]) + c) * 1e-30
        return body

    for r in (1, 2, 4):
        row = []
        for phase in (0, 1, 2, 3):
            t = time_fn_device(comp_body(phase, r), iters=6)
            row.append(t * 1e3)
        print(f"r={r}: dma={row[0]:7.2f}  +rank={row[1]:7.2f}  "
              f"+onehot={row[2]:7.2f}  full={row[3]:7.2f} ms")


if __name__ == "__main__":
    main()
