"""Measure: sort payload-count cost vs the 4-wide opacity gather it could
replace (carry opacity through the binning sort instead of re-gathering it
into pair order afterwards)."""

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
from gaussian_splatting_web_tpu.ops.sort import bin_splats
from gaussian_splatting_web_tpu.utils.metrics import (
    enable_compile_cache,
    time_fn_device,
)

W, H, N = 1920, 1080, 1_000_000
SLOTS = 5_062_500  # n*d_a + nb_cap*d at the bench config
M = 3_000_000


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

    rng = np.random.default_rng(0)
    keys = jax.device_put(rng.integers(0, 2**32, SLOTS, dtype=np.uint32))
    p1 = jax.device_put(rng.integers(0, N, SLOTS, dtype=np.int32))
    p2 = jax.device_put(np.arange(SLOTS, dtype=np.int32))
    p3 = jax.device_put(rng.random(SLOTS, dtype=np.float32))

    def sort_n(n_payloads):
        ps = (p1, p2, p3)[:n_payloads]

        def f(carry):
            k = keys ^ jax.lax.convert_element_type(carry, jnp.uint32)
            out = jax.lax.sort((k,) + ps, num_keys=1)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in out[1:2]) * 1e-30

        return time_fn_device(f, iters=4)

    for np_ in (2, 3):
        t = sort_n(np_)
        log(f"sort 1key+{np_}payloads @ {SLOTS}: {t*1e3:8.2f} ms")

    # the 4-wide opacity gather this would replace
    z = jnp.zeros_like(splats.opacity)

    def g4(carry):
        p4 = jnp.stack([splats.opacity + carry * 1e-30, z, z, z], axis=-1)
        return jnp.sum(p4[bins.sorted_gidx]) * 1e-30

    t = time_fn_device(g4, iters=4)
    log(f"gather[3Mx4] opacity:      {t*1e3:8.2f} ms")

    # 1-wide gather variant (no zero padding)
    def g1(carry):
        return jnp.sum((splats.opacity + carry * 1e-30)[bins.sorted_gidx]) * 1e-30

    t = time_fn_device(g1, iters=4)
    log(f"gather[3Mx1] opacity:      {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
