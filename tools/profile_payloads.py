"""Marginal cost of lax.sort payloads at the bench slot count.

Round 1 concluded "extra sort payloads are nearly free" — but that
measurement let XLA's sort simplifier DCE unconsumed payloads. Here every
payload output is consumed (strided sum), giving the true marginal cost,
which motivates bf16-packing pairs of fields into u32 payloads. Also
isolates the pre-sort tier/footprint build cost. Run on TPU. Not library
API.
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
from gaussian_splatting_web_tpu.ops.projection import project_gaussians
from gaussian_splatting_web_tpu.ops.sort import bin_splats, _footprints
from gaussian_splatting_web_tpu.utils.metrics import (
    enable_compile_cache, time_fn_device,
)

N_SLOTS = 4_250_000
W, H, N = 1920, 1080, 1_000_000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    enable_compile_cache()
    rng = np.random.default_rng(0)
    keys = jax.device_put(jnp.asarray(
        rng.integers(0, 2**32, size=(N_SLOTS,), dtype=np.uint64)
        .astype(np.uint32)))
    pay = jax.device_put(tuple(
        jnp.asarray(rng.integers(0, 2**31, size=(N_SLOTS,),
                                 dtype=np.int64).astype(np.int32))
        for _ in range(11)
    ))

    for k in (0, 2, 4, 6, 9, 11):
        def f(c, k=k):
            res = jax.lax.sort(
                (keys ^ c.astype(jnp.uint32),) + pay[:k], num_keys=1)
            return sum(jnp.sum(r[::4093]).astype(jnp.float32)
                       for r in res) * 1e-30

        t = time_fn_device(f, iters=6)
        log(f"sort 4.25M, {k:2d} payloads: {t*1e3:8.2f} ms")

    # pre-sort prep cost: footprints + tier build, consuming the keys
    # without sorting
    config = RenderConfig()
    cloud = jax.device_put(bench_lib.make_scene(N))
    camera = jax.device_put(
        cam.default_camera(W, H, eye=np.array([0, 0, -8.0]),
                           center=np.zeros(3)))
    splats = jax.device_put(jax.jit(
        lambda c: project_gaussians(c, camera, W, H, config))(cloud))

    import dataclasses

    def perturbed(c):
        return dataclasses.replace(
            splats,
            mean2d=splats.mean2d + c * 1e-30,
            depth=splats.depth + c * 1e-30,
        )

    def prep_only(c):
        s = perturbed(c)
        x0, y0, rw, rh = _footprints(s, W, H, config)
        return jnp.sum((x0 + y0 + rw * rh).astype(jnp.float32)) * 1e-30

    t = time_fn_device(prep_only, iters=8)
    log(f"footprints only:        {t*1e3:8.2f} ms")

    def full_bin(c):
        b = bin_splats(perturbed(c), W, H, config, carry_fields=True)
        res = (b.sorted_slot,) + tuple(b.sorted_fields)
        return (sum(jnp.sum(r[::4093]).astype(jnp.float32) for r in res)
                + jnp.sum(b.tile_count.astype(jnp.float32))) * 1e-30

    t = time_fn_device(full_bin, iters=6)
    log(f"bin_splats full (consumed): {t*1e3:8.2f} ms")

    def bin_nofields(c):
        b = bin_splats(perturbed(c), W, H, config, carry_fields=False)
        return (jnp.sum(b.sorted_gidx[::4093].astype(jnp.float32))
                + jnp.sum(b.tile_count.astype(jnp.float32))) * 1e-30

    t = time_fn_device(bin_nofields, iters=6)
    log(f"bin_splats no fields:   {t*1e3:8.2f} ms")

    # footprint histogram → tier sizing
    x0, y0, rw, rh = jax.jit(
        lambda s: _footprints(s, W, H, config))(splats)
    ntg = np.asarray(rw * rh)
    for d in (1, 2, 3, 4, 6, 8, 16):
        log(f"footprint ≤{d:2d} tiles: {np.mean(ntg <= d)*100:6.2f}%")
    log(f"mean footprint: {ntg.mean():.2f} tiles; "
        f"live pairs {np.minimum(ntg, 16).sum()/1e6:.2f}M")


if __name__ == "__main__":
    main()
