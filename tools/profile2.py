"""Second-round TPU microbenchmarks: sort/key-build split, gather widths,
sort-payload scaling, transpose cost. Scratch tool."""

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
    log(f"platform={jax.default_backend()}")
    cloud = jax.device_put(bench_lib.make_scene(N))
    camera = jax.device_put(
        cam.default_camera(W, H, eye=np.array([0, 0, -8.0]),
                           center=np.zeros(3)))
    splats = jax.jit(lambda c: project_gaussians(c, camera, W, H, config))(cloud)
    bins = jax.jit(lambda s: bin_splats(s, W, H, config))(splats)
    splats, bins = jax.device_put((splats, bins))

    n_slots = 4_227_136  # 4M tier A + 227136 tier B at this scene/config
    rng = np.random.default_rng(0)
    keys = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=n_slots, dtype=np.uint32)))
    pay = jax.device_put(jnp.arange(n_slots, dtype=jnp.int32))
    fields8 = jax.device_put(
        jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32)))
    fields16 = jax.device_put(
        jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32)))
    fields4 = fields8[:, :4]
    m = int(bins.sorted_gidx.shape[0])
    gidx = bins.sorted_gidx  # random-ish indices [3M]

    def t(name, fn, iters=6):
        try:
            tt = time_fn_device(fn, iters=iters)
            log(f"{name:42s} {tt*1e3:8.2f} ms")
        except Exception as e:
            log(f"{name:42s} FAILED {type(e).__name__}: {e}")

    # --- sort scaling with payload count
    def mk_sort(npay):
        def f(carry):
            k = keys ^ (carry * 1e-30).astype(jnp.uint32)
            ops = (k,) + tuple(
                pay + i for i in range(npay)
            )
            out = jax.lax.sort(ops, num_keys=1)
            return sum(jnp.sum(o[::1009].astype(jnp.float32)) for o in out[1:]) * 1e-30
        return f

    t(f"lax.sort {n_slots} (key+1 payload)", mk_sort(1))
    t(f"lax.sort {n_slots} (key+2 payloads)", mk_sort(2))
    t(f"lax.sort {n_slots} (key+4 payloads)", mk_sort(4))

    # --- gather widths at M=3M
    def g(width, src):
        def f(carry):
            idx = gidx + (carry * 1e-30).astype(jnp.int32)
            return jnp.sum(src[idx][::1009]) * 1e-30
        return f

    t("gather [3M] from [N,4]", g(4, fields4))
    t("gather [3M] from [N,8]", g(8, fields8))
    t("gather [3M] from [N,16]", g(16, fields16))

    def g2(carry):
        idx = gidx + (carry * 1e-30).astype(jnp.int32)
        a = fields8[idx]
        b = fields8[idx]
        return (jnp.sum(a[::1009]) + jnp.sum(b[::1009])) * 1e-30

    t("2x gather [3M] from [N,8]", g2)

    # sorted (monotone) indices for comparison
    sidx = jax.device_put(jnp.sort(gidx))

    def gs(carry):
        idx = sidx + (carry * 1e-30).astype(jnp.int32)
        return jnp.sum(fields8[idx][::1009]) * 1e-30

    t("gather [3M sorted idx] from [N,8]", gs)

    # --- transpose [16, M] -> [M, 16]
    big = jax.device_put(jnp.asarray(
        rng.normal(size=(16, m)).astype(np.float32)))

    def tr(carry):
        return jnp.sum((big + carry * 1e-30).T[::1009]) * 1e-30

    t("transpose [16,3M]->[3M,16]", tr)

    # --- backward-unsort estimate: sort (slot-keys) + dense gather + reshape-sum
    slot_u = jax.device_put(
        jnp.asarray(rng.permutation(n_slots).astype(np.uint32)))
    dpairs8 = jax.device_put(jnp.asarray(
        rng.normal(size=(m + 256, 8)).astype(np.float32)))

    def unsort(carry):
        pos = jnp.arange(n_slots, dtype=jnp.int32)
        sslot = slot_u ^ (carry * 1e-30).astype(jnp.uint32)
        _, posn = jax.lax.sort((sslot, pos), num_keys=1)
        posn = jnp.minimum(posn, m + 255)
        ga = dpairs8[posn[: 4_000_000]].reshape(N, 4, 8).sum(axis=1)
        gb = dpairs8[posn[4_000_000:]].reshape(-1, 16, 8).sum(axis=1)
        return (jnp.sum(ga[::997]) + jnp.sum(gb)) * 1e-30

    t("bwd unsort: sort+gather+reshape-sum", unsort, iters=4)

    # --- segment_sum with sorted ids (for reference)
    sg = jnp.sort(bins.sorted_gidx)

    def seg_sorted(carry):
        rows = dpairs8[:m] + carry * 1e-30
        return jnp.sum(jax.ops.segment_sum(
            rows, sg, num_segments=N, indices_are_sorted=True)[::997]) * 1e-30

    t("segment_sum [3M,8] sorted ids", seg_sorted, iters=4)


if __name__ == "__main__":
    main()
