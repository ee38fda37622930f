"""Round-3 binning-sort cost model experiments (TPU).

profile_r3 attribution at the 1M/1080p bench: bin+sort = 56.8 ms of the
90.7 ms forward (the r2 bench's 28.6 ms sort number was partially DCE'd —
XLA's sort simplifier dropped the unconsumed field payloads). This tool
measures, with everything consumed:

  1. lax.sort cost vs operand count and element count (synthetic),
  2. u16 vs u32 payload cost,
  3. the cost of the pre-sort build (footprints, tier compaction, key
     build) and post-sort (searchsorted, cap) stages,
  4. fields_t assembly alternatives (the pad+stack glue measured 8.25 ms).

Not part of the library API.
"""

from __future__ import annotations

import dataclasses
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gaussian_splatting_web_tpu import bench_lib
from gaussian_splatting_web_tpu.config import RenderConfig
from gaussian_splatting_web_tpu.core import camera as cam
from gaussian_splatting_web_tpu.ops.projection import project_gaussians
from gaussian_splatting_web_tpu.ops.sort import (
    _cutoff_tau, _footprints, bin_splats, candidate_slot_tiles,
    float_to_sortable_uint, pack_bf16_pair,
)
from gaussian_splatting_web_tpu.ops.pallas.raster import KC, _sorted_fields_t, k_cap_for
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

    # ---- 1/2: synthetic variadic-sort cost model --------------------------
    rng = np.random.default_rng(0)
    for n in (4_250_000, 3_360_000, 2_600_000, 1_000_000):
        key0 = jax.device_put(
            rng.integers(0, 2**32, size=n, dtype=np.uint32))
        pls = [jax.device_put(rng.integers(0, 2**32, size=n, dtype=np.uint32))
               for _ in range(7)]
        pls16 = [jax.device_put(
            rng.integers(0, 2**16, size=n, dtype=np.uint16))
            for _ in range(4)]

        for npl in (1, 3, 5, 7):
            def body(c, npl=npl, key0=key0, pls=pls):
                k = key0 ^ jnp.uint32(c * 1e-30 + 1)
                out = jax.lax.sort((k,) + tuple(pls[:npl]), num_keys=1)
                return sum(jnp.sum(o.astype(jnp.float32)) for o in out) * 1e-30

            t = time_fn_device(body, iters=5)
            log(f"sort n={n} ops=1key+{npl}pl(u32): {t*1e3:8.2f} ms")

        def body16(c, key0=key0, pls16=pls16):
            k = key0 ^ jnp.uint32(c * 1e-30 + 1)
            out = jax.lax.sort((k,) + tuple(pls16), num_keys=1)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in out) * 1e-30

        t = time_fn_device(body16, iters=5)
        log(f"sort n={n} ops=1key+4pl(u16): {t*1e3:8.2f} ms")

    # ---- 3: nonzero compaction cost --------------------------------------
    big = jax.device_put((rng.random(N) < 0.25).astype(np.bool_))

    def body_nz(c):
        b = jnp.logical_xor(big, c > 1e30)
        idx = jnp.nonzero(b, size=N // 3, fill_value=0)[0]
        return jnp.sum(idx.astype(jnp.float32)) * 1e-30

    t = time_fn_device(body_nz, iters=5)
    log(f"nonzero(size=n/3) at 1M: {t*1e3:8.2f} ms")

    # ---- 4: bin_splats stage decomposition -------------------------------
    def perturb(c):
        return dataclasses.replace(
            splats,
            depth=splats.depth + c * 1e-30,
            mean2d=splats.mean2d + c * 1e-30,
        )

    def consume_bins(b):
        tot = jnp.sum(b.tile_count.astype(jnp.float32))
        tot += jnp.sum(b.sorted_slot.astype(jnp.float32))
        if b.sorted_fields is not None:
            for f in b.sorted_fields:
                tot += jnp.sum(f.astype(jnp.float32))
        return tot

    def b_full(c):
        return consume_bins(
            bin_splats(perturb(c), W, H, config, carry_fields=True)) * 1e-30

    t_full = time_fn_device(b_full, iters=5)
    log(f"bin_splats full (consumed): {t_full*1e3:8.2f} ms")

    # pre-sort build only: replicate the tier construction, consume keys +
    # payloads WITHOUT sorting
    def b_presort(c):
        s = perturb(c)
        gx, gy = config.grid_size(W, H)
        num_tiles = gx * gy
        d = config.max_dup
        x0, y0, rw, rh = _footprints(s, W, H, config)
        ntg_full = rw * rh
        d_a = config.tier_split
        z = jnp.zeros_like(s.opacity)
        field_cols = (
            s.mean2d[:, 0], s.mean2d[:, 1],
            pack_bf16_pair(s.conic[:, 0], s.conic[:, 1]),
            pack_bf16_pair(s.conic[:, 2], s.opacity),
            pack_bf16_pair(s.rgb[:, 0], s.rgb[:, 1]),
            pack_bf16_pair(s.rgb[:, 2], z),
        )
        big = ntg_full > d_a
        n_big = jnp.sum(big.astype(jnp.int32))
        nb_cap = max(min(int(N * config.big_frac), N), 256)
        ntg_a = jnp.where(big, 0, jnp.minimum(ntg_full, d_a))
        tile_a, live_a = candidate_slot_tiles(
            x0, y0, rw, ntg_a, d_a, gx, num_tiles, config.tile_size)
        idx_b = jnp.nonzero(big, size=nb_cap, fill_value=0)[0].astype(jnp.int32)
        valid_b = jnp.arange(nb_cap) < n_big
        ntg_b = jnp.where(valid_b, jnp.minimum(ntg_full[idx_b], d), 0)
        tile_b, live_b = candidate_slot_tiles(
            x0[idx_b], y0[idx_b], rw[idx_b], ntg_b, d, gx, num_tiles,
            config.tile_size)
        depth_bits = config.depth_bits
        tot = 0.0
        for tile_id, live, depth in ((tile_a, live_a, s.depth),
                                     (tile_b, live_b, s.depth[idx_b])):
            dkey = float_to_sortable_uint(depth) >> (32 - depth_bits)
            key = (tile_id.astype(jnp.uint32) << depth_bits) | dkey[:, None]
            key = jnp.where(live, key, jnp.uint32(0xFFFFFFFF)).reshape(-1)
            tot += jnp.sum(key.astype(jnp.float32))
        for f in field_cols:
            tot += jnp.sum(jnp.broadcast_to(
                f[:, None], (N, d_a)).astype(jnp.float32))
            tot += jnp.sum(jnp.broadcast_to(
                f[idx_b][:, None], (nb_cap, d)).astype(jnp.float32))
        return tot * 1e-30

    t_pre = time_fn_device(b_presort, iters=5)
    log(f"bin pre-sort build only:    {t_pre*1e3:8.2f} ms")

    # ---- 5: fields_t assembly alternatives -------------------------------
    bins = jax.jit(lambda s: bin_splats(s, W, H, config,
                                        carry_fields=True))(splats)
    bins = jax.device_put(bins)
    k_cap = k_cap_for(config)

    def ft_current(c):
        b = dataclasses.replace(
            bins, sorted_fields=tuple(
                (f + c * 1e-30 if f.dtype != jnp.uint32 else f ^ jnp.uint32(0))
                for f in bins.sorted_fields))
        ft = _sorted_fields_t(splats, b, k_cap, quantize=True)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in ft) * 1e-30 + c * 1e-30

    t = time_fn_device(ft_current, iters=5)
    log(f"fields_t pad+stack current: {t*1e3:8.2f} ms")

    def ft_concat(c):
        fs = [(f + c * 1e-30 if f.dtype != jnp.uint32 else f ^ jnp.uint32(0))
              for f in bins.sorted_fields]
        pad = k_cap + KC
        m = fs[0].shape[0]
        rows = [jax.lax.bitcast_convert_type(fs[0], jnp.uint32),
                jax.lax.bitcast_convert_type(fs[1], jnp.uint32)] + list(fs[2:6])
        z = jnp.zeros((2, m + pad), jnp.uint32)
        f6 = jnp.concatenate(
            [jnp.concatenate([r[None, :], jnp.zeros((1, pad), jnp.uint32)],
                             axis=1) for r in rows] + [z], axis=0)
        return jnp.sum(f6.astype(jnp.float32)) * 1e-30 + c * 1e-30

    t = time_fn_device(ft_concat, iters=5)
    log(f"fields_t concat-rows:       {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
