"""Isolate the forward compositor kernel's per-iteration fixed costs.

The round-2 bench showed the composite kernel at ~87 ms while its
MXU/VPU/HBM roofline bound is ~5 ms. Suspects (each toggled here, measured
at the 1M/1080p bench scene):

  * loop='while'  — the early-exit `while_loop` cond reads jnp.max(carry)
    every chunk: a vector→scalar reduce + sync between the vector and
    scalar cores per iteration.
    loop='fori'   — fixed trip count, masks only (no early exit).
  * carry='switch' — the per-chunk single-lane carry store via lax.switch
    (strided 4-lane-wide VMEM writes + branch).
    carry='none'   — no carry stores (forward-only kernel).
  * grouping      — row-major vs count-sorted tile order.

Not part of the library API. Run on TPU.
"""

from __future__ import annotations

import functools
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from gaussian_splatting_web_tpu import bench_lib
from gaussian_splatting_web_tpu.config import RenderConfig
from gaussian_splatting_web_tpu.core import camera as cam
from gaussian_splatting_web_tpu.ops.pallas.raster import (
    KC, _dot_bf16x2, _dot_exact_bf16x3, _dot_general_bf16x3,
    _sorted_fields_t, k_cap_for,
)
from gaussian_splatting_web_tpu.ops.projection import project_gaussians
from gaussian_splatting_web_tpu.ops.sort import bin_splats
from gaussian_splatting_web_tpu.utils.metrics import (
    enable_compile_cache, time_fn_device,
)

W, H, N = 1920, 1080, 1_000_000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _kernel(
    starts_ref, counts_ref, tiles_ref, f8_hbm, f4_hbm, out_ref, carr_ref,
    slab8_ref, slab4_ref, sem_ref, *,
    gx, tile_size, k_cap, alpha_cutoff, alpha_max, log_eps, r_tiles,
    loop, carry_mode,
):
    p = tile_size * tile_size
    R = r_tiles
    g0 = pl.program_id(0) * R
    ts_f = float(tile_size)

    bases, leads, totals, n_chunks_r, txs, tys = [], [], [], [], [], []
    for r in range(R):
        t = tiles_ref[g0 + r]
        start = starts_ref[t]
        count = jnp.minimum(counts_ref[t], k_cap)
        base = (start // KC) * KC
        lead = start - base
        total = lead + count
        bases.append(base)
        leads.append(lead)
        totals.append(total)
        n_chunks_r.append(jnp.where(count > 0, pl.cdiv(total, KC), 0))
        txs.append((t % gx).astype(jnp.float32) * ts_f)
        tys.append((t // gx).astype(jnp.float32) * ts_f)
    max_chunks = n_chunks_r[0]
    for r in range(1, R):
        max_chunks = jnp.maximum(max_chunks, n_chunks_r[r])

    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (pix % tile_size).astype(jnp.float32)
    py = (pix // tile_size).astype(jnp.float32)
    ones_p = jnp.ones((p, 1), jnp.float32)
    u_mat = jnp.concatenate(
        [ones_p, px, py, px * px, py * py, px * py,
         jnp.zeros((p, 2), jnp.float32)], axis=1)

    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 1)
    ).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1)

    def stack_scalar(vals, dtype):
        return jnp.concatenate(
            [jnp.broadcast_to(v.astype(dtype), (p, 1)) for v in vals], axis=0)

    lead_col = stack_scalar(leads, jnp.int32)
    total_col = stack_scalar(totals, jnp.int32)

    def dma8(slot, r, c):
        off = pl.multiple_of(bases[r] + c * KC, KC)
        return pltpu.make_async_copy(
            f8_hbm.at[:, pl.ds(off, KC)], slab8_ref.at[slot, r],
            sem_ref.at[slot, r, 0])

    def dma4(slot, r, c):
        off = pl.multiple_of(bases[r] + c * KC, KC)
        return pltpu.make_async_copy(
            f4_hbm.at[:, pl.ds(off, KC)], slab4_ref.at[slot, r],
            sem_ref.at[slot, r, 1])

    def dma_start(slot, c):
        for r in range(R):
            dma8(slot, r, c).start()
            dma4(slot, r, c).start()

    def dma_wait(slot, c):
        for r in range(R):
            dma8(slot, r, c).wait()
            dma4(slot, r, c).wait()

    @pl.when(max_chunks > 0)
    def _():
        dma_start(0, 0)

    maxc = carr_ref.shape[2]

    def chunk_body(state):
        c, carry, acc4 = state

        if carry_mode == "switch":
            def _store(ci):
                def f():
                    carr_ref[:, :, ci:ci + 1] = carry.reshape(R, p, 1)
                return f
            jax.lax.switch(jnp.minimum(c, maxc - 1),
                           [_store(i) for i in range(maxc)])

        @pl.when(c + 1 < max_chunks)
        def _():
            dma_start((c + 1) % 2, c + 1)

        dma_wait(c % 2, c)

        powers, f4s = [], []
        for r in range(R):
            slab = slab8_ref[c % 2, r]
            mx = slab[0:1, :] - txs[r]
            my = slab[1:2, :] - tys[r]
            ca = slab[2:3, :]
            cb = slab[3:4, :]
            cc = slab[4:5, :]
            v_mat = jnp.concatenate(
                [
                    -(0.5 * ca * mx * mx + cb * mx * my + 0.5 * cc * my * my),
                    ca * mx + cb * my,
                    cc * my + cb * mx,
                    -0.5 * ca,
                    -0.5 * cc,
                    -cb,
                    jnp.zeros((2, KC), jnp.float32),
                ], axis=0)
            powers.append(_dot_exact_bf16x3(u_mat, v_mat))
            f4s.append(jnp.concatenate(
                [slab[5:8, :], jnp.ones((1, KC), jnp.float32)], axis=0))
        power = jnp.concatenate(powers, axis=0)
        op = jnp.concatenate(
            [jnp.broadcast_to(slab4_ref[c % 2, r][0:1, :], (p, KC))
             for r in range(R)], axis=0)

        power = jnp.minimum(power, 0.0)
        alpha = jnp.minimum(op * jnp.exp(power), alpha_max)
        alpha = jnp.where(alpha < alpha_cutoff, 0.0, alpha)
        g = c * KC + lane
        alpha = jnp.where(
            jnp.logical_and(g >= lead_col, g < total_col), alpha, 0.0)

        log1m = jnp.log1p(-alpha)
        cum = _dot_bf16x2(log1m, tri)
        log_t_incl = carry + cum
        t_excl = jnp.exp(log_t_incl - log1m)
        w = jnp.where(log_t_incl < log_eps, 0.0, alpha * t_excl)

        acc4 = acc4 + jnp.concatenate(
            [
                _dot_general_bf16x3(
                    w[r * p:(r + 1) * p], f4s[r], (((1,), (1,)), ((), ())))
                for r in range(R)
            ], axis=0)
        carry = carry + cum[:, KC - 1:KC]
        return c + 1, carry, acc4

    init = (
        jnp.int32(0),
        jnp.zeros((R * p, 1), jnp.float32),
        jnp.zeros((R * p, 4), jnp.float32),
    )
    if loop == "while":
        def chunk_cond(state):
            c, carry, *_ = state
            return jnp.logical_and(c < max_chunks,
                                   jnp.max(carry) >= log_eps)
        c_final, _, acc4 = jax.lax.while_loop(chunk_cond, chunk_body, init)

        @pl.when(c_final < max_chunks)
        def _():
            dma_wait(c_final % 2, c_final)
    else:
        def body(i, state):
            return chunk_body(state)
        c_final, _, acc4 = jax.lax.fori_loop(
            0, max_chunks, body, init)

    out_ref[:, :, :] = acc4.reshape(R, p, 4)
    if carry_mode == "switch":
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (R, p, maxc), 2)
        carr_ref[:, :, :] = jnp.where(
            lane_c < c_final, carr_ref[:, :, :], -1e30)
    else:
        carr_ref[:, :, :] = jnp.zeros((R, p, maxc), jnp.float32)


def composite_variant(bins, fields_t, config, tile_ids, r_tiles, loop,
                      carry_mode, width=W, height=H):
    ts = config.tile_size
    gx, gy = config.grid_size(width, height)
    num_tiles = gx * gy
    p = ts * ts
    k_cap = k_cap_for(config)
    maxc = k_cap // KC
    grid_n = tile_ids.shape[0]
    r = r_tiles
    n_groups = -(-grid_n // r)
    pad = n_groups * r - grid_n
    tiles_padded = jnp.concatenate(
        [tile_ids.astype(jnp.int32), jnp.full((pad,), num_tiles, jnp.int32)])
    starts_s = jnp.concatenate(
        [bins.tile_start, jnp.zeros((1,), bins.tile_start.dtype)])
    counts_s = jnp.concatenate(
        [jnp.minimum(bins.tile_count, k_cap),
         jnp.zeros((1,), bins.tile_count.dtype)]).astype(jnp.int32)

    kernel = functools.partial(
        _kernel, gx=gx, tile_size=ts, k_cap=k_cap,
        alpha_cutoff=config.alpha_cutoff, alpha_max=config.alpha_max,
        log_eps=float(math.log(config.transmittance_eps)), r_tiles=r,
        loop=loop, carry_mode=carry_mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((r, p, 4), lambda g, s, c, t: (g, 0, 0)),
            pl.BlockSpec((r, p, maxc), lambda g, s, c, t: (g, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, r, 8, KC), jnp.float32),
            pltpu.VMEM((2, r, 4, KC), jnp.float32),
            pltpu.SemaphoreType.DMA((2, r, 2)),
        ],
    )
    out, carries = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_groups * r, p, 4), jnp.float32),
            jax.ShapeDtypeStruct((n_groups * r, p, maxc), jnp.float32),
        ),
    )(starts_s, counts_s, tiles_padded, fields_t[0], fields_t[1])
    return out[:grid_n]


def main():
    enable_compile_cache()
    config = RenderConfig()
    cloud = jax.device_put(bench_lib.make_scene(N))
    camera = jax.device_put(
        cam.default_camera(W, H, eye=np.array([0, 0, -8.0]),
                           center=np.zeros(3)))
    splats = jax.jit(
        lambda c: project_gaussians(c, camera, W, H, config))(cloud)
    bins = jax.jit(
        lambda s: bin_splats(s, W, H, config, carry_fields=True))(splats)
    splats, bins = jax.device_put((splats, bins))
    k_cap = k_cap_for(config)
    fields_t = jax.jit(lambda s, b: _sorted_fields_t(s, b, k_cap))(
        splats, bins)
    fields_t = jax.device_put(fields_t)
    gx, gy = config.grid_size(W, H)
    rowmajor = jnp.arange(gx * gy, dtype=jnp.int32)
    bycount = jnp.argsort(-bins.tile_count).astype(jnp.int32)
    log(f"pairs={int(bins.num_pairs)}")

    for name, tile_ids in (("rowmajor", rowmajor), ("bycount", bycount)):
        for loop in ("while", "fori"):
            for carry_mode in ("switch", "none"):
                def f(c, tile_ids=tile_ids, loop=loop,
                      carry_mode=carry_mode):
                    ft = tuple(x + c * 1e-30 for x in fields_t)
                    out = composite_variant(
                        bins, ft, config, tile_ids, 4, loop, carry_mode)
                    return jnp.sum(out) * 1e-30

                t = time_fn_device(f, iters=6)
                log(f"order={name:8s} loop={loop:5s} carry={carry_mode:6s}"
                    f"  {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
