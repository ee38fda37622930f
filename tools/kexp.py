"""Composite-kernel timing experiments (scratch tool, not library API).

Parametrized copy of ops/pallas/raster.py's forward kernel:
  * kc:        splat-chunk width (lanes)
  * trans:     'f32' exact | 'bf16' transcendentals evaluated in bf16 |
               'stub' replace exp/log1p with cheap mults (timing only,
               wrong math)
  * elem16:    do per-element alpha/mask math in bf16 (2x VPU packing)

Each variant is timed with the amortized device loop at the bench config.
"""

from __future__ import annotations

import dataclasses
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
    F_PAD,
    _dot_bf16x2,
    _dot_exact_bf16x3,
    _dot_general_bf16x3,
    _sorted_fields_t,
    k_cap_for,
)
from gaussian_splatting_web_tpu.ops.projection import project_gaussians
from gaussian_splatting_web_tpu.ops.sort import bin_splats
from gaussian_splatting_web_tpu.utils.metrics import (
    enable_compile_cache,
    time_fn_device,
)

W, H, N = 1920, 1080, 1_000_000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _kernel_v(
    starts_ref, counts_ref, tiles_ref, fields_hbm, out_ref, carr_ref,
    slab_ref, sem_ref, *, gx, tile_size, k_cap, alpha_cutoff, alpha_max,
    log_eps, kc, trans, elem16,
):
    t = tiles_ref[pl.program_id(0)]
    p = tile_size * tile_size

    start = starts_ref[t]
    count = jnp.minimum(counts_ref[t], k_cap)
    base = (start // kc) * kc
    lead = start - base
    total = lead + count
    n_chunks = jnp.where(count > 0, pl.cdiv(total, kc), 0)

    tx = (t % gx).astype(jnp.float32)
    ty = (t // gx).astype(jnp.float32)
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (pix % tile_size).astype(jnp.float32)
    py = (pix // tile_size).astype(jnp.float32)
    ones_p = jnp.ones((p, 1), jnp.float32)
    u_mat = jnp.concatenate(
        [ones_p, px, py, px * px, py * py, px * py,
         jnp.zeros((p, 2), jnp.float32)], axis=1)

    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (kc, kc), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (kc, kc), 1)
    ).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, kc), 1)

    def dma(slot, c):
        off = pl.multiple_of(base + c * kc, kc)
        return pltpu.make_async_copy(
            fields_hbm.at[:, pl.ds(off, kc)],
            slab_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    maxc = carr_ref.shape[1]

    def chunk_body(state):
        c, carry, acc4 = state

        def _store(ci):
            def f():
                carr_ref[:, ci:ci + 1] = carry
            return f

        jax.lax.switch(jnp.minimum(c, maxc - 1),
                       [_store(i) for i in range(maxc)])

        @pl.when(c + 1 < n_chunks)
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(c % 2, c).wait()
        slab = slab_ref[c % 2]

        mx = slab[0:1, :] - tx * tile_size
        my = slab[1:2, :] - ty * tile_size
        ca = slab[2:3, :]
        cb = slab[3:4, :]
        cc = slab[4:5, :]
        op = slab[8:9, :]

        v_mat = jnp.concatenate(
            [
                -(0.5 * ca * mx * mx + cb * mx * my + 0.5 * cc * my * my),
                ca * mx + cb * my,
                cc * my + cb * mx,
                -0.5 * ca,
                -0.5 * cc,
                -cb,
                jnp.zeros((2, kc), jnp.float32),
            ],
            axis=0,
        )
        power = _dot_exact_bf16x3(u_mat, v_mat)
        power = jnp.minimum(power, 0.0)
        if trans == "stub":
            ex = power * 1.0009765625 + 1.0
            alpha = jnp.minimum(op * ex, alpha_max)
            alpha = jnp.where(alpha < alpha_cutoff, 0.0, alpha)
        elif trans == "bf16":
            ex = jnp.exp(power.astype(jnp.bfloat16)).astype(jnp.float32)
            alpha = jnp.minimum(op * ex, alpha_max)
            alpha = jnp.where(alpha < alpha_cutoff, 0.0, alpha)
        else:
            alpha = jnp.minimum(op * jnp.exp(power), alpha_max)
            alpha = jnp.where(alpha < alpha_cutoff, 0.0, alpha)
        g = c * kc + lane
        alpha = jnp.where(jnp.logical_and(g >= lead, g < total), alpha, 0.0)

        if trans == "stub":
            log1m = -alpha * 1.0009765625
        else:
            log1m = jnp.log1p(-alpha)  # bf16 log1p not legal in Mosaic
        cum = _dot_bf16x2(log1m, tri)
        log_t_incl = carry + cum
        if trans == "stub":
            t_excl = (log_t_incl - log1m) * 1.0009765625 + 1.0
        elif trans == "bf16":
            t_excl = jnp.exp(
                (log_t_incl - log1m).astype(jnp.bfloat16)
            ).astype(jnp.float32)
        else:
            t_excl = jnp.exp(log_t_incl - log1m)
        w = jnp.where(log_t_incl < log_eps, 0.0, alpha * t_excl)

        f4 = jnp.concatenate(
            [slab[5:8, :], jnp.ones((1, kc), jnp.float32)], axis=0)
        acc4 = acc4 + _dot_general_bf16x3(w, f4, (((1,), (1,)), ((), ())))
        carry = carry + cum[:, kc - 1:kc]
        return c + 1, carry, acc4

    def chunk_cond(state):
        c, carry, *_ = state
        return jnp.logical_and(c < n_chunks, jnp.max(carry) >= log_eps)

    init = (
        jnp.int32(0),
        jnp.zeros((p, 1), jnp.float32),
        jnp.zeros((p, 4), jnp.float32),
    )
    c_final, _, acc4 = jax.lax.while_loop(chunk_cond, chunk_body, init)

    @pl.when(c_final < n_chunks)
    def _():
        dma(c_final % 2, c_final).wait()

    out_ref[:, :] = acc4
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (p, maxc), 1)
    carr_ref[:, :] = jnp.where(lane_c < c_final, carr_ref[:, :], -1e30)


def composite_variant(splats, bins, fields_t, config, *, kc, trans,
                      elem16=False):
    ts = config.tile_size
    gx, gy = config.grid_size(W, H)
    num_tiles = gx * gy
    p = ts * ts
    k_cap = max(kc, ((config.max_per_tile + kc - 1) // kc) * kc)
    maxc = k_cap // kc

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    kernel = functools.partial(
        _kernel_v, gx=gx, tile_size=ts, k_cap=k_cap,
        alpha_cutoff=config.alpha_cutoff, alpha_max=config.alpha_max,
        log_eps=float(math.log(config.transmittance_eps)),
        kc=kc, trans=trans, elem16=elem16,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((None, p, 4), lambda g, s, c, t: (g, 0, 0)),
            pl.BlockSpec((None, p, maxc), lambda g, s, c, t: (g, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, F_PAD, kc), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, carries = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, p, 4), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, p, maxc), jnp.float32),
        ),
    )(bins.tile_start,
      jnp.minimum(bins.tile_count, k_cap).astype(jnp.int32),
      tile_ids, fields_t)
    return out, carries


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
    k_cap = k_cap_for(config)
    fields_t = jax.jit(lambda s, b: _sorted_fields_t(s, b, k_cap))(splats, bins)
    splats, bins, fields_t = jax.device_put((splats, bins, fields_t))

    ref_out = None
    for kc, trans in [(128, "f32"), (128, "bf16"), (128, "stub"),
                      (256, "f32"), (256, "bf16"), (512, "bf16")]:
        # fields need pad to k_cap(kc)+kc; current pad = k_cap+128 — re-pad
        kcap_v = max(kc, ((config.max_per_tile + kc - 1) // kc) * kc)
        need = kcap_v + kc
        ft = jnp.pad(fields_t, ((0, 0), (0, max(0, need - 128 - k_cap))))

        def run(carry, kc=kc, trans=trans, ft=ft):
            out, _ = composite_variant(
                splats, bins, ft + carry * 1e-30, config, kc=kc, trans=trans)
            return jnp.sum(out[::7]) * 1e-30

        try:
            t = time_fn_device(run, iters=6)
            # correctness probe vs kc=128/f32
            out, _ = jax.jit(
                lambda ft=ft, kc=kc, trans=trans: composite_variant(
                    splats, bins, ft, config, kc=kc, trans=trans)
            )()
            s = float(jnp.sum(out[:, :, :3]))
            if ref_out is None and trans == "f32" and kc == 128:
                ref_out = out
                err = 0.0
            else:
                err = (float(jnp.max(jnp.abs(out - ref_out)))
                       if ref_out is not None else float("nan"))
            log(f"kc={kc:4d} trans={trans:5s}: {t*1e3:7.2f} ms  "
                f"sum={s:.1f} maxerr={err:.2e}")
        except Exception as e:
            log(f"kc={kc:4d} trans={trans:5s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
