"""Fused Pallas tile-compositing kernel (forward).

Semantically identical to ops.rasterize._composite_chunk (same INRIA alpha
math, cutoffs, and early-termination rule), but as one TPU kernel per pixel
tile with wins XLA can't express:

  * dynamic per-tile work: the splat loop runs ceil(count/KC) chunks, not
    the static max_per_tile cap;
  * early exit: the chunk loop stops as soon as every pixel in the tile has
    transmittance below the 1e-4 threshold — dense scenes touch a fraction
    of their binned splats (the reference's blend unit can never stop early,
    simple_render.ts:454-471);
  * no [K, P] intermediates ever reach HBM.

Layout: pixels live in sublanes (P = tile_size² = 256 rows), splat chunks in
lanes (KC = 128 columns), so per-splat scalars broadcast from [1, KC] rows
and the transmittance recurrence is a lane-axis cumsum. Because log(1-α) ≤ 0
the cumulative log-transmittance is monotone along the splat axis, so the
early-termination mask is a plain comparison — no cummax.

The public entry `rasterize_tiles_pallas` carries a custom VJP whose
backward evaluates the XLA-path compositor's gradient (bitwise-identical
semantics), so the fast kernel is usable inside jax.grad today; a handwritten
back-to-front backward kernel is the planned replacement.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RenderConfig
from ..projection import ProjectedSplats
from ..sort import TileBins

# splat-chunk width (lanes)
KC = 128
NUM_FIELDS = 8  # mean_x, mean_y, conic_a, conic_b, conic_c, r, g, b, (opacity separate)


def _kernel(
    counts_ref,            # SMEM [T] int32 (scalar prefetch)
    fields_ref,            # VMEM [9, K] f32: mx, my, ca, cb, cc, r, g, b, opac
    out_ref,               # VMEM [P, 4] f32
    *,
    gx: int,
    tile_size: int,
    k_cap: int,
    alpha_cutoff: float,
    alpha_max: float,
    log_eps: float,
):
    t = pl.program_id(0)
    p = tile_size * tile_size

    count = jnp.minimum(counts_ref[t], k_cap)
    n_chunks = pl.cdiv(count, KC)

    tx = (t % gx).astype(jnp.float32)
    ty = (t // gx).astype(jnp.float32)
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = tx * tile_size + (pix % tile_size).astype(jnp.float32)
    py = ty * tile_size + (pix // tile_size).astype(jnp.float32)

    # Lane-axis inclusive cumsum as an MXU matmul with an upper-triangular
    # ones matrix (Mosaic has no native cumsum; one [P,KC]x[KC,KC] f32
    # matmul per chunk is effectively free on the MXU).
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 1)
    ).astype(jnp.float32)

    def chunk_body(state):
        c, carry, r_acc, g_acc, b_acc, a_acc = state
        off = c * KC
        mx = fields_ref[0:1, pl.ds(off, KC)]
        my = fields_ref[1:2, pl.ds(off, KC)]
        ca = fields_ref[2:3, pl.ds(off, KC)]
        cb = fields_ref[3:4, pl.ds(off, KC)]
        cc = fields_ref[4:5, pl.ds(off, KC)]
        fr = fields_ref[5:6, pl.ds(off, KC)]
        fg = fields_ref[6:7, pl.ds(off, KC)]
        fb = fields_ref[7:8, pl.ds(off, KC)]
        op = fields_ref[8:9, pl.ds(off, KC)]

        dx = px - mx                      # [P, KC]
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        power = jnp.minimum(power, 0.0)
        alpha = jnp.minimum(op * jnp.exp(power), alpha_max)
        alpha = jnp.where(alpha < alpha_cutoff, 0.0, alpha)

        log1m = jnp.log1p(-alpha)
        cum = jnp.dot(log1m, tri, preferred_element_type=jnp.float32)
        # inclusive cumsum along lanes, monotone ↓
        log_t_incl = carry + cum
        t_excl = jnp.exp(log_t_incl - log1m)
        w = jnp.where(log_t_incl < log_eps, 0.0, alpha * t_excl)

        r_acc = r_acc + jnp.sum(w * fr, axis=1, keepdims=True)
        g_acc = g_acc + jnp.sum(w * fg, axis=1, keepdims=True)
        b_acc = b_acc + jnp.sum(w * fb, axis=1, keepdims=True)
        a_acc = a_acc + jnp.sum(w, axis=1, keepdims=True)
        carry = carry + cum[:, KC - 1 : KC]
        return c + 1, carry, r_acc, g_acc, b_acc, a_acc

    def chunk_cond(state):
        c, carry, *_ = state
        return jnp.logical_and(c < n_chunks, jnp.max(carry) >= log_eps)

    zeros = jnp.zeros((p, 1), jnp.float32)
    init = (jnp.int32(0), zeros, zeros, zeros, zeros, zeros)
    _, _, r_acc, g_acc, b_acc, a_acc = jax.lax.while_loop(
        chunk_cond, chunk_body, init
    )
    out_ref[:, :] = jnp.concatenate([r_acc, g_acc, b_acc, a_acc], axis=1)


def _gather_fields(
    splats: ProjectedSplats, bins: TileBins, k_cap: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pre-gather per-tile splat slabs → (fields [T, 9, K], counts [T])."""
    m = bins.sorted_gidx.shape[0]
    t_count = bins.tile_count.shape[0]
    k = jnp.arange(k_cap, dtype=jnp.int32)
    pair_idx = jnp.clip(bins.tile_start[:, None] + k[None, :], 0, m - 1)
    gidx = bins.sorted_gidx[pair_idx]                       # [T, K]
    live = k[None, :] < jnp.minimum(bins.tile_count, k_cap)[:, None]

    opac = jnp.where(live, splats.opacity[gidx], 0.0)
    fields = jnp.stack(
        [
            splats.mean2d[gidx, 0],
            splats.mean2d[gidx, 1],
            splats.conic[gidx, 0],
            splats.conic[gidx, 1],
            splats.conic[gidx, 2],
            splats.rgb[gidx, 0],
            splats.rgb[gidx, 1],
            splats.rgb[gidx, 2],
            opac,
        ],
        axis=1,
    )  # [T, 9, K]
    counts = jnp.minimum(bins.tile_count, k_cap).astype(jnp.int32)
    return fields, counts


def composite_tiles_pallas(
    splats: ProjectedSplats,
    bins: TileBins,
    width: int,
    height: int,
    config: RenderConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """All tiles, row-major → [T, P, 4] (rgb + alpha)."""
    ts = config.tile_size
    gx, gy = config.grid_size(width, height)
    num_tiles = gx * gy
    p = ts * ts
    k_cap = max(KC, ((config.max_per_tile + KC - 1) // KC) * KC)

    fields, counts = _gather_fields(splats, bins, k_cap)

    kernel = functools.partial(
        _kernel,
        gx=gx,
        tile_size=ts,
        k_cap=k_cap,
        alpha_cutoff=config.alpha_cutoff,
        alpha_max=config.alpha_max,
        log_eps=float(math.log(config.transmittance_eps)),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((None, 9, k_cap), lambda t, counts: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, p, 4), lambda t, counts: (t, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, p, 4), jnp.float32),
        interpret=interpret,
    )(counts, fields)
    return out


def _forward(splats, bins, width, height, config, interpret=False):
    from ..rasterize import assemble_image

    ts = config.tile_size
    gx, gy = config.grid_size(width, height)
    tiles = composite_tiles_pallas(splats, bins, width, height, config,
                                   interpret=interpret)
    out = assemble_image(tiles.reshape(-1, ts, ts, 4), width, height, gx, gy)
    return out[..., :3], out[..., 3]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def rasterize_tiles_pallas(splats, bins, width, height, config,
                           interpret=False):
    """Pallas-fused equivalent of ops.rasterize.rasterize_tiles.

    Returns (rgb [H, W, 3], alpha [H, W]). Differentiable: the backward pass
    currently evaluates the XLA compositor's VJP (identical math).
    """
    return _forward(splats, bins, width, height, config, interpret)


def _fwd(splats, bins, width, height, config, interpret=False):
    out = _forward(splats, bins, width, height, config, interpret)
    return out, (splats, bins)


def _bwd(width, height, config, interpret, residuals, cotangent):
    from ..rasterize import rasterize_tiles

    splats, bins = residuals
    _, vjp_fn = jax.vjp(
        lambda s: rasterize_tiles(s, bins, width, height, config), splats
    )
    (d_splats,) = vjp_fn(cotangent)
    return d_splats, None


rasterize_tiles_pallas.defvjp(_fwd, _bwd)
