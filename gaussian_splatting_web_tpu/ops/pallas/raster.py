"""Fused Pallas tile-compositing kernel.

Semantically identical to ops.rasterize._composite_chunk (same INRIA alpha
math, cutoffs, and early-termination rule), re-architected around what
profiling showed actually dominates on TPU — the padded per-tile gather:

  * splat fields arrive in (tile, depth)-sorted field-major arrays
    (one [8, M] u32 array: bitcast mx, my + four bf16-pair packs, or
    [8, M] + [4, M] f32 in the exact pack_fields=False mode) so a tile's
    splat list is a contiguous slab. In the fused entry (rasterize_pallas)
    they are carried through the binning sort as payloads — cheaper than
    the row gathers they replace (~38 ms at 3M pairs,
    pack_sorted_fields_split), but NOT free: ~3.9 ms per payload array at
    the 1M bench (tools/profile_payloads.py), hence the bf16 packing
    (config.pack_fields) that carries 7 fields in 4 u32 payloads;
  * each grid step (one 16×16 pixel tile) streams its slab through VMEM in
    [16, KC=128] chunks with double-buffered async DMA at a *dynamic*
    offset — no [tiles × max_per_tile] gather or padding anywhere;
  * the chunk loop runs ceil(count/KC) iterations and stops early once every
    pixel's transmittance is below the 1e-4 threshold (the reference's blend
    unit can never stop early, simple_render.ts:454-471);
  * the FLOPs live on the MXU, not the VPU: the Gaussian quadratic
    -½ dᵀΣ⁻¹d is a rank-6 bilinear form in the pixel coordinates, evaluated
    as one [P,8]×[8,KC] matmul in tile-local coordinates (local coords keep
    the cancelling terms O(splat extent), so f32 matmul error stays ~1e-5
    where alpha matters); the transmittance recurrence is a lane-axis cumsum
    realized as a [P,KC]×[KC,KC] upper-triangular matmul (Mosaic has no
    native cumsum; log(1-α) ≤ 0 makes the cumulative log-transmittance
    monotone, so early-termination masking is a plain comparison); and the
    rgba accumulation is a [P,KC]×[KC,4] contraction. The VPU only sees the
    three transcendentals (exp, log1p, exp) and a few masks.

Layout: pixels in sublanes (P = 256 rows), splat chunk in lanes (KC = 128
columns); per-splat scalars broadcast from [1, KC] slab rows.

The public entry `rasterize_tiles_pallas` carries a custom VJP whose
backward is the fused kernel in raster_bwd (single back-to-front sweep that
RECONSTRUCTS the per-chunk transmittance from the stored final carry by
subtracting each chunk's log(1-α) column sum — the forward stores only
[G, P] finals + a chunk count, not O(maxc) per-chunk carries, and neither
kernel needs the single-lane `lax.switch` stores that round-2 profiling
flagged) plus one XLA segment-sum.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RenderConfig
from ..projection import ProjectedSplats
from ..sort import TileBins

KC = 256          # splat-chunk width (lanes per slab DMA / matmul block);
                  # measured on v5e at 1M splats/1080p: 256 → 24.2 ms vs
                  # 31.4 ms at 128 (fewer chunk-loop fixed costs) and
                  # 51 ms at 512 (the [KC,KC] cumsum matmul grows as KC²
                  # per splat); results exact vs 128 to 8e-6
F_PAD = 16        # gradient rows in the backward pair array (2 sublane tiles)


def _dot_bf16x2(x, m):
    """x @ m in ~f32 precision using two bf16 MXU passes.

    This TPU stack compiles with --xla_allow_excess_precision=true, under
    which a default-precision f32 matmul in Mosaic lowers to a SINGLE bf16
    pass (measured 0.27 abs error) and precision='highest' costs ~6 passes.
    Splitting x into hi + lo bf16 parts (m must be exact in bf16 — here 0/1
    triangular masks) gives ~2^-17 relative error in 2 passes.
    """
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    mb = m.astype(jnp.bfloat16)
    return (
        jnp.dot(hi, mb, preferred_element_type=jnp.float32)
        + jnp.dot(lo, mb, preferred_element_type=jnp.float32)
    )


def _dot_exact_bf16x3(u, v):
    """u @ v with u exactly bf16-representable (small integers): split v
    into three bf16 components — 3 bf16 passes, ~2^-24 relative error
    (v spans large magnitudes here, so two components are not enough)."""
    ub = u.astype(jnp.bfloat16)
    v1 = v.astype(jnp.bfloat16)
    r1 = v - v1.astype(jnp.float32)
    v2 = r1.astype(jnp.bfloat16)
    v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
    return (
        jnp.dot(ub, v1, preferred_element_type=jnp.float32)
        + jnp.dot(ub, v2, preferred_element_type=jnp.float32)
        + jnp.dot(ub, v3, preferred_element_type=jnp.float32)
    )


def _dot_general_bf16x3(x, y, dims):
    """dot_general with both operands inexact: hi·hi + hi·lo + lo·hi
    (the lo·lo term is ~2^-32 relative — dropped). 3 bf16 passes."""
    import functools as _ft

    hx = x.astype(jnp.bfloat16)
    lx = (x - hx.astype(jnp.float32)).astype(jnp.bfloat16)
    hy = y.astype(jnp.bfloat16)
    ly = (y - hy.astype(jnp.float32)).astype(jnp.bfloat16)
    dg = _ft.partial(
        jax.lax.dot_general,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    return dg(hx, hy) + dg(hx, ly) + dg(lx, hy)


# The kernel grid shape knobs (tiles per grid step, early exit) live in
# RenderConfig (config.r_tiles / r_tiles_bwd / early_exit) as static fields
# so tools sweep them per call instead of editing module globals.

KB = 128          # cumsum block width (one MXU/lane-register tile)
LOG_PAD = -1e4    # constant-row penalty for lanes outside a tile's
                  # segment window: power' ≤ LOG_PAD + O(10²) stays far
                  # below log(alpha_cutoff) ≈ −5.5, so the cutoff compare
                  # kills the lane. Finite (NOT −inf) so the bf16x3
                  # operand split never produces inf − inf = NaN.


def _tri_block():
    """[KB, KB] upper-triangular 0/1 mask (exact in bf16)."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 1)
    ).astype(jnp.float32)


def _cumsum_tri_blocked(x, tri_b):
    """Inclusive lane cumsum of [M, KC] as TWO [KB, KB] triangular bf16x2
    matmuls plus a block-offset add — half the MXU MACs of the single
    [KC, KC] pass it replaces (2·KB² vs KC² per row per bf16 pass).
    `tri_b` is `_tri_block()`, hoisted by the caller."""
    a = x[:, :KB]
    b = x[:, KB:]
    ca = _dot_bf16x2(a, tri_b)
    cb = _dot_bf16x2(b, tri_b)
    return jnp.concatenate([ca, cb + ca[:, KB - 1:KB]], axis=1)


def _suffix_tri_blocked(x, tsl_b):
    """Strict-suffix lane sum s[i] = Σ_{j>i} x[j] of [M, KC], blocked the
    same way (backward pass). `tsl_b` is the strict-lower [KB, KB] mask."""
    a = x[:, :KB]
    b = x[:, KB:]
    sb = _dot_bf16x2(b, tsl_b)
    sum_b = jnp.sum(b, axis=1, keepdims=True)
    sa = _dot_bf16x2(a, tsl_b) + sum_b
    return jnp.concatenate([sa, sb], axis=1)


def _bitcast_f32(u):
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _unpack_hi(u):
    """Top bf16 half of a u32 pack → f32 (exact; bf16 is f32's top half)."""
    return _bitcast_f32(u & jnp.uint32(0xFFFF0000))


def _unpack_lo(u):
    return _bitcast_f32(u << 16)


def _decode_slab(slab, op4_row, packed: bool, mean16: bool, tx, ty):
    """(mx, my, ca, cb, cc, rgb_rows [3, KC], op_row [1, KC]) in tile-
    LOCAL coordinates from one resident slab chunk.

    packed+mean16: row 0 is the u16-pair tile-relative mean
    (ops.sort.pack_mean16_rel) — already tile-local, no origin subtract —
    and the 4 bf16 packs follow in rows 1-4. packed: rows 0-1 are bitcast
    f32 global means, packs in rows 2-5. unpacked: slab is the [8, KC]
    f32 array, op4_row the opacity row of the f4 slab."""
    from ..sort import MEAN16_OFF, MEAN16_SCALE

    if packed:
        if mean16:
            # u32 → i32 → f32: Mosaic has no u32→f32 cast; both 16-bit
            # halves fit int32 exactly
            u = slab[0:1, :]
            mx = ((u & jnp.uint32(0xFFFF)).astype(jnp.int32)
                  .astype(jnp.float32) * (1.0 / MEAN16_SCALE) - MEAN16_OFF)
            my = ((u >> 16).astype(jnp.int32)
                  .astype(jnp.float32) * (1.0 / MEAN16_SCALE) - MEAN16_OFF)
            o = 1
        else:
            mx = _bitcast_f32(slab[0:1, :]) - tx
            my = _bitcast_f32(slab[1:2, :]) - ty
            o = 2
        ca = _unpack_hi(slab[o:o + 1, :])
        cb = _unpack_lo(slab[o:o + 1, :])
        cc = _unpack_hi(slab[o + 1:o + 2, :])
        op_row = _unpack_lo(slab[o + 1:o + 2, :])
        rgb_rows = jnp.concatenate([
            _unpack_hi(slab[o + 2:o + 3, :]),
            _unpack_lo(slab[o + 2:o + 3, :]),
            _unpack_hi(slab[o + 3:o + 4, :]),
        ], axis=0)                            # [3, KC]
    else:
        mx = slab[0:1, :] - tx
        my = slab[1:2, :] - ty
        ca = slab[2:3, :]
        cb = slab[3:4, :]
        cc = slab[4:5, :]
        op_row = op4_row
        rgb_rows = slab[5:8, :]
    return mx, my, ca, cb, cc, rgb_rows, op_row


def _kernel(
    starts_ref,            # SMEM [T] int32 (scalar prefetch)
    counts_ref,            # SMEM [T] int32 (scalar prefetch)
    tiles_ref,             # SMEM [G_pad] int32 (scalar prefetch): grid→tile
    *refs,                 # packed: f6_hbm [6, M_pad] u32 (bitcast mx, my,
                           #   ca|cb, cc|op, r|g, b|0), out, fin, slab6,
                           #   sem — ONE slab DMA per chunk per tile.
                           # unpacked: f8_hbm [8, M_pad] f32
                           #   (mx,my,ca,cb,cc,r,g,b), f4_hbm [4, M_pad]
                           #   f32 (op,0,0,0), out, fin, slab8, slab4, sem
                           # fin [R, P, 2]: lane 0 = final log-transmittance
                           # carry, lane 1 = processed-chunk count (f32,
                           # group-level) — all the backward needs to
                           # reconstruct every chunk's starting carry
    gx: int,
    tile_size: int,
    k_cap: int,
    alpha_cutoff: float,
    alpha_max: float,
    log_eps: float,
    r_tiles: int,
    packed: bool,
    mean16: bool,
    early_exit: bool,
):
    if packed:
        f6_hbm, out_ref, fin_ref, slab6_ref, sem_ref = refs
    else:
        (f8_hbm, f4_hbm, out_ref, fin_ref, slab8_ref, slab4_ref,
         sem_ref) = refs
    p = tile_size * tile_size
    R = r_tiles
    g0 = pl.program_id(0) * R

    # per-tile scalars; every tile in the group walks the slab in lockstep
    # to the group max chunk count (masks zero the out-of-segment lanes)
    ts_f = float(tile_size)
    bases, leads, totals, n_chunks_r, txs, tys = [], [], [], [], [], []
    for r in range(R):
        t = tiles_ref[g0 + r]
        start = starts_ref[t]
        count = jnp.minimum(counts_ref[t], k_cap)
        # DMA offsets must be 128-lane aligned for Mosaic: stream from the
        # aligned base at or before `start` and mask the leading lanes that
        # belong to the previous tile's segment.
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

    # tile-LOCAL pixel coordinates: the Gaussian quadratic is evaluated as a
    # rank-6 bilinear form on the MXU (see chunk_body); local coordinates
    # keep every term O(splat extent), so the f32 matmul cancellation error
    # stays ~1e-5 where alpha matters (global pixel coords would cancel
    # O(focal²)-sized terms)
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (pix % tile_size).astype(jnp.float32)
    py = (pix // tile_size).astype(jnp.float32)
    ones_p = jnp.ones((p, 1), jnp.float32)
    u_mat = jnp.concatenate(
        [ones_p, px, py, px * px, py * py, px * py,
         jnp.zeros((p, 2), jnp.float32)],
        axis=1,
    )                                   # [P, 8]

    # lane-axis inclusive cumsum as blocked MXU matmuls (a Hillis-Steele
    # lane scan was measured slower end to end — commit b7b7b3d; the
    # round-5 blocking halves the tri MACs, see _cumsum_tri_blocked)
    tri_b = _tri_block()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1)
    log_cut = float(math.log(alpha_cutoff))

    if packed:
        def dmas(slot, r, c):
            off = pl.multiple_of(bases[r] + c * KC, KC)
            return [pltpu.make_async_copy(
                f6_hbm.at[:, pl.ds(off, KC)],
                slab6_ref.at[slot, r],
                sem_ref.at[slot, r, 0],
            )]
    else:
        def dmas(slot, r, c):
            off = pl.multiple_of(bases[r] + c * KC, KC)
            return [
                pltpu.make_async_copy(
                    f8_hbm.at[:, pl.ds(off, KC)],
                    slab8_ref.at[slot, r],
                    sem_ref.at[slot, r, 0],
                ),
                pltpu.make_async_copy(
                    f4_hbm.at[:, pl.ds(off, KC)],
                    slab4_ref.at[slot, r],
                    sem_ref.at[slot, r, 1],
                ),
            ]

    def dma_start(slot, c):
        for r in range(R):
            for d in dmas(slot, r, c):
                d.start()

    def dma_wait(slot, c):
        for r in range(R):
            for d in dmas(slot, r, c):
                d.wait()

    @pl.when(max_chunks > 0)
    def _():
        dma_start(0, 0)

    def chunk_body(state):
        c, carry, acc4 = state            # carry [R·P, 1], acc4 [R·P, 4]

        @pl.when(c + 1 < max_chunks)
        def _():
            dma_start((c + 1) % 2, c + 1)

        dma_wait(c % 2, c)

        # Gaussian falloff as one MXU matmul per tile: power(px,py) is
        # quadratic in the pixel coordinates, so power = U[P,8] @ V[8,KC]
        # with V = [log(op) − (½A mx²+B mx my+½C my²); A mx+B my;
        # C my+B mx; -½A; -½C; -B]; the R results stack → [R·P, KC].
        # log(opacity) AND the segment-window mask are folded into the
        # constant row (round-5 VPU cut): alpha = exp(power) directly, the
        # 1/255 cutoff becomes a compare on power, and the [R·P, KC] op
        # broadcast + the two [R·P, KC] window compares vanish — all the
        # masking work is [1, KC] per tile.
        powers = []
        f4s = []
        g = c * KC + lane                                 # [1, KC]
        for r in range(R):
            if packed:
                slab = slab6_ref[c % 2, r]            # [8, KC] u32
                op4 = None
            else:
                slab = slab8_ref[c % 2, r]            # [8, KC]
                op4 = slab4_ref[c % 2, r][0:1, :]
            mx, my, ca, cb, cc, rgb_rows, op_row = _decode_slab(
                slab, op4, packed, mean16, txs[r], tys[r])
            # [1, KC] window + log-opacity constant row (lanes outside the
            # [lead, lead+count) segment get LOG_PAD → alpha 0; this also
            # masks chunks past a short tile's segment while the group
            # runs to the group max)
            win = jnp.logical_and(g >= leads[r], g < totals[r])
            row0 = jnp.where(
                win, jnp.log(jnp.maximum(op_row, 1e-30)), LOG_PAD)
            v_mat = jnp.concatenate(
                [
                    row0 - (0.5 * ca * mx * mx + cb * mx * my
                            + 0.5 * cc * my * my),
                    ca * mx + cb * my,
                    cc * my + cb * mx,
                    -0.5 * ca,
                    -0.5 * cc,
                    -cb,
                    jnp.zeros((2, KC), jnp.float32),
                ],
                axis=0,
            )                              # [8, KC]
            # u_mat entries are small integers (exact in bf16)
            powers.append(_dot_exact_bf16x3(u_mat, v_mat))
            f4s.append(jnp.concatenate(
                [rgb_rows, jnp.ones((1, KC), jnp.float32)], axis=0
            ))                             # rows (r, g, b, 1)
        power = jnp.concatenate(powers, axis=0)          # [R·P, KC]

        alpha = jnp.where(
            power >= log_cut,
            jnp.minimum(jnp.exp(power), alpha_max), 0.0)

        log1m = jnp.log1p(-alpha)
        cum = _cumsum_tri_blocked(log1m, tri_b)          # [R·P, KC]
        log_t_incl = carry + cum          # monotone ↓ along lanes
        t_excl = jnp.exp(log_t_incl - log1m)
        w = jnp.where(log_t_incl < log_eps, 0.0, alpha * t_excl)

        # color/alpha accumulation: per tile one [P,KC]×[KC,4] contraction
        acc4 = acc4 + jnp.concatenate(
            [
                _dot_general_bf16x3(
                    w[r * p:(r + 1) * p], f4s[r], (((1,), (1,)), ((), ()))
                )
                for r in range(R)
            ],
            axis=0,
        )                                  # [R·P, 4]
        carry = carry + cum[:, KC - 1 : KC]
        return c + 1, carry, acc4

    init = (
        jnp.int32(0),
        jnp.zeros((R * p, 1), jnp.float32),
        jnp.zeros((R * p, 4), jnp.float32),
    )
    if early_exit:
        def chunk_cond(state):
            c, carry, *_ = state
            # the max(carry) reduce costs a vector→scalar sync per chunk;
            # it pays for itself on saturating (opaque, deep) tiles and is
            # bounded overhead at ~1-2 chunks/tile (tools/kexp2.py)
            return jnp.logical_and(c < max_chunks,
                                   jnp.max(carry) >= log_eps)

        c_final, carry, acc4 = jax.lax.while_loop(
            chunk_cond, chunk_body, init)

        # drain the in-flight prefetch if the loop exited early
        @pl.when(c_final < max_chunks)
        def _():
            dma_wait(c_final % 2, c_final)
    else:
        c_final, carry, acc4 = jax.lax.fori_loop(
            0, max_chunks, lambda i, s: chunk_body(s), init)

    out_ref[:, :, :] = acc4.reshape(R, p, 4)
    # the backward reconstructs each chunk's starting carry from the final
    # carry by subtracting per-chunk log(1-α) column sums; it only needs
    # the finals plus how many chunks this group processed
    fin_ref[:, :, 0:1] = carry.reshape(R, p, 1)
    fin_ref[:, :, 1:2] = jnp.broadcast_to(
        c_final.astype(jnp.float32), (R, p, 1))


def _sorted_fields_t(
    splats: ProjectedSplats, bins: TileBins, k_cap: int,
    quantize: bool = False, mean16: tuple | None = None,
) -> tuple[jnp.ndarray, ...]:
    """Field-major sorted splat arrays for slab DMA: a 1-tuple
    ([6, M+pad] u32 — bitcast mx, my + 4 bf16-pair packs) when the bins
    carry packed payloads (config.pack_fields), else ([8, M+pad] f32,
    [4, M+pad] f32).

    Fast path: bins carries the fields as sort payloads
    (bin_splats(carry_fields=True)) — assembling the slab arrays is a pad +
    stack, no gather at all. Fallback: the split-row gather
    (rasterize.pack_sorted_fields_split), ~38 ms at 3M pairs on v5e vs ~2
    for the payload path.
    """
    pad = k_cap + KC
    if bins.sorted_fields is not None and bins.fields_packed:
        # concat of [1, M]+[1, pad] rows, NOT pad+stack: measured 1.05 ms
        # vs 4.24 ms at the 1M bench (tools/sortexp.py) — XLA lowers the
        # row-concat to plain copies while pad+stack relayouts
        m = bins.sorted_fields[0].shape[0]
        zrow = jnp.zeros((1, pad), jnp.uint32)
        if bins.mean_packed:
            # 5 u32 payload rows: mxy u16-pair, then the 4 bf16 packs
            rows = list(bins.sorted_fields[:5])
        else:
            rows = [jax.lax.bitcast_convert_type(bins.sorted_fields[0],
                                                 jnp.uint32),
                    jax.lax.bitcast_convert_type(bins.sorted_fields[1],
                                                 jnp.uint32)]
            rows += list(bins.sorted_fields[2:6])
        # pad rows to 8: Mosaic requires DMA slice leading dims aligned
        # to the (8, 128) sublane tiling
        f6 = jnp.concatenate(
            [jnp.concatenate([r[None, :], zrow], axis=1) for r in rows]
            + [jnp.zeros((8 - len(rows), m + pad), jnp.uint32)],
            axis=0,
        )                                                     # [8, M+pad]
        return (f6,)
    if bins.sorted_fields is not None:
        fs = [jnp.pad(f, (0, pad)) for f in bins.sorted_fields]
        f8_t = jnp.stack(fs[:8], axis=0)                      # [8, M+pad]
        z = jnp.zeros_like(fs[8])
        f4_t = jnp.stack([fs[8], z, z, z], axis=0)            # [4, M+pad]
        return f8_t, f4_t

    from ..rasterize import pack_sorted_fields_split

    f8, f4 = pack_sorted_fields_split(
        splats, bins, pad=k_cap + KC, quantize=quantize,
        mean16=mean16 if quantize else None)
    return f8.T, f4.T


def k_cap_for(config: RenderConfig) -> int:
    return max(KC, ((config.max_per_tile + KC - 1) // KC) * KC)


def composite_tiles_pallas(
    splats: ProjectedSplats,
    bins: TileBins,
    width: int,
    height: int,
    config: RenderConfig,
    interpret: bool = False,
    fields_t: jnp.ndarray | None = None,
    tile_ids: jnp.ndarray | None = None,
    r_tiles: int | None = None,
):
    """Composite `tile_ids` (default: all tiles row-major) →
    (tiles [G, P, 4], fin [G, P, 2], fields_t). `fin` holds each pixel's
    final log-transmittance (lane 0) and the group's processed-chunk count
    (lane 1); the backward kernel reconstructs per-chunk carries from it."""
    ts = config.tile_size
    gx, gy = config.grid_size(width, height)
    num_tiles = gx * gy
    p = ts * ts
    k_cap = k_cap_for(config)

    if tile_ids is None:
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    grid_n = tile_ids.shape[0]
    if fields_t is None:
        fields_t = _sorted_fields_t(
            splats, bins, k_cap, quantize=config.pack_fields,
            mean16=((gx, ts) if config.pack_mean16 else None))

    # R tiles per grid step; pad the tile list with the sentinel id
    # num_tiles, whose start/count lookup row is 0 (empty segment) — padding
    # rows compute nothing and are sliced away below
    r = min(r_tiles or config.r_tiles, grid_n)
    n_groups = -(-grid_n // r)
    pad = n_groups * r - grid_n
    tiles_padded = jnp.concatenate(
        [tile_ids.astype(jnp.int32),
         jnp.full((pad,), num_tiles, jnp.int32)]
    )
    starts_s = jnp.concatenate(
        [bins.tile_start, jnp.zeros((1,), bins.tile_start.dtype)])
    counts_s = jnp.concatenate(
        [jnp.minimum(bins.tile_count, k_cap),
         jnp.zeros((1,), bins.tile_count.dtype)]).astype(jnp.int32)

    packed = len(fields_t) == 1
    kernel = functools.partial(
        _kernel,
        gx=gx,
        tile_size=ts,
        k_cap=k_cap,
        alpha_cutoff=config.alpha_cutoff,
        alpha_max=config.alpha_max,
        log_eps=float(math.log(config.transmittance_eps)),
        r_tiles=r,
        packed=packed,
        mean16=packed and bins.mean_packed,
        early_exit=config.early_exit,
    )
    if packed:
        scratch = [
            pltpu.VMEM((2, r, 8, KC), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, r, 1)),
        ]
    else:
        scratch = [
            pltpu.VMEM((2, r, 8, KC), jnp.float32),
            pltpu.VMEM((2, r, 4, KC), jnp.float32),
            pltpu.SemaphoreType.DMA((2, r, 2)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(fields_t),
        out_specs=(
            pl.BlockSpec((r, p, 4), lambda g, starts, counts, tiles: (g, 0, 0)),
            pl.BlockSpec((r, p, 2),
                         lambda g, starts, counts, tiles: (g, 0, 0)),
        ),
        scratch_shapes=scratch,
    )
    out, fin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_groups * r, p, 4), jnp.float32),
            jax.ShapeDtypeStruct((n_groups * r, p, 2), jnp.float32),
        ),
        interpret=interpret,
    )(starts_s, counts_s, tiles_padded, *fields_t)
    return out[:grid_n], fin[:grid_n], fields_t


def _forward(splats, bins, width, height, config, interpret=False):
    # Tiles run in row-major order. A count-sorted grouping order (argsort
    # of tile_count, so R-tile groups walk lockstep over similar slab
    # lengths) was measured on v5e at the 1M/1080p bench and REJECTED: the
    # kernel time is unchanged (row-major adjacency already correlates
    # counts) while the order argsort + runtime-index tile permutation add
    # ~17 ms to the full forward (tools/profile_fullfwd.py).
    from ..rasterize import assemble_image

    ts = config.tile_size
    gx, gy = config.grid_size(width, height)
    tiles, fin, fields_t = composite_tiles_pallas(
        splats, bins, width, height, config, interpret=interpret,
    )
    out = assemble_image(
        tiles.reshape(-1, ts, ts, 4), width, height, gx, gy
    )
    return (out[..., :3], out[..., 3]), fin, fields_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def rasterize_tiles_pallas(splats, bins, width, height, config,
                           interpret=False):
    """Pallas-fused equivalent of ops.rasterize.rasterize_tiles.

    Returns (rgb [H, W, 3], alpha [H, W]). Differentiable: the backward is
    the fused Pallas kernel in raster_bwd (same math, back-to-front sweep)
    plus one segment-sum folding pair gradients onto splats.
    """
    out, _, _ = _forward(splats, bins, width, height, config, interpret)
    return out


def _fwd(splats, bins, width, height, config, interpret=False):
    out, fin, fields_t = _forward(splats, bins, width, height, config,
                                  interpret)
    return out, (splats, bins, fin, fields_t)


def _cot_to_tiles(cotangent, width, height, config):
    """(d_rgb [H,W,3], d_alpha [H,W]) → [T, P, 4] tile-major cotangents
    (transpose of assemble_image + crop)."""
    d_rgb, d_alpha = cotangent
    ts = config.tile_size
    gx, gy = config.grid_size(width, height)
    cot = jnp.concatenate([d_rgb, d_alpha[..., None]], axis=-1)
    cot = jnp.pad(
        cot, ((0, gy * ts - height), (0, gx * ts - width), (0, 0))
    )
    cot = cot.reshape(gy, ts, gx, ts, 4).transpose(0, 2, 1, 3, 4)
    return cot.reshape(gx * gy, ts * ts, 4)


def _fold_pair_grads(dpairs: jnp.ndarray, bins: TileBins, n: int,
                     config: RenderConfig) -> jnp.ndarray:
    """Fold the (tile,depth)-sorted pair gradients [F_PAD, M_pad] onto
    splats → [N, 9] (d_mean2d ×2, d_conic ×3, d_rgb ×3, d_opacity).

    Measured v5e alternatives at the 1M/1080p bench (tools/profile_r2.py):
    scatter-add `segment_sum` over unsorted gaussian ids 239 ms; the round-1
    invert-the-permutation fold (u32 sort of (slot, position) + dense row
    gathers at 5M slot positions) 65.5 ms — the gathers dominate. The
    cheapest fold is to SORT THE GRADIENTS BACK: key = bins.sorted_slot
    (the position→slot permutation the binning sort recorded), payloads =
    the gradient rows padded to n_slots. One single-key sort yields
    gradients in DENSE slot order — every slot exactly once — so the
    reduction onto splats is a static reshape-sum over the [N, dₐ] tier-A
    grid plus a tiny segment-sum over the nb_cap compacted big splats
    (tier B). No gathers anywhere. Pairs truncated by gather_cap_factor
    carry zero gradient (their slots pad the key array's tail), and lanes
    the kernel masked dead wrote zeros, so density is exact.

    Sort payloads cost ~3.9 ms each at the bench scale
    (tools/profile_payloads.py), so with config.pack_grads the 9 gradient
    rows ride bf16-packed in 5 u32 payloads (pack_bf16_pair): ~0.2%
    rounding per pair gradient, zero-mean, well inside the 1% parity gate.
    """
    from ..sort import pack_bf16_pair, unpack_bf16_pair

    cap = bins.pair_cap                    # truncated pair count
    n_slots = bins.sorted_slot.shape[0]
    d_a = bins.tier_a_width
    pad = n_slots - cap

    # the backward kernel gives each in-group tile its own F_PAD row group
    # (hazard-free in-group RMW); a pair belongs to exactly one tile, so
    # summing groups recovers its gradient
    n_groups = dpairs.shape[0] // F_PAD
    rows = tuple(
        jnp.concatenate([
            sum(dpairs[g * F_PAD + k, :cap] for g in range(n_groups)),
            jnp.zeros((pad,), dpairs.dtype),
        ])
        for k in range(9)
    )
    if config.pack_grads:
        z = jnp.zeros_like(rows[8])
        packs = (
            pack_bf16_pair(rows[0], rows[1]),
            pack_bf16_pair(rows[2], rows[3]),
            pack_bf16_pair(rows[4], rows[5]),
            pack_bf16_pair(rows[6], rows[7]),
            pack_bf16_pair(rows[8], z),
        )
        sorted_packs = jax.lax.sort(
            (bins.sorted_slot.astype(jnp.uint32),) + packs, num_keys=1
        )[1:]
        sorted_back = []
        for u in sorted_packs:
            hi, lo = unpack_bf16_pair(u)
            sorted_back += [hi, lo]
        sorted_back = sorted_back[:9]
    else:
        sorted_back = jax.lax.sort(
            (bins.sorted_slot.astype(jnp.uint32),) + rows, num_keys=1
        )[1:]
    # slot-major tier grids ([d, n], see candidate_slot_tiles): a splat's
    # slots are strided, so the per-splat reduction sums axis 0
    seg = jnp.stack(
        [r[: n * d_a].reshape(d_a, n).sum(axis=0) for r in sorted_back],
        axis=1,
    )                                                          # [N, 9]
    if bins.comp_widths:
        # Compacted-tier fold WITHOUT a scatter-add (a 300k-row
        # segment_sum costs 18 ms on v5e, tools/sortexp2.py): the tiers'
        # row order IS the class-sort permutation, so place each tier's
        # per-splat sums into one perm-order buffer at its class offset
        # (ascending-offset writes: a tier's zero padding rows may overlap
        # the NEXT tier's block start and are overwritten by its real
        # rows), invert the permutation with one small sort, and bring
        # everything to gaussian order with a single padded row gather.
        off = n * d_a
        buf = jnp.zeros((bins.comp_perm.shape[0], 16), jnp.float32)
        for j, (w_j, idx_j) in enumerate(
                zip(bins.comp_widths, bins.comp_idx)):
            cap_j = idx_j.shape[0]
            seg_j = jnp.stack(
                [r[off:off + cap_j * w_j].reshape(w_j, cap_j).sum(axis=0)
                 for r in sorted_back]
                + [jnp.zeros((cap_j,), jnp.float32)] * 7,
                axis=1,
            )                                                  # [cap_j, 16]
            buf = jax.lax.dynamic_update_slice(
                buf, seg_j, (bins.comp_offsets[j], 0))
            off += cap_j * w_j
        _, inv = jax.lax.sort(
            (bins.comp_perm[:n], jnp.arange(n, dtype=jnp.int32)),
            num_keys=1)
        seg = seg + buf[inv][:, :9]
    return seg


def _bwd(width, height, config, interpret, residuals, cotangent):
    import numpy as np

    from .raster_bwd import backward_pair_grads

    splats, bins, fin, fields_t = residuals
    n = splats.depth.shape[0]

    cot_tiles = _cot_to_tiles(cotangent, width, height, config)
    dpairs = backward_pair_grads(
        fields_t, fin, cot_tiles, bins.tile_start, bins.tile_count,
        width, height, config, interpret=interpret,
    )
    seg = _fold_pair_grads(dpairs, bins, n, config)

    f0 = np.zeros((), jax.dtypes.float0)

    d_splats = ProjectedSplats(
        mean2d=seg[:, 0:2],
        conic=seg[:, 2:5],
        depth=jnp.zeros_like(splats.depth),
        radius=jnp.zeros_like(splats.radius),
        rgb=seg[:, 5:8],
        opacity=seg[:, 8],
        valid=np.zeros(splats.valid.shape, jax.dtypes.float0),
    )
    del f0
    return d_splats, None


rasterize_tiles_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def composite_tiles_subset_pallas(splats, tile_ids, width, height, config,
                                  interpret=False):
    """Differentiable fused compositing of an arbitrary tile subset →
    [len(tile_ids), P, 4] (rgba, premultiplied).

    The shard_map tile-sharded paths call this per device with the tiles it
    owns (parallel.render_sharded / train_sharded / gaussian_sharded), so
    the fused kernel — not the portable lax.map compositor — runs inside
    the sharded programs on TPU. Binning runs INSIDE this custom-VJP
    boundary with carry_fields=True (same reasoning as rasterize_pallas);
    the backward runs the fused back-to-front kernel over the same tile
    subset and folds pair gradients onto splats (pairs of unowned tiles
    simply carry zero gradient rows). tile_ids receives no cotangent.
    """
    out, _ = _forward_subset(splats, tile_ids, width, height, config,
                             interpret)
    return out


def _forward_subset(splats, tile_ids, width, height, config, interpret):
    from ..sort import bin_splats

    bins = bin_splats(splats, width, height, config, carry_fields=True)
    tiles, fin, fields_t = composite_tiles_pallas(
        splats, bins, width, height, config, interpret=interpret,
        tile_ids=tile_ids,
    )
    return tiles, (splats, bins, fin, fields_t, tile_ids)


def _fwd_subset(splats, tile_ids, width, height, config, interpret=False):
    return _forward_subset(splats, tile_ids, width, height, config,
                           interpret)


def _bwd_subset(width, height, config, interpret, residuals, cot_tiles):
    import numpy as np

    from .raster_bwd import backward_pair_grads

    splats, bins, fin, fields_t, tile_ids = residuals
    n = splats.depth.shape[0]
    dpairs = backward_pair_grads(
        fields_t, fin, cot_tiles, bins.tile_start, bins.tile_count,
        width, height, config, interpret=interpret, tile_ids=tile_ids,
    )
    seg = _fold_pair_grads(dpairs, bins, n, config)
    d_splats = ProjectedSplats(
        mean2d=seg[:, 0:2],
        conic=seg[:, 2:5],
        depth=jnp.zeros_like(splats.depth),
        radius=jnp.zeros_like(splats.radius),
        rgb=seg[:, 5:8],
        opacity=seg[:, 8],
        valid=np.zeros(splats.valid.shape, jax.dtypes.float0),
    )
    return d_splats, None


composite_tiles_subset_pallas.defvjp(_fwd_subset, _bwd_subset)


def _forward_binned(splats, width, height, config, interpret):
    from ..sort import bin_splats

    bins = bin_splats(splats, width, height, config, carry_fields=True)
    out, fin, fields_t = _forward(splats, bins, width, height, config,
                                  interpret)
    stats = {"num_pairs": bins.num_pairs, "overflow": bins.overflow}
    return out + (stats,), (splats, bins, fin, fields_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def rasterize_pallas(splats, width, height, config, interpret=False):
    """Bin + composite in one differentiable op → (rgb, alpha, stats).

    The binning sort runs INSIDE this custom-VJP boundary with
    carry_fields=True: the splat appearance fields ride the sort as
    payloads (free — see bin_splats docstring) instead of being re-gathered
    into pair order afterwards, and XLA AD never sees the sort (its
    transpose would be a 5M-element scatter). The backward is the fused
    back-to-front kernel (raster_bwd) + the sort-inverting fold, exactly as
    for rasterize_tiles_pallas.

    stats = {num_pairs, overflow} (int32; zero cotangent).
    """
    out, _ = _forward_binned(splats, width, height, config, interpret)
    return out


def _fwd_binned(splats, width, height, config, interpret=False):
    return _forward_binned(splats, width, height, config, interpret)


def _bwd_binned(width, height, config, interpret, residuals, cotangent):
    d_rgb, d_alpha, _ = cotangent
    d_splats, _ = _bwd(width, height, config, interpret, residuals,
                       (d_rgb, d_alpha))
    return (d_splats,)


rasterize_pallas.defvjp(_fwd_binned, _bwd_binned)
