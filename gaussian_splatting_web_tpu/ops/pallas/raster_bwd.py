"""Fused Pallas backward kernel for the tile compositor.

The INRIA backward is a sequential back-to-front CUDA walk per pixel. Here
it is re-derived for the log-transmittance formulation and vectorized the
same way as the forward: pixels in sublanes, splat chunks in lanes, the two
order-dependent quantities realized as triangular matmuls on the MXU —

  prefix (transmittance):  T_k = exp(carry + Σ_{j<k} log(1-α_j))
  suffix (downstream color): S_k = Σ_{j>k} r_j w_j,  r_j = g_rgb·c_j + g_α

giving the classic gradients (k contributing):
  ∂L/∂c_k = w_k g_rgb        ∂L/∂α_k = T_k r_k − S_k / (1-α_k)

The forward kernel stores the per-chunk log-transmittance carries
(`carries`), so the backward makes a single back-to-front sweep per tile:
stream the slab, recompute α, form the suffix with a strict-lower-triangular
matmul, reduce over pixels, and accumulate per-pair gradients into the
(tile,depth)-sorted pair-gradient array with read-add-write DMA.

Like the forward (raster.py R_TILES), each grid step processes R tiles with
their pixel rows stacked [R·P, KC], amortizing the per-step fixed cost that
dominates at ~1 chunk/tile. Each tile in a group accumulates into its OWN
row group of the pair-gradient array (rows [r·F_PAD, (r+1)·F_PAD)), so
in-group RMW blocks can never alias even where adjacent tiles share a
128-lane boundary block; the fold sums the R row groups (one elementwise
pass). Across grid steps the same row group is protected by the end-of-tile
write drains plus sequential grid execution, exactly as in round 1.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RenderConfig
from .raster import (
    F_PAD, KC, _bitcast_f32, _dot_bf16x2, _dot_exact_bf16x3,
    _dot_general_bf16x3, _unpack_hi, _unpack_lo,
)

R_TILES_BWD = 1   # tiles per backward grid step. Unlike the forward, the
                  # backward gets NO grouping win — the RMW read/write
                  # chain per tile dominates its pipeline (v5e sweep:
                  # r=1 44.7 ms, r=2 44.8, r=4 51.0, r=8 scoped-VMEM OOM;
                  # tools/profile_r_tiles.py) — and r=1 also shrinks the
                  # pair-gradient array to one F_PAD row group, which
                  # quarters the fold's group-sum traffic vs r=4.


def _bwd_kernel(
    starts_ref,            # SMEM [T+1] int32 (sentinel row 0 at the end)
    counts_ref,            # SMEM [T+1] int32
    tiles_ref,             # SMEM [G_pad] int32: grid→tile id (num_tiles=pad)
    *refs,                 # packed: f6_hbm [6, M_pad] u32 (bitcast mx, my,
                           #   ca|cb, cc|op, r|g, b|0), carries, cot,
                           #   dzero, dpairs, slab6, rmw, sem.
                           # unpacked: f8_hbm [8, M_pad] f32, f4_hbm
                           #   [4, M_pad] f32, carries, cot, dzero, dpairs,
                           #   slab8, slab4, rmw, sem.
                           # carries VMEM [R, P, MAXC] f32 (start-of-chunk
                           # log T); cot VMEM [R, P, 4]; dzero/dpairs ANY
                           # [R·F_PAD, M_pad] f32 (aliased in/out); rmw
                           # VMEM scratch [2, R, F_PAD, KC]; sem DMA
                           # semaphores (4, R, 2)
    gx: int,
    tile_size: int,
    k_cap: int,
    alpha_cutoff: float,
    alpha_max: float,
    log_eps: float,
    r_tiles: int,
    packed: bool,
):
    if packed:
        (f6_hbm, carries_ref, cot_ref, dzero_hbm, dpairs_hbm, slab6_ref,
         rmw_ref, sem_ref) = refs
    else:
        (f8_hbm, f4_hbm, carries_ref, cot_ref, dzero_hbm, dpairs_hbm,
         slab8_ref, slab4_ref, rmw_ref, sem_ref) = refs
    del dzero_hbm
    p = tile_size * tile_size
    R = r_tiles
    g0 = pl.program_id(0) * R
    maxc = carries_ref.shape[2]
    ts_f = float(tile_size)

    bases, leads, totals, n_chunks_r, useful_r, txs, tys = \
        [], [], [], [], [], [], []
    chunk_idx = jax.lax.broadcasted_iota(jnp.int32, (1, maxc), 1)
    for r in range(R):
        t = tiles_ref[g0 + r]
        start = starts_ref[t]
        count = jnp.minimum(counts_ref[t], k_cap)
        base = (start // KC) * KC
        lead = start - base
        total = lead + count
        n_chunks = jnp.where(count > 0, pl.cdiv(total, KC), 0)
        # chunks whose starting transmittance is already below threshold
        # were never processed forward (carry sentinel -1e30) or contribute
        # nothing
        chunk_live = (
            jnp.max(carries_ref[r], axis=0, keepdims=True) >= log_eps
        )
        useful = jnp.sum(jnp.where(
            jnp.logical_and(chunk_live, chunk_idx < n_chunks), 1, 0))
        bases.append(base)
        leads.append(lead)
        totals.append(total)
        n_chunks_r.append(n_chunks)
        useful_r.append(useful)
        txs.append((t % gx).astype(jnp.float32) * ts_f)
        tys.append((t // gx).astype(jnp.float32) * ts_f)
    max_useful = useful_r[0]
    for r in range(1, R):
        max_useful = jnp.maximum(max_useful, useful_r[r])

    # tile-local pixel coordinates (see forward kernel: the quadratic and
    # its gradient moments run on the MXU; local coords bound cancellation)
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (pix % tile_size).astype(jnp.float32)
    py = (pix // tile_size).astype(jnp.float32)
    ones_p = jnp.ones((p, 1), jnp.float32)
    u_mat = jnp.concatenate(
        [ones_p, px, py, px * px, py * py, px * py,
         jnp.zeros((p, 2), jnp.float32)],
        axis=1,
    )                                   # [P, 8]

    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 1)
    ).astype(jnp.float32)
    tri_strict_low = (
        jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 1)
    ).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1)

    def stack_scalar(vals, dtype):
        # broadcast each scalar to its own [P, 1] block (Mosaic cannot
        # lower a reshape of a length-R scalar vector to a 3-D layout)
        return jnp.concatenate(
            [jnp.broadcast_to(v.astype(dtype), (p, 1)) for v in vals], axis=0)

    lead_col = stack_scalar(leads, jnp.int32)
    total_col = stack_scalar(totals, jnp.int32)

    def c_of(r, i):
        """Chunk index of tile r at back-to-front step i (clamped; callers
        guard with i < useful_r)."""
        return jnp.maximum(useful_r[r] - 1 - i, 0)

    if packed:
        def slab_dmas(slot, r, c):
            off = pl.multiple_of(bases[r] + c * KC, KC)
            return [pltpu.make_async_copy(
                f6_hbm.at[:, pl.ds(off, KC)],
                slab6_ref.at[slot, r],
                sem_ref.at[0, r, slot],
            )]
    else:
        def slab_dmas(slot, r, c):
            off = pl.multiple_of(bases[r] + c * KC, KC)
            return [
                pltpu.make_async_copy(
                    f8_hbm.at[:, pl.ds(off, KC)],
                    slab8_ref.at[slot, r],
                    sem_ref.at[0, r, slot],
                ),
                pltpu.make_async_copy(
                    f4_hbm.at[:, pl.ds(off, KC)],
                    slab4_ref.at[slot, r],
                    sem_ref.at[1, r, slot],
                ),
            ]

    def rmw_read_dma(slot, r, c):
        off = pl.multiple_of(bases[r] + c * KC, KC)
        return pltpu.make_async_copy(
            dpairs_hbm.at[pl.ds(r * F_PAD, F_PAD), pl.ds(off, KC)],
            rmw_ref.at[slot, r],
            sem_ref.at[2, r, slot],
        )

    def rmw_write_dma(slot, r, c):
        off = pl.multiple_of(bases[r] + c * KC, KC)
        return pltpu.make_async_copy(
            rmw_ref.at[slot, r],
            dpairs_hbm.at[pl.ds(r * F_PAD, F_PAD), pl.ds(off, KC)],
            sem_ref.at[3, r, slot],
        )

    def read_slab(s, r):
        """(mx, my, ca, cb, cc, rgb_rows [3, KC], op_row [1, KC]) from the
        resident slab, decoding the bf16-pair packing when packed."""
        if packed:
            slab = slab6_ref[s, r]                    # [6, KC] u32
            mx = _bitcast_f32(slab[0:1, :]) - txs[r]
            my = _bitcast_f32(slab[1:2, :]) - tys[r]
            ca = _unpack_hi(slab[2:3, :])
            cb = _unpack_lo(slab[2:3, :])
            cc = _unpack_hi(slab[3:4, :])
            op_row = _unpack_lo(slab[3:4, :])
            rgb_rows = jnp.concatenate([
                _unpack_hi(slab[4:5, :]),
                _unpack_lo(slab[4:5, :]),
                _unpack_hi(slab[5:6, :]),
            ], axis=0)
        else:
            slab = slab8_ref[s, r]                    # [8, KC]
            mx = slab[0:1, :] - txs[r]
            my = slab[1:2, :] - tys[r]
            ca = slab[2:3, :]
            cb = slab[3:4, :]
            cc = slab[4:5, :]
            op_row = slab4_ref[s, r][0:1, :]
            rgb_rows = slab[5:8, :]
        return mx, my, ca, cb, cc, rgb_rows, op_row

    for r in range(R):
        @pl.when(useful_r[r] > 0)
        def _(r=r):
            for d in slab_dmas(0, r, c_of(r, 0)):
                d.start()
            rmw_read_dma(0, r, c_of(r, 0)).start()

    def body(i, s_carry):
        s = i % 2

        # prefetch next step's slabs while this step computes
        for r in range(R):
            @pl.when(i + 1 < useful_r[r])
            def _(r=r):
                for d in slab_dmas((i + 1) % 2, r, c_of(r, i + 1)):
                    d.start()

        # alpha recompute: same rank-6 bilinear form as the forward kernel
        powers, f4s, carry_cs, gcols = [], [], [], []
        op_rows = []
        active_flags = []
        for r in range(R):
            active = i < useful_r[r]
            active_flags.append(active)
            c = c_of(r, i)

            @pl.when(active)
            def _(r=r, c=c):
                for d in slab_dmas(s, r, c):
                    d.wait()

            mx, my, ca, cb, cc, rgb_rows, op_row = read_slab(s, r)
            op_rows.append(op_row)
            v_mat = jnp.concatenate(
                [
                    -(0.5 * ca * mx * mx + cb * mx * my
                      + 0.5 * cc * my * my),
                    ca * mx + cb * my,
                    cc * my + cb * mx,
                    -0.5 * ca,
                    -0.5 * cc,
                    -cb,
                    jnp.zeros((2, KC), jnp.float32),
                ],
                axis=0,
            )
            powers.append(_dot_exact_bf16x3(u_mat, v_mat))
            f4s.append(jnp.concatenate(
                [rgb_rows, jnp.ones((1, KC), jnp.float32)], axis=0
            ))
            # single-lane carry reads need static offsets → switch over the
            # (small, static) chunk index
            carry_cs.append(jax.lax.switch(
                jnp.minimum(c, maxc - 1),
                [(lambda r=r, ci=ci: carries_ref[r, :, ci : ci + 1])
                 for ci in range(maxc)],
            ))
            gcols.append(c * KC + lane)

        raw_power = jnp.concatenate(powers, axis=0)        # [R·P, KC]
        op = jnp.concatenate(
            [jnp.broadcast_to(op_rows[r], (p, KC))
             for r in range(R)], axis=0)
        g_idx = jnp.concatenate(
            [jnp.broadcast_to(gcols[r], (p, KC)) for r in range(R)], axis=0)
        active_col = stack_scalar(
            [jnp.where(a, 1, 0) for a in active_flags], jnp.int32) > 0

        power = jnp.minimum(raw_power, 0.0)
        e_pow = jnp.exp(power)
        a_pre = op * e_pow
        alpha = jnp.minimum(a_pre, alpha_max)
        cut = alpha < alpha_cutoff
        window = jnp.logical_and(g_idx >= lead_col, g_idx < total_col)
        window = jnp.logical_and(window, active_col)
        dead = jnp.logical_or(cut, jnp.logical_not(window))
        alpha = jnp.where(dead, 0.0, alpha)

        log1m = jnp.log1p(-alpha)
        cum = _dot_bf16x2(log1m, tri)
        carry_c = jnp.concatenate(carry_cs, axis=0)        # [R·P, 1]
        log_t_incl = carry_c + cum
        contrib = log_t_incl >= log_eps
        t_excl = jnp.exp(log_t_incl - log1m)
        w = jnp.where(contrib, alpha * t_excl, 0.0)

        # r = g_rgb·c + g_alpha, per tile one [P,4]×[4,KC] contraction
        cot_flat = [cot_ref[r] for r in range(R)]          # [P, 4] each
        rr = jnp.concatenate(
            [
                _dot_general_bf16x3(
                    cot_flat[r], f4s[r], (((1,), (0,)), ((), ()))
                )
                for r in range(R)
            ],
            axis=0,
        )                                  # [R·P, KC]
        rw = rr * w
        suffix = _dot_bf16x2(rw, tri_strict_low)
        s_k = s_carry + suffix

        dalpha = jnp.where(
            jnp.logical_and(contrib, jnp.logical_not(dead)),
            t_excl * rr - s_k / (1.0 - alpha),
            0.0,
        )
        # chain through the alpha_max clamp and the 1/255 cutoff
        da_pre = jnp.where(a_pre > alpha_max, 0.0, dalpha)
        dpow_u = da_pre * a_pre
        dpow = jnp.where(raw_power > 0.0, 0.0, dpow_u)

        for r in range(R):
            rows = slice(r * p, (r + 1) * p)
            mx, my, ca, cb, cc, _, _ = read_slab(s, r)

            d_op = jnp.sum(da_pre[rows] * e_pow[rows], axis=0, keepdims=True)

            # geometry gradients from pixel-coordinate moments of dpow
            # (MXU): Mom = Uᵀ dpow → rows [Σdpow, Σdpow·px, Σdpow·py,
            # Σdpow·px², Σdpow·py², Σdpow·px·py]
            mom = _dot_general_bf16x3(
                u_mat, dpow[rows], (((0,), (0,)), ((), ()))
            )                              # [8, KC]
            m0 = mom[0:1, :]
            m1x = mom[1:2, :]
            m1y = mom[2:3, :]
            m2xx = mom[3:4, :]
            m2yy = mom[4:5, :]
            m2xy = mom[5:6, :]
            c1x = m1x - mx * m0
            c1y = m1y - my * m0
            d_mx = ca * c1x + cb * c1y
            d_my = cc * c1y + cb * c1x
            d_ca = -0.5 * (m2xx - 2.0 * mx * m1x + mx * mx * m0)
            d_cc = -0.5 * (m2yy - 2.0 * my * m1y + my * my * m0)
            d_cb = -(m2xy - mx * m1y - my * m1x + mx * my * m0)

            # color gradients: Σ_p w·g_c as cotᵀ w (MXU)
            gmat = _dot_general_bf16x3(
                cot_flat[r], w[rows], (((0,), (0,)), ((), ()))
            )                              # [4, KC]; rows r,g,b,(unused)
            d_fr = gmat[0:1, :]
            d_fg = gmat[1:2, :]
            d_fb = gmat[2:3, :]

            grads = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_fr, d_fg, d_fb, d_op,
                 jnp.zeros((F_PAD - 9, KC), jnp.float32)],
                axis=0,
            )

            # Read-add-write of this tile's pair-gradient block, double-
            # buffered: the read for step i was prefetched one step ahead
            # (hidden behind the previous step's compute) and the write
            # drains asynchronously while the next step computes. Hazard-
            # free: one tile's chunk blocks are disjoint (distinct c), the
            # VMEM slot is reused only after its write-out is waited,
            # in-group tiles target disjoint dpairs ROW groups, and cross-
            # step sharing of a row group is fenced by the end-of-kernel
            # drains + sequential grid execution.
            @pl.when(i < useful_r[r])
            def _(r=r, grads=grads):
                c = c_of(r, i)
                rmw_read_dma(s, r, c).wait()
                rmw_ref[s, r] = rmw_ref[s, r] + grads
                rmw_write_dma(s, r, c).start()

            @pl.when(i + 1 < useful_r[r])
            def _(r=r):
                s2 = (i + 1) % 2

                @pl.when(i >= 1)
                def _(r=r, s2=s2):
                    rmw_write_dma(s2, r, c_of(r, i - 1)).wait()

                rmw_read_dma(s2, r, c_of(r, i + 1)).start()

        return s_carry + jnp.sum(rw, axis=1, keepdims=True)

    jax.lax.fori_loop(0, max_useful, body,
                      jnp.zeros((R * p, 1), jnp.float32))

    # drain the (up to two) in-flight pair-gradient writes per tile before
    # the next grid step may touch a shared boundary block of the same row
    # group
    for r in range(R):
        @pl.when(useful_r[r] > 1)
        def _(r=r):
            rmw_write_dma(
                (useful_r[r] - 2) % 2, r, c_of(r, useful_r[r] - 2)
            ).wait()

        @pl.when(useful_r[r] > 0)
        def _(r=r):
            rmw_write_dma(
                (useful_r[r] - 1) % 2, r, c_of(r, useful_r[r] - 1)
            ).wait()


def backward_pair_grads(
    fields_t,                     # _sorted_fields_t output: ([6, M_pad] u32)
                                  # packed, or ([8, M_pad], [4, M_pad]) f32
    carries: jnp.ndarray,         # [G, P, MAXC] forward carries
    cot_tiles: jnp.ndarray,       # [G, P, 4] cotangents per tile pixel
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    width: int,
    height: int,
    config: RenderConfig,
    interpret: bool = False,
    tile_ids: jnp.ndarray | None = None,
    r_tiles: int | None = None,
) -> jnp.ndarray:
    """Run the backward kernel → pair gradients [R·F_PAD, M_pad].

    Row group g holds the gradients accumulated by tiles at in-group
    position g; the fold sums groups (raster._fold_pair_grads)."""
    packed = len(fields_t) == 1
    ts = config.tile_size
    gx, gy = config.grid_size(width, height)
    num_tiles = gx * gy
    if tile_ids is None:
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    grid_n = tile_ids.shape[0]
    p = ts * ts
    k_cap = max(KC, ((config.max_per_tile + KC - 1) // KC) * KC)
    maxc = carries.shape[-1]
    m_pad = fields_t[0].shape[1]

    r = min(r_tiles or R_TILES_BWD, grid_n)
    n_groups = -(-grid_n // r)
    pad = n_groups * r - grid_n
    tiles_padded = jnp.concatenate(
        [tile_ids.astype(jnp.int32), jnp.full((pad,), num_tiles, jnp.int32)]
    )
    starts_s = jnp.concatenate(
        [tile_start, jnp.zeros((1,), tile_start.dtype)])
    counts_s = jnp.concatenate(
        [jnp.minimum(tile_count, k_cap),
         jnp.zeros((1,), tile_count.dtype)]).astype(jnp.int32)
    carries_p = jnp.concatenate(
        [carries, jnp.full((pad, p, maxc), -1e30, carries.dtype)])
    cot_p = jnp.concatenate(
        [cot_tiles, jnp.zeros((pad, p, 4), cot_tiles.dtype)])

    kernel = functools.partial(
        _bwd_kernel,
        gx=gx,
        tile_size=ts,
        k_cap=k_cap,
        alpha_cutoff=config.alpha_cutoff,
        alpha_max=config.alpha_max,
        log_eps=float(math.log(config.transmittance_eps)),
        r_tiles=r,
        packed=packed,
    )
    if packed:
        slab_scratch = [pltpu.VMEM((2, r, 8, KC), jnp.uint32)]
    else:
        slab_scratch = [
            pltpu.VMEM((2, r, 8, KC), jnp.float32),
            pltpu.VMEM((2, r, 4, KC), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * len(fields_t)        # slabs
            + [
                pl.BlockSpec((r, p, maxc),
                             lambda g, s, c, t: (g, 0, 0)),            # carries
                pl.BlockSpec((r, p, 4), lambda g, s, c, t: (g, 0, 0)),  # cot
                pl.BlockSpec(memory_space=pl.ANY),                     # dzero
            ]
        ),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=slab_scratch + [
            pltpu.VMEM((2, r, F_PAD, KC), jnp.float32),
            pltpu.SemaphoreType.DMA((4, r, 2)),
        ],
    )
    dzero = jnp.zeros((r * F_PAD, m_pad), jnp.float32)
    # flat input index of dzero incl. the 3 scalar-prefetch args
    dzero_idx = 3 + len(fields_t) + 2
    dpairs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r * F_PAD, m_pad), jnp.float32),
        input_output_aliases={dzero_idx: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        starts_s,
        counts_s,
        tiles_padded,
        *fields_t,
        carries_p,
        cot_p,
        dzero,
    )
    return dpairs
