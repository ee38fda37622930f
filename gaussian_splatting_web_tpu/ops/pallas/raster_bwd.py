"""Fused Pallas backward kernel for the tile compositor.

The INRIA backward is a sequential back-to-front CUDA walk per pixel. Here
it is re-derived for the log-transmittance formulation and vectorized the
same way as the forward: pixels in sublanes, splat chunks in lanes, the two
order-dependent quantities realized as triangular matmuls on the MXU —

  prefix (transmittance):  T_k = exp(carry + Σ_{j<k} log(1-α_j))
  suffix (downstream color): S_k = Σ_{j>k} r_j w_j,  r_j = g_rgb·c_j + g_α

giving the classic gradients (k contributing):
  ∂L/∂c_k = w_k g_rgb        ∂L/∂α_k = T_k r_k − S_k / (1-α_k)

Round-3 redesign (the round-2 kernel was the fwd+bwd bottleneck at
44.7 ms vs an ~8 ms bound):

  * No stored per-chunk carries. The forward emits only each pixel's FINAL
    log-transmittance + the processed-chunk count (raster.py `fin`); the
    backward walks back-to-front and RECONSTRUCTS each chunk's starting
    carry by subtracting that chunk's log(1-α) column sum (recomputed
    anyway for the suffix). This kills the per-chunk `lax.switch`
    single-lane carry reads round-2 profiling flagged AND the
    O(tiles·P·maxc) HBM carries array.
  * No read-modify-write chain. Every pair-gradient chunk is a PURE STORE:
    a tile's interior chunks are exclusively owned (segments are
    contiguous in slab order), so only the FIRST chunk — whose leading
    `lead` lanes hold earlier tiles' gradients — needs a read-merge-write,
    and its read is prefetched at kernel start (hidden behind the whole
    tile walk). The round-2 kernel instead did read-add-write per chunk,
    whose serialized DMA chain dominated its pipeline and pinned
    R_TILES_BWD at 1.

Like the forward (raster.py R_TILES), each grid step processes R tiles with
their pixel rows stacked [R·P, KC]. Each tile in a group accumulates into
its OWN row group of the pair-gradient array (rows [r·F_PAD, (r+1)·F_PAD)),
so in-group stores never alias even where adjacent tiles share a 128-lane
boundary block; the fold sums the R row groups (one elementwise pass).
Cross-group writes to a shared (row-group, block) pair are ordered by the
end-of-body store drains + sequential grid execution.
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
    F_PAD, KB, KC, LOG_PAD, _cumsum_tri_blocked, _decode_slab,
    _dot_exact_bf16x3, _dot_general_bf16x3, _suffix_tri_blocked,
    _tri_block,
)

# Tiles per backward grid step now lives in RenderConfig.r_tiles_bwd (a
# static field so tools sweep it per call; see the config for the v5e
# sweep that pinned the default at 1).


def _bwd_kernel(
    starts_ref,            # SMEM [T+1] int32 (sentinel row 0 at the end)
    counts_ref,            # SMEM [T+1] int32
    tiles_ref,             # SMEM [G_pad] int32: grid→tile id (num_tiles=pad)
    cfin_ref,              # SMEM [G_pad] int32: chunks the forward
                           # processed for this tile's group (0 on padding)
    *refs,                 # packed: f6_hbm [6, M_pad] u32 (bitcast mx, my,
                           #   ca|cb, cc|op, r|g, b|0), fin, cot, dzero,
                           #   dpairs, slab6, st, rd, sem.
                           # unpacked: f8_hbm [8, M_pad] f32, f4_hbm
                           #   [4, M_pad] f32, fin, cot, dzero, dpairs,
                           #   slab8, slab4, st, rd, sem.
                           # fin VMEM [R, P, 2] (lane 0 = final log-
                           # transmittance per pixel); cot VMEM [R, P, 4]; dzero/dpairs
                           # ANY [R·F_PAD, M_pad] f32 (aliased in/out);
                           # st VMEM scratch [2, R, F_PAD, KC] (double-
                           # buffered store staging); rd VMEM scratch
                           # [R, F_PAD, KC] (first-chunk merge read); sem
                           # DMA semaphores (4, R, 2)
    gx: int,
    tile_size: int,
    k_cap: int,
    alpha_cutoff: float,
    alpha_max: float,
    log_eps: float,
    r_tiles: int,
    packed: bool,
    mean16: bool,
):
    if packed:
        (f6_hbm, fin_ref, cot_ref, dzero_hbm, dpairs_hbm, slab6_ref,
         go_ref, st_ref, rd_ref, sem_ref) = refs
    else:
        (f8_hbm, f4_hbm, fin_ref, cot_ref, dzero_hbm, dpairs_hbm,
         slab8_ref, slab4_ref, go_ref, st_ref, rd_ref, sem_ref) = refs
    del dzero_hbm
    p = tile_size * tile_size
    R = r_tiles
    g0 = pl.program_id(0) * R
    ts_f = float(tile_size)

    bases, leads, totals, useful_r, nch_r, txs, tys = (
        [], [], [], [], [], [], [])
    for r in range(R):
        t = tiles_ref[g0 + r]
        start = starts_ref[t]
        count = jnp.minimum(counts_ref[t], k_cap)
        base = (start // KC) * KC
        lead = start - base
        total = lead + count
        n_chunks = jnp.where(count > 0, pl.cdiv(total, KC), 0)
        # the forward walks each group to its max chunk count but may exit
        # early once every pixel saturates; chunks at/after the exit point
        # contributed nothing and carry zero gradient
        useful = jnp.minimum(cfin_ref[g0 + r], n_chunks)
        bases.append(base)
        leads.append(lead)
        totals.append(total)
        useful_r.append(useful)
        nch_r.append(n_chunks)
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

    tri_b = _tri_block()
    tsl_b = (
        jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 1)
    ).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1)
    log_cut = float(math.log(alpha_cutoff))

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

    n_cover = k_cap // KC + 1    # cover chunks: k_cap lanes + lead block

    def rd_dma(r, slot, c):
        """Boundary-block read: slot 0 = first cover chunk (leading
        lanes hold the previous tile's gradients), slot 1 = last (its
        trailing lanes belong to the next tile)."""
        off = pl.multiple_of(bases[r] + c * KC, KC)
        return pltpu.make_async_copy(
            dpairs_hbm.at[pl.ds(r * F_PAD, F_PAD), pl.ds(off, KC)],
            rd_ref.at[r, slot],
            sem_ref.at[2, r, slot],
        )

    def sweep_dma(r, j, from_st, sem_slot):
        """End-of-tile store of cover chunk j: boundary chunks go via
        the st staging (merged), interiors straight from go_ref.
        `sem_slot` is static (the last chunk's j is traced)."""
        off = pl.multiple_of(bases[r] + j * KC, KC)
        src = st_ref.at[r, from_st] if from_st is not None \
            else go_ref.at[r, :, pl.ds(j * KC, KC)]
        return pltpu.make_async_copy(
            src,
            dpairs_hbm.at[pl.ds(r * F_PAD, F_PAD), pl.ds(off, KC)],
            sem_ref.at[3, r, sem_slot],
        )

    def read_slab(s, r):
        """(mx, my, ca, cb, cc, rgb_rows [3, KC], op_row [1, KC]) from the
        resident slab, decoding the packing (raster._decode_slab)."""
        if packed:
            slab = slab6_ref[s, r]                    # [8, KC] u32
            op4 = None
        else:
            slab = slab8_ref[s, r]                    # [8, KC]
            op4 = slab4_ref[s, r][0:1, :]
        return _decode_slab(slab, op4, packed, mean16, txs[r], tys[r])

    for r in range(R):
        # zero the per-tile gradient accumulator (lanes outside the
        # [lead, total) window stay zero — the masks below never write
        # them — so interior sweep chunks can pure-store)
        go_ref[r, :, :] = jnp.zeros(
            (F_PAD, n_cover * KC), jnp.float32)

        @pl.when(useful_r[r] > 0)
        def _(r=r):
            for d in slab_dmas(0, r, c_of(r, 0)):
                d.start()

        @pl.when(nch_r[r] > 0)
        def _(r=r):
            rd_dma(r, 0, 0).start()

        @pl.when(nch_r[r] > 1)
        def _(r=r):
            rd_dma(r, 1, nch_r[r] - 1).start()

    def body(i, carries):
        s_carry, carry_end = carries      # suffix color; end-of-chunk log T
        s = i % 2

        # prefetch next step's slabs while this step computes
        for r in range(R):
            @pl.when(i + 1 < useful_r[r])
            def _(r=r):
                for d in slab_dmas((i + 1) % 2, r, c_of(r, i + 1)):
                    d.start()

        # alpha recompute: same rank-6 bilinear form as the forward kernel
        # (log-opacity + segment window + active flag folded into the
        # constant row — alpha = exp(power), cutoff = compare on power)
        powers, f4s = [], []
        op_rows = []
        for r in range(R):
            active = i < useful_r[r]
            c = c_of(r, i)

            @pl.when(active)
            def _(r=r, c=c):
                for d in slab_dmas(s, r, c):
                    d.wait()

            mx, my, ca, cb, cc, rgb_rows, op_row = read_slab(s, r)
            op_rows.append(op_row)
            gcol = c * KC + lane                           # [1, KC]
            win = jnp.logical_and(gcol >= leads[r], gcol < totals[r])
            win = jnp.logical_and(win, active)
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
            )
            powers.append(_dot_exact_bf16x3(u_mat, v_mat))
            f4s.append(jnp.concatenate(
                [rgb_rows, jnp.ones((1, KC), jnp.float32)], axis=0
            ))

        power = jnp.concatenate(powers, axis=0)            # [R·P, KC]
        a_raw = jnp.exp(power)        # 0 for masked lanes (exp underflow)
        live = power >= log_cut
        alpha = jnp.where(live, jnp.minimum(a_raw, alpha_max), 0.0)

        log1m = jnp.log1p(-alpha)
        # blocked tri matmuls, NOT a lane-roll scan: a Hillis-Steele
        # pltpu.roll scan was measured SLOWER end to end (fwd+bwd 133.7 vs
        # 118.9 ms at the 1M bench) — the roll+mask+add passes cost more
        # than bf16 MXU passes that overlap the VPU work anyway
        cum = _cumsum_tri_blocked(log1m, tri_b)
        # reconstruct this chunk's starting carry from the end-of-chunk
        # carry: carry_start = carry_end − Σ_lanes log(1-α). Inactive rows
        # have alpha ≡ 0 → column sum 0 → carry unchanged.
        colsum = cum[:, KC - 1 : KC]
        carry_start = carry_end - colsum
        log_t_incl = carry_start + cum
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
        suffix = _suffix_tri_blocked(rw, tsl_b)
        s_k = s_carry + suffix

        dalpha = jnp.where(
            jnp.logical_and(contrib, live),
            t_excl * rr - s_k / (1.0 - alpha),
            0.0,
        )
        # chain through the alpha_max clamp and the 1/255 cutoff; with
        # alpha = exp(power + log op), d power = dalpha·a_raw and
        # d op = Σ_p (dalpha·a_raw) / op (per-lane division, [1, KC])
        da_raw = jnp.where(a_raw > alpha_max, 0.0, dalpha)
        dpow = da_raw * a_raw

        for r in range(R):
            rows = slice(r * p, (r + 1) * p)
            mx, my, ca, cb, cc, _, _ = read_slab(s, r)

            d_op = (jnp.sum(dpow[rows], axis=0, keepdims=True)
                    / jnp.maximum(op_rows[r], 1e-30))

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

            # accumulate into the per-tile VMEM gradient buffer — NO
            # per-chunk store DMA (the round-3 kernel's serialized
            # staged-store chain was its bottleneck; one sweep below
            # writes everything)
            @pl.when(i < useful_r[r])
            def _(r=r, grads=grads):
                c = c_of(r, i)
                for j in range(n_cover):
                    @pl.when(c == j)
                    def _(r=r, grads=grads, j=j):
                        go_ref[r, :, j * KC:(j + 1) * KC] = grads

        # advance the back-to-front carries: active rows step to the start
        # of the chunk just processed; inactive rows already had colsum 0
        return (s_carry + jnp.sum(rw, axis=1, keepdims=True), carry_start)

    finc0 = jnp.concatenate(
        [fin_ref[r][:, 0:1] for r in range(R)], axis=0)
    jax.lax.fori_loop(
        0, max_useful, body,
        (jnp.zeros((R * p, 1), jnp.float32), finc0))

    # --- end-of-tile sweep: one store per cover chunk ------------------
    # chunk 0 merges the prefetched first block (leading lanes belong to
    # the previous tile), the last chunk merges its block (trailing lanes
    # belong to the next tile); interiors pure-store from go_ref. Writes
    # to blocks shared with neighbouring grid steps are ordered by the
    # sequential grid + the drains below.
    for r in range(R):
        @pl.when(nch_r[r] > 0)
        def _(r=r):
            rd_dma(r, 0, 0).wait()
            first = go_ref[r, :, 0:KC]
            # single-chunk segments: the first block is also the last —
            # the one prefetched read covers both boundaries
            mine0 = jnp.logical_and(lane >= leads[r],
                                    jnp.logical_or(nch_r[r] > 1,
                                                   lane < totals[r]))
            st_ref[r, 0] = jnp.where(mine0, first, rd_ref[r, 0])
            sweep_dma(r, 0, from_st=0, sem_slot=0).start()

        @pl.when(nch_r[r] > 1)
        def _(r=r):
            rd_dma(r, 1, nch_r[r] - 1).wait()
            lastc = nch_r[r] - 1
            last_blk = jax.lax.switch(
                jnp.clip(lastc, 0, n_cover - 1),
                [lambda r=r, j=j: go_ref[r, :, j * KC:(j + 1) * KC]
                 for j in range(n_cover)])
            tail = totals[r] - lastc * KC
            st_ref[r, 1] = jnp.where(lane < tail, last_blk, rd_ref[r, 1])
            sweep_dma(r, lastc, from_st=1, sem_slot=n_cover).start()

        # interior chunks: pure stores straight from go_ref
        for j in range(1, n_cover - 1):
            @pl.when(j < nch_r[r] - 1)
            def _(r=r, j=j):
                sweep_dma(r, j, from_st=None, sem_slot=j).start()

    for r in range(R):
        @pl.when(nch_r[r] > 0)
        def _(r=r):
            sweep_dma(r, 0, from_st=0, sem_slot=0).wait()

        @pl.when(nch_r[r] > 1)
        def _(r=r):
            sweep_dma(r, nch_r[r] - 1, from_st=1,
                      sem_slot=n_cover).wait()

        for j in range(1, n_cover - 1):
            @pl.when(j < nch_r[r] - 1)
            def _(r=r, j=j):
                sweep_dma(r, j, from_st=None, sem_slot=j).wait()


def backward_pair_grads(
    fields_t,                     # _sorted_fields_t output: ([6, M_pad] u32)
                                  # packed, or ([8, M_pad], [4, M_pad]) f32
    fin: jnp.ndarray,             # [G, P, 2] forward finals (carry, chunks)
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
    m_pad = fields_t[0].shape[1]

    r = min(r_tiles or config.r_tiles_bwd, grid_n)
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
    cfin_s = jnp.concatenate(
        [fin[:, 0, 1].astype(jnp.int32), jnp.zeros((pad,), jnp.int32)])
    fin_p = jnp.concatenate(
        [fin, jnp.zeros((pad, p, 2), fin.dtype)])
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
        mean16=packed and config.pack_mean16,
    )
    if packed:
        slab_scratch = [pltpu.VMEM((2, r, 8, KC), jnp.uint32)]
    else:
        slab_scratch = [
            pltpu.VMEM((2, r, 8, KC), jnp.float32),
            pltpu.VMEM((2, r, 4, KC), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_groups,),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * len(fields_t)        # slabs
            + [
                pl.BlockSpec((r, p, 2),
                             lambda g, s, c, t, f: (g, 0, 0)),          # fin
                pl.BlockSpec((r, p, 4),
                             lambda g, s, c, t, f: (g, 0, 0)),          # cot
                pl.BlockSpec(memory_space=pl.ANY),                     # dzero
            ]
        ),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=slab_scratch + [
            # per-tile gradient accumulator (k_cap + one lead chunk)
            pltpu.VMEM((r, F_PAD, (k_cap // KC + 1) * KC), jnp.float32),
            pltpu.VMEM((r, 2, F_PAD, KC), jnp.float32),   # boundary st
            pltpu.VMEM((r, 2, F_PAD, KC), jnp.float32),   # boundary rd
            pltpu.SemaphoreType.DMA((4, r, k_cap // KC + 2)),
        ],
    )
    dzero = jnp.zeros((r * F_PAD, m_pad), jnp.float32)
    # flat input index of dzero incl. the 4 scalar-prefetch args
    dzero_idx = 4 + len(fields_t) + 2
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
        cfin_s,
        *fields_t,
        fin_p,
        cot_p,
        dzero,
    )
    return dpairs
