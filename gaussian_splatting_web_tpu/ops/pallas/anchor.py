"""Anchor-tile binning + merge-in-kernel rasterization (round 4).

The round-3 pipeline sorted a DUPLICATED slot grid — every (tile, splat)
incidence is one sort element — so the 8-operand `lax.sort` ran over
3.45M slots (~20 ms at the 1M/1080p bench, the bin+sort floor;
ARCHITECTURE.md round-3 ledger). This module replaces it with the
anchor-tile design the ledger named:

  * every splat whose footprint fits a 2×2-tile window gets ONE sort
    entry at its top-left ("anchor") tile — N elements, not Σ footprint;
  * splats with larger footprints (~1-3% in trained scenes) are
    compacted (stable class sort, as in ops.sort.bin_splats) and
    duplicated per covered tile like before — a few hundred k entries;
  * ONE single-key sort orders entries by (tile, depth16): key =
    tile << 16 | d16, with d16 a 16-bit fixed-point depth on the scene's
    dynamic [min, max] depth range (resolution (far-near)/65536 — finer
    than the round-3 depth_bits=19 packing for typical ranges). The
    exact mode (config.pack_fields=False) keeps a two-key
    (tile, f32-sortable-depth) sort for oracle parity.

The kernel side (anchor_raster) then OWNS depth ordering: a pixel tile
(tx, ty) reads TWO contiguous slab ranges — anchor rows ty-1 and ty,
columns tx-1..tx, adjacent in the sorted array — touch-filters the
union (wide/tall footprint flags + dup-entry exact-tile rule), computes
a global depth rank per candidate with blocked integer compares, and
depth-orders + compacts the survivors into a VMEM buffer with EXACT
one-hot matmuls (a one-hot contraction has exactly one nonzero product
per output, so a 3-term bf16 split of an f32 operand reconstructs it
bit-exactly). The composite loop then runs entirely from VMEM.

The reference's analogue of all of this is the per-frame global radix
sort (renderer.ts:311-315) + full-screen instanced quads; the INRIA
CUDA pipeline duplicates per covered tile exactly like the round-3
path. Binning by anchor with kernel-side merge has no reference
analogue — it exists because `lax.sort` cost is per-element-per-operand
on TPU while VMEM-resident compares/matmuls are nearly free at these
sizes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...config import RenderConfig
from ..projection import ProjectedSplats
from ..sort import (
    TileBins, _footprints, candidate_slot_tiles, float_to_sortable_uint,
    pack_bf16_pair,
)

KCL = 256      # slab load-chunk width (lanes per merge-phase DMA)
ANCHOR_W = 2   # tier-A footprint window (tiles per axis); the kernel
               # reads a (ANCHOR_W)² anchor neighbourhood as ANCHOR_W
               # contiguous ranges. 2 covers ~99% of trained-scene
               # footprints (ops.sort tier histogram); the rest duplicate.


@dataclasses.dataclass
class AnchorBins:
    """Anchor-sorted slab + metadata for the merge kernel.

    starts:   [T+1] int32 — segment start of every anchor tile in the
              sorted array (row-major tile ids); starts[T] = total live
              entries. Segment t is starts[t]..starts[t+1].
    slab:     packed mode: ([8, M_pad] u32) rows = key(tile|d16),
              bitcast(mx), bitcast(my), ca|cb, cc|op, r|g,
              b|meta16, 0. exact mode: ([8, M_pad] f32 = mx, my, ca,
              cb, cc, r, g, b, [4, M_pad] f32 = op, depth, meta, 0).
              meta bits: 1 = tall (rh > 1), 2 = wide (rw > 1), 4 = dup
              entry (exact covered tile, not an anchor).
    bins:     TileBins view for the gradient fold (_fold_pair_grads):
              tier_a_width=1 (tier-A slot k == gaussian id k),
              comp_widths=(max_dup,) for the duplicated big tier.
    """

    starts: jax.Array
    slab: tuple
    bins: TileBins
    packed: bool = dataclasses.field(default=True)


jax.tree_util.register_dataclass(
    AnchorBins,
    data_fields=["starts", "slab", "bins"],
    meta_fields=["packed"],
)


def _depth16(depth: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """16-bit fixed-point depth on the DYNAMIC [min, max] valid-depth
    range (front-to-back ascending). Resolution (far-near)/65536 — e.g.
    1.5 mm over a 100-unit range; equal-d16 candidates keep a
    deterministic (sorted-array position) order in the kernel's rank."""
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(valid, depth, big))
    hi = jnp.max(jnp.where(valid, depth, -big))
    scale = 65535.0 / jnp.maximum(hi - lo, 1e-20)
    d = jnp.clip((depth - lo) * scale, 0.0, 65535.0)
    return d.astype(jnp.uint32)


def bin_splats_anchor(
    splats: ProjectedSplats,
    width: int,
    height: int,
    config: RenderConfig,
) -> AnchorBins:
    """Anchor-tile binning: ONE sort of N + big-dup entries (vs the
    duplicated-slot grid's Σ-footprint elements in ops.sort.bin_splats).

    Entry kinds:
      * tier A (anchor): footprint ≤ ANCHOR_W×ANCHOR_W tiles → one entry
        at tile (x0, y0), wide/tall flags tell the kernel which
        neighbour tiles it extends to;
      * dup tier: bigger footprints, compacted to cap_b splats (stable
        class sort — nonzero/scatter-free, same pattern as bin_splats)
        and expanded to ≤ max_dup covered tiles, flagged dup (touches
        exactly its own tile).
    """
    gx, gy = config.grid_size(width, height)
    num_tiles = gx * gy
    if num_tiles >= (1 << 16) and config.pack_fields:
        raise ValueError(
            f"anchor binning packs tile ids in 16 bits; {num_tiles} tiles "
            "needs the exact mode (pack_fields=False) or the dup binning")
    n = splats.depth.shape[0]
    d = config.max_dup
    ts = config.tile_size
    packed = bool(config.pack_fields)

    x0, y0, rw, rh = _footprints(splats, width, height, config)
    ntg = rw * rh
    live = jnp.logical_and(splats.valid, ntg > 0)
    small = jnp.logical_and(
        live, jnp.logical_and(rw <= ANCHOR_W, rh <= ANCHOR_W))
    big = jnp.logical_and(live, jnp.logical_not(small))

    d16 = _depth16(splats.depth, live)
    depth_key = float_to_sortable_uint(splats.depth)

    # --- tier A: one entry per small splat at its anchor tile ---------
    anchor = (y0 * gx + x0).astype(jnp.uint32)
    meta_a = ((rw > 1).astype(jnp.uint32) * 2
              + (rh > 1).astype(jnp.uint32))
    slot_a = jnp.arange(n, dtype=jnp.int32)

    # --- dup tier: compact big splats, expand per covered tile --------
    cap_b = max(min(int(n * config.big_frac), n), 256)
    cls = jnp.where(big, jnp.uint32(0), jnp.uint32(1))
    _, perm = jax.lax.sort((cls, jnp.arange(n, dtype=jnp.int32)),
                           num_keys=1)
    n_big = jnp.sum(big.astype(jnp.int32))
    perm_pad = jnp.concatenate([perm, jnp.zeros((cap_b,), jnp.int32)])
    idx_b = jnp.where(jnp.arange(cap_b) < n_big, perm_pad[:cap_b], 0)

    # one aligned row-gather for everything the dup tier needs
    def _f(a):
        if a.dtype in (jnp.int32, jnp.uint32):
            return jax.lax.bitcast_convert_type(a, jnp.float32)
        return a

    gcols = [x0, y0, rw, jnp.minimum(ntg, d), d16, splats.depth,
             splats.mean2d[:, 0], splats.mean2d[:, 1],
             splats.conic[:, 0], splats.conic[:, 1], splats.conic[:, 2],
             splats.rgb[:, 0], splats.rgb[:, 1], splats.rgb[:, 2],
             splats.opacity, depth_key]
    rows16 = jnp.stack([_f(a) for a in gcols], axis=1)       # [n, 16]
    gb = rows16[idx_b]                                       # [cap_b, 16]

    def _u(k):
        return jax.lax.bitcast_convert_type(gb[:, k], jnp.uint32)

    x0b = jax.lax.bitcast_convert_type(gb[:, 0], jnp.int32)
    y0b = jax.lax.bitcast_convert_type(gb[:, 1], jnp.int32)
    rwb = jax.lax.bitcast_convert_type(gb[:, 2], jnp.int32)
    ntgb_raw = jax.lax.bitcast_convert_type(gb[:, 3], jnp.int32)
    valid_b = jnp.arange(cap_b) < n_big
    ntgb = jnp.where(valid_b, ntgb_raw, 0)
    tile_b, live_b = candidate_slot_tiles(
        x0b, y0b, rwb, ntgb, d, gx, num_tiles, ts)           # [d, cap_b]
    d16b = _u(4)
    depth_b = gb[:, 5]
    dkey_b = _u(15)
    slot_b = (n + jnp.arange(d * cap_b, dtype=jnp.int32)).reshape(d, cap_b)

    overflow = (jnp.sum(jnp.where(big, jnp.maximum(ntg - d, 0), 0))
                + jnp.maximum(n_big - cap_b, 0))
    num_pairs = (jnp.sum(jnp.where(small, ntg, 0))
                 + jnp.sum(live_b.astype(jnp.int32)))

    # --- keys + payloads, one sort ------------------------------------
    z = jnp.zeros_like(splats.opacity)
    if packed:
        key_a = jnp.where(
            small, (anchor << 16) | d16, jnp.uint32(0xFFFFFFFF))
        key_b = jnp.where(
            live_b, (tile_b.astype(jnp.uint32) << 16) | d16b[None, :],
            jnp.uint32(0xFFFFFFFF)).reshape(-1)
        pay_a = (
            jax.lax.bitcast_convert_type(splats.mean2d[:, 0], jnp.uint32),
            jax.lax.bitcast_convert_type(splats.mean2d[:, 1], jnp.uint32),
            pack_bf16_pair(splats.conic[:, 0], splats.conic[:, 1]),
            pack_bf16_pair(splats.conic[:, 2], splats.opacity),
            pack_bf16_pair(splats.rgb[:, 0], splats.rgb[:, 1]),
            pack_bf16_pair(splats.rgb[:, 2], z) | meta_a,
        )
        meta_b = jnp.full((d * cap_b,), 4, jnp.uint32)
        pay_b = (
            jnp.broadcast_to(_u(6)[None, :], (d, cap_b)).reshape(-1),
            jnp.broadcast_to(_u(7)[None, :], (d, cap_b)).reshape(-1),
            jnp.broadcast_to(pack_bf16_pair(gb[:, 8], gb[:, 9])[None, :],
                             (d, cap_b)).reshape(-1),
            jnp.broadcast_to(pack_bf16_pair(gb[:, 10], gb[:, 14])[None, :],
                             (d, cap_b)).reshape(-1),
            jnp.broadcast_to(pack_bf16_pair(gb[:, 11], gb[:, 12])[None, :],
                             (d, cap_b)).reshape(-1),
            jnp.broadcast_to(
                pack_bf16_pair(gb[:, 13],
                               jnp.zeros((cap_b,), jnp.float32))[None, :],
                (d, cap_b)).reshape(-1) | meta_b,
        )
        keys = jnp.concatenate([key_a, key_b])
        pays = tuple(
            jnp.concatenate([a, b]) for a, b in zip(pay_a, pay_b)
        ) + (jnp.concatenate([slot_a, slot_b.reshape(-1)]),)
        sorted_all = jax.lax.sort((keys,) + pays, num_keys=1)
        skey = sorted_all[0]
        srows = sorted_all[1:7]
        sorted_slot = sorted_all[7]
        bounds = (jnp.arange(num_tiles + 1, dtype=jnp.uint32) << 16)
        starts = jnp.searchsorted(skey, bounds, side="left").astype(
            jnp.int32)
        m = skey.shape[0]
        m_pad = (-(-m // KCL) + ANCHOR_W * _c_max(config)) * KCL
        pad = m_pad - m

        def padu(a, fill=0):
            return jnp.concatenate(
                [a, jnp.full((pad,), fill, jnp.uint32)])

        slab = (jnp.stack(
            [padu(skey, 0xFFFFFFFF)] + [padu(r) for r in srows]
            + [jnp.zeros((m_pad,), jnp.uint32)], axis=0),)    # [8, M_pad]
    else:
        tile_key_a = jnp.where(small, anchor,
                               jnp.uint32(num_tiles))
        tile_key_b = jnp.where(live_b, tile_b.astype(jnp.uint32),
                               jnp.uint32(num_tiles)).reshape(-1)
        dkey_a = depth_key
        meta_af = meta_a.astype(jnp.float32)
        meta_bf = jnp.full((d * cap_b,), 4.0, jnp.float32)

        def bcast(col):
            return jnp.broadcast_to(col[None, :], (d, cap_b)).reshape(-1)

        pay_a = (splats.mean2d[:, 0], splats.mean2d[:, 1],
                 splats.conic[:, 0], splats.conic[:, 1],
                 splats.conic[:, 2], splats.rgb[:, 0], splats.rgb[:, 1],
                 splats.rgb[:, 2], splats.opacity, splats.depth, meta_af)
        pay_b = (bcast(gb[:, 6]), bcast(gb[:, 7]), bcast(gb[:, 8]),
                 bcast(gb[:, 9]), bcast(gb[:, 10]), bcast(gb[:, 11]),
                 bcast(gb[:, 12]), bcast(gb[:, 13]), bcast(gb[:, 14]),
                 bcast(depth_b), meta_bf)
        keys1 = jnp.concatenate([tile_key_a, tile_key_b])
        keys2 = jnp.concatenate([dkey_a, jnp.broadcast_to(
            dkey_b[None, :], (d, cap_b)).reshape(-1)])
        pays = tuple(jnp.concatenate([a, b]) for a, b in zip(pay_a, pay_b)
                     ) + (jnp.concatenate([slot_a, slot_b.reshape(-1)]),)
        sorted_all = jax.lax.sort((keys1, keys2) + pays, num_keys=2)
        stile = sorted_all[0]
        srows = sorted_all[2:13]
        sorted_slot = sorted_all[13]
        starts = jnp.searchsorted(
            stile, jnp.arange(num_tiles + 1, dtype=jnp.uint32),
            side="left").astype(jnp.int32)
        m = stile.shape[0]
        m_pad = (-(-m // KCL) + ANCHOR_W * _c_max(config)) * KCL
        pad = m_pad - m

        def padf(a):
            return jnp.concatenate([a, jnp.zeros((pad,), jnp.float32)])

        f8 = jnp.stack([padf(srows[k]) for k in range(8)], axis=0)
        f4 = jnp.stack([padf(srows[8]), padf(srows[9]), padf(srows[10]),
                        jnp.zeros((m_pad,), jnp.float32)], axis=0)
        slab = (f8, f4)

    tile_start = starts[:-1]
    tile_count = starts[1:] - starts[:-1]

    bins = TileBins(
        sorted_gidx=None,
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=num_pairs,
        overflow=overflow,
        sorted_slot=sorted_slot,
        comp_idx=(idx_b,),
        comp_perm=jnp.concatenate(
            [perm, jnp.zeros((cap_b,), jnp.int32)]),
        comp_offsets=jnp.stack([jnp.int32(0)]),
        sorted_fields=None,
        tier_a_width=1,
        comp_widths=(d,),
        pair_cap=int(sorted_slot.shape[0]),
        fields_packed=packed,
    )
    return AnchorBins(starts=starts, slab=slab, bins=bins, packed=packed)


def _c_max(config: RenderConfig) -> int:
    """Merge-phase load chunks per anchor range (static). A range holds
    the tile's candidates PLUS entries that do not touch it (single-
    column splats of the neighbouring anchor, dup entries of other
    tiles), so the cover budget is max_per_tile + two chunks of slack
    (alignment lead + non-touching entries); ranges longer than this
    drop their tail (deepest entries of the right anchor column)."""
    return config.max_per_tile // KCL + 2


# ======================================================================
# Merge-phase + composite kernels
# ======================================================================

import functools
import math

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import (
    KC, _bitcast_f32, _dot_bf16x2, _dot_exact_bf16x3,
    _dot_general_bf16x3, _unpack_hi, _unpack_lo,
)

def _order_mult(c_max: int) -> int:
    """Packed-mode order-key multiplier: ukey = d16·mult + gidx with
    gidx = q·KCL + lane < 2·c_max·KCL. The multiplier must exceed every
    live gidx or keys collide (ADVICE r4, medium: the old fixed 4096 was
    only injective up to max_per_tile = 1536); derived as the next power
    of two ≥ the union size. 65535·mult + gidx must also fit int32, which
    bounds mult ≤ 2^14 (checked in rasterize_anchor/bin_splats_anchor:
    max_per_tile ≤ (32−2)·KCL = 7680)."""
    union = 2 * c_max * KCL
    mult = 1 << (union - 1).bit_length()
    if mult > (1 << 14):
        raise ValueError(
            f"anchor packed order keys overflow int32 for union size "
            f"{union} (max_per_tile too large; keep it ≤ {30 * KCL})")
    return max(mult, 4096)


def _dead_base(c_max: int) -> int:
    """First dead-lane key: above every live d16·mult + gidx."""
    return (1 << 16) * _order_mult(c_max)


def _split3(v):
    """f32 → three bf16 components summing EXACTLY to v (the 24 mantissa
    bits peel into 3×8 under round-to-nearest); a one-hot contraction of
    each component has exactly one nonzero product per output, so
    one-hot @ [h; l1; l2] reconstructs v bit-exactly (normal range)."""
    h = v.astype(jnp.bfloat16)
    r1 = v - h.astype(jnp.float32)
    l1 = r1.astype(jnp.bfloat16)
    l2 = (r1 - l1.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, l1, l2


def _sortable_i32(f):
    """float32 → int32 with float ordering (monotone), for the exact-mode
    in-kernel depth compare."""
    i = jax.lax.bitcast_convert_type(f, jnp.int32)
    return jnp.where(i < 0, jnp.int32(-2147483648) - 1 - i, i)


class _TileScalars:
    """Range metadata of one tile's candidate union (all SMEM scalars).

    The union has 2·c_max KCL-lane load slots: slots [0, c_max) hold the
    row-above range A (anchors (ty-1, tx-1..tx)), slots [c_max, 2·c_max)
    the same-row range B. Each range is a CONTIGUOUS span of the anchor-
    sorted slab ([s0, s1), boundary sb between the tx-1 and tx segments),
    loaded as an aligned cover from base."""

    def __init__(self, t, starts_ref, gx, num_tiles, c_max):
        self.t = t
        self.tx = t % gx
        self.ty = t // gx
        valid_t = t < num_tiles

        def st(i):
            return starts_ref[jnp.clip(i, 0, num_tiles)]

        jb = self.ty * gx
        self.sB0 = jnp.where(
            valid_t, st(jb + jnp.maximum(self.tx - 1, 0)), 0)
        self.sBb = jnp.where(valid_t, st(jb + self.tx), 0)
        self.sB1 = jnp.where(valid_t, st(jb + self.tx + 1), 0)
        has_a = jnp.logical_and(valid_t, self.ty > 0)
        ja = (self.ty - 1) * gx
        self.sA0 = jnp.where(has_a, st(ja + jnp.maximum(self.tx - 1, 0)), 0)
        self.sAb = jnp.where(has_a, st(ja + self.tx), 0)
        self.sA1 = jnp.where(has_a, st(ja + self.tx + 1), 0)
        self.baseA = (self.sA0 // KCL) * KCL
        self.baseB = (self.sB0 // KCL) * KCL
        nA = jnp.where(self.sA1 > self.sA0,
                       pl.cdiv(self.sA1 - self.baseA, KCL), 0)
        self.nchA = jnp.minimum(nA, c_max)
        nB = jnp.where(self.sB1 > self.sB0,
                       pl.cdiv(self.sB1 - self.baseB, KCL), 0)
        self.nchB = jnp.minimum(nB, c_max)
        self.c_max = c_max

    def slot(self, q):
        """(base, s0, sb, s1, nch, own_row, chunk_idx) of union slot q."""
        if q < self.c_max:
            return (self.baseA, self.sA0, self.sAb, self.sA1, self.nchA,
                    False, q)
        return (self.baseB, self.sB0, self.sBb, self.sB1, self.nchB,
                True, q - self.c_max)

    def chunk_live(self, q):
        _, _, _, _, nch, _, cq = self.slot(q)
        return cq < nch


def _merge_tile(
    r, sc: _TileScalars, union_get, ukey_ref, rank_ref, fldb_ref,
    ordered_ref, slab_dma, *,
    tile_size, c_max, k_cap, packed, profile_phase=3,
):
    """Load, touch-filter, rank, and one-hot-merge ONE tile's candidate
    union into ordered_ref[r] (f32 rows 0..8 = mx_local, my_local, ca,
    cb, cc, op, r, g, b, depth-ordered and compacted; lanes ≥ n_live are
    garbage and must be masked by the caller). Returns n_live (i32).

    Rank = exact global depth order: packed mode compares unique int
    keys (d16 << 12 | union_lane — ties impossible); exact mode compares
    (f32-sortable depth, union_lane) lexicographically. Dead (non-touch)
    lanes get unique keys above every live key, so they rank past
    n_live and fall off the ordered buffer or land in masked lanes —
    one-hot collisions cannot happen."""
    n_slots = 2 * c_max
    exact_keys = not packed

    # --- DMA the aligned covers ---------------------------------------
    for phase in range(2):
        for q in range(n_slots):
            base, _, _, _, nch, _, cq = sc.slot(q)

            @pl.when(cq < nch)
            def _(base=base, cq=cq, q=q, phase=phase):
                for d in slab_dma(r, q, base + cq * KCL):
                    d.start() if phase == 0 else d.wait()

    if profile_phase < 1:
        ordered_ref[r, :, :] = jnp.zeros_like(ordered_ref[r, :, :])
        return jnp.int32(0), jnp.int32(0)

    # --- per-lane touch + unique order keys ---------------------------
    # (assembled as full [1, C] rows and written ONCE — Mosaic handles
    # whole-row stores to multi-row scratch more reliably than repeated
    # partial-tile writes, and it's fewer stores)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, KCL), 1)
    n_live = jnp.int32(0)
    ukey_parts = []
    for q in range(n_slots):
        base, s0, sb, s1, nch, own_row, cq = sc.slot(q)
        sl = slice(q * KCL, (q + 1) * KCL)
        pos = base + cq * KCL + lane
        in_rng = jnp.logical_and(
            jnp.logical_and(pos >= s0, pos < s1), cq < nch)
        own_col = pos >= sb
        if packed:
            key_u = union_get(r, 0, sl)                   # u32
            d16 = (key_u & jnp.uint32(0xFFFF)).astype(jnp.int32)
            meta = (union_get(r, 6, sl) & jnp.uint32(0x7)).astype(jnp.int32)
        else:
            d16 = _sortable_i32(union_get(r, 9, sl))      # f4 row 1: depth
            meta = union_get(r, 10, sl).astype(jnp.int32)  # f4 row 2
        dup = (meta & 4) > 0
        wide = (meta & 2) > 0
        tall = (meta & 1) > 0
        not_dup = jnp.logical_not(dup)
        ok_col = jnp.logical_or(own_col, wide)
        if own_row:
            # dup entries touch exactly their own tile; anchors extend
            # left only when wide
            touch = jnp.logical_or(
                jnp.logical_and(dup, own_col),
                jnp.logical_and(not_dup, ok_col))
        else:
            # row-above entries: anchors only, and only when tall
            touch = jnp.logical_and(
                not_dup, jnp.logical_and(ok_col, tall))
        touch = jnp.logical_and(touch, in_rng)
        gidx = q * KCL + lane
        if exact_keys:
            ukey = jnp.where(touch, d16, jnp.int32(0x7FFFFFFF))
        else:
            ukey = jnp.where(touch, d16 * _order_mult(c_max) + gidx,
                             _dead_base(c_max) + gidx)
        ukey_parts.append(ukey)
        n_live = n_live + jnp.sum(touch.astype(jnp.int32))
    ukey_ref[r, 0:1, :] = jnp.concatenate(ukey_parts, axis=1)

    # --- rank: blocked compares, VPU column sums ----------------------
    # (ones-matmul colsums measured 2.5× slower — tools/anchor_micro.py)
    rank_parts = []
    for ci in range(n_slots):
        sl_i = slice(ci * KCL, (ci + 1) * KCL)

        def rank_ci(ci=ci, sl_i=sl_i):
            ki = ukey_ref[r, 0:1, sl_i]                   # [1, KCL]
            acc = jnp.zeros((1, KCL), jnp.float32)
            for cj in range(n_slots):
                sl_j = slice(cj * KCL, (cj + 1) * KCL)

                def blk(cj=cj, sl_j=sl_j, ki=ki, ci=ci):
                    kj = ukey_ref[r, 0:1, sl_j].reshape(KCL, 1)
                    less = kj < ki
                    if exact_keys:
                        # lexicographic (depth, union lane) tie-break
                        lj = (jax.lax.broadcasted_iota(
                            jnp.int32, (KCL, 1), 0) + cj * KCL)
                        li = (jax.lax.broadcasted_iota(
                            jnp.int32, (1, KCL), 1) + ci * KCL)
                        less = jnp.logical_or(
                            less, jnp.logical_and(kj == ki, lj < li))
                    return jnp.sum(less.astype(jnp.float32), axis=0,
                                   keepdims=True)

                acc = acc + jax.lax.cond(
                    sc.chunk_live(cj), blk,
                    lambda: jnp.zeros((1, KCL), jnp.float32))
            return acc

        rank_parts.append(jax.lax.cond(
            sc.chunk_live(ci), rank_ci,
            lambda: jnp.full((1, KCL), float(n_slots * KCL), jnp.float32)))
    rank_ref[r, 0:1, :] = jnp.concatenate(rank_parts, axis=1)

    if profile_phase < 2:
        ordered_ref[r, :, :] = jnp.zeros_like(ordered_ref[r, :, :])
        return jnp.int32(0), jnp.int32(0)

    # --- bf16 component rows for the exact one-hot permute ------------
    # source field order: mx_local, my_local, ca, cb, cc, op, r, g, b.
    # packed mode: mx/my split ×3 (f32), the rest are exact bf16 values
    # (they rode the sort as bf16 pairs) → 13 rows; exact mode: all nine
    # split ×3 → 27 rows.
    ts_f = float(tile_size)
    tx_px = sc.tx.astype(jnp.float32) * ts_f
    ty_px = sc.ty.astype(jnp.float32) * ts_f
    al = slice(None)
    if packed:
        fields = (
            _bitcast_f32(union_get(r, 1, al)) - tx_px,
            _bitcast_f32(union_get(r, 2, al)) - ty_px,
            _unpack_hi(union_get(r, 3, al)),
            _unpack_lo(union_get(r, 3, al)),
            _unpack_hi(union_get(r, 4, al)),
            _unpack_lo(union_get(r, 4, al)),
            _unpack_hi(union_get(r, 5, al)),
            _unpack_lo(union_get(r, 5, al)),
            _unpack_hi(union_get(r, 6, al)),
        )
        n_split = 2
    else:
        fields = (
            union_get(r, 0, al) - tx_px,
            union_get(r, 1, al) - ty_px,
            union_get(r, 2, al),
            union_get(r, 3, al),
            union_get(r, 4, al),
            union_get(r, 8, al),                          # op (f4 row 0)
            union_get(r, 5, al),
            union_get(r, 6, al),
            union_get(r, 7, al),
        )
        n_split = 9
    rows = []
    for k, f in enumerate(fields):
        if k < n_split:
            rows += list(_split3(f))
        else:
            rows.append(f.astype(jnp.bfloat16))
    fb_rows = fldb_ref.shape[1]
    c_cap = 2 * c_max * KCL
    fldb_ref[r, :, :] = jnp.concatenate(
        rows + [jnp.zeros((fb_rows - len(rows), c_cap), jnp.bfloat16)],
        axis=0)

    # --- one-hot merge into the ordered buffer ------------------------
    k_used = jnp.minimum(n_live, k_cap)
    kio = jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1)
    n_rows = len(rows)
    for oc in range(k_cap // KC):
        def merge_oc(oc=oc):
            acc = jnp.zeros((fb_rows, KC), jnp.float32)
            for ci in range(n_slots):
                sl_i = slice(ci * KCL, (ci + 1) * KCL)

                def blk(ci=ci, sl_i=sl_i, oc=oc):
                    rcol = rank_ref[r, 0:1, sl_i].reshape(
                        KCL, 1).astype(jnp.int32)
                    oh = (rcol == kio + oc * KC).astype(jnp.bfloat16)
                    return jnp.dot(fldb_ref[r, :, sl_i], oh,
                                   preferred_element_type=jnp.float32)

                acc = acc + jax.lax.cond(
                    sc.chunk_live(ci), blk,
                    lambda: jnp.zeros((fb_rows, KC), jnp.float32))
            return acc

        acc = jax.lax.cond(
            oc * KC < k_used, merge_oc,
            lambda: jnp.zeros((fb_rows, KC), jnp.float32))
        outs = []
        for k in range(9):
            if k < n_split:
                outs.append(acc[3 * k:3 * k + 1]
                            + acc[3 * k + 1:3 * k + 2]
                            + acc[3 * k + 2:3 * k + 3])
            else:
                j = 3 * n_split + (k - n_split)
                outs.append(acc[j:j + 1])
        out16 = jnp.concatenate(
            outs + [jnp.zeros((16 - 9, KC), jnp.float32)], axis=0)
        ordered_ref[r, :, oc * KC:(oc + 1) * KC] = out16
    del n_rows
    return n_live, k_used


def _fwd_kernel(
    starts_ref,            # SMEM [T+1] int32 (scalar prefetch)
    tiles_ref,             # SMEM [G_pad] int32: grid → tile id
    *refs,
    gx: int,
    num_tiles: int,
    tile_size: int,
    k_cap: int,
    c_max: int,
    alpha_cutoff: float,
    alpha_max: float,
    log_eps: float,
    r_tiles: int,
    packed: bool,
    early_exit: bool,
    profile_phase: int = 3,
):
    """Anchor forward: merge phase per tile (see _merge_tile), then the
    composite chunk loop ENTIRELY FROM VMEM — no per-chunk DMA, no lead
    masking (the ordered buffer starts at lane 0), and log(opacity)
    folded into the power clamp (alpha = min(exp(min(p', log op)), amax)
    ≡ min(op·exp(min(p, 0)), amax) with one [1, KC] log instead of a
    [R·P, KC] multiply)."""
    if packed:
        (slab_hbm, out_ref, fin_ref, union_ref, ukey_ref, rank_ref,
         fldb_ref, ordered_ref, sem_ref) = refs

        def union_get(r, k, sl):
            return union_ref[r, k:k + 1, sl]

        def slab_dma(r, q, off):
            off = pl.multiple_of(off, KCL)
            return [pltpu.make_async_copy(
                slab_hbm.at[:, pl.ds(off, KCL)],
                union_ref.at[r, :, pl.ds(q * KCL, KCL)],
                sem_ref.at[r, q, 0],
            )]
    else:
        (f8_hbm, f4_hbm, out_ref, fin_ref, union8_ref, union4_ref,
         ukey_ref, rank_ref, fldb_ref, ordered_ref, sem_ref) = refs

        def union_get(r, k, sl):
            if k < 8:
                return union8_ref[r, k:k + 1, sl]
            return union4_ref[r, k - 8:k - 7, sl]

        def slab_dma(r, q, off):
            off = pl.multiple_of(off, KCL)
            return [
                pltpu.make_async_copy(
                    f8_hbm.at[:, pl.ds(off, KCL)],
                    union8_ref.at[r, :, pl.ds(q * KCL, KCL)],
                    sem_ref.at[r, q, 0],
                ),
                pltpu.make_async_copy(
                    f4_hbm.at[:, pl.ds(off, KCL)],
                    union4_ref.at[r, :, pl.ds(q * KCL, KCL)],
                    sem_ref.at[r, q, 1],
                ),
            ]

    p = tile_size * tile_size
    R = r_tiles
    g0 = pl.program_id(0) * R

    # --- merge phase per tile ----------------------------------------
    k_useds = []
    for r in range(R):
        sc = _TileScalars(tiles_ref[g0 + r], starts_ref, gx, num_tiles,
                          c_max)
        _, k_used = _merge_tile(
            r, sc, union_get, ukey_ref, rank_ref, fldb_ref, ordered_ref,
            slab_dma, tile_size=tile_size, c_max=c_max, k_cap=k_cap,
            packed=packed, profile_phase=profile_phase)
        k_useds.append(k_used)

    max_chunks = pl.cdiv(k_useds[0], KC)
    for r in range(1, R):
        max_chunks = jnp.maximum(max_chunks, pl.cdiv(k_useds[r], KC))

    # --- composite chunk loop (from VMEM) -----------------------------
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
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1)

    def stack_scalar(vals, dtype):
        return jnp.concatenate(
            [jnp.broadcast_to(v.astype(dtype), (p, 1)) for v in vals],
            axis=0)

    kused_col = stack_scalar(k_useds, jnp.int32)     # [R·P, 1]
    n_kchunks = k_cap // KC
    log_cut = float(math.log(alpha_cutoff))

    def read_chunk(r, c):
        """ordered_ref[r][:, c·KC:(c+1)·KC] at traced c via lax.switch."""
        return jax.lax.switch(
            c, [lambda r=r, j=j: ordered_ref[r, :, j * KC:(j + 1) * KC]
                for j in range(n_kchunks)])

    def chunk_body(state):
        c, carry, acc4 = state            # carry [R·P, 1], acc4 [R·P, 4]
        powers, f4s = [], []
        for r in range(R):
            o = read_chunk(r, c)                          # [16, KC]
            mx = o[0:1, :]
            my = o[1:2, :]
            ca = o[2:3, :]
            cb = o[3:4, :]
            cc = o[4:5, :]
            op = o[5:6, :]
            rgb_rows = o[6:9, :]
            log_op = jnp.log(jnp.maximum(op, 1e-37))
            v_mat = jnp.concatenate(
                [
                    log_op - (0.5 * ca * mx * mx + cb * mx * my
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
            # the fold means power' = power + log(op); clamping at
            # log(op) reproduces the unfolded min(power, 0)
            powers.append(
                jnp.minimum(_dot_exact_bf16x3(u_mat, v_mat), log_op))
            f4s.append(jnp.concatenate(
                [rgb_rows, jnp.ones((1, KC), jnp.float32)], axis=0))
        power = jnp.concatenate(powers, axis=0)          # [R·P, KC]

        alpha = jnp.minimum(jnp.exp(power), alpha_max)
        g = c * KC + lane                                # [1, KC]
        okay = jnp.logical_and(g < kused_col, power >= log_cut)
        alpha = jnp.where(okay, alpha, 0.0)

        log1m = jnp.log1p(-alpha)
        cum = _dot_bf16x2(log1m, tri)                    # [R·P, KC]
        log_t_incl = carry + cum
        t_excl = jnp.exp(log_t_incl - log1m)
        w = jnp.where(log_t_incl < log_eps, 0.0, alpha * t_excl)

        acc4 = acc4 + jnp.concatenate(
            [
                _dot_general_bf16x3(
                    w[r * p:(r + 1) * p], f4s[r], (((1,), (1,)), ((), ()))
                )
                for r in range(R)
            ],
            axis=0,
        )                                  # [R·P, 4]
        carry = carry + cum[:, KC - 1: KC]
        return c + 1, carry, acc4

    init = (
        jnp.int32(0),
        jnp.zeros((R * p, 1), jnp.float32),
        jnp.zeros((R * p, 4), jnp.float32),
    )
    if early_exit:
        def chunk_cond(state):
            c, carry, *_ = state
            return jnp.logical_and(c < max_chunks,
                                   jnp.max(carry) >= log_eps)

        c_final, carry, acc4 = jax.lax.while_loop(
            chunk_cond, chunk_body, init)
    else:
        c_final, carry, acc4 = jax.lax.fori_loop(
            0, max_chunks, lambda i, s: chunk_body(s), init)

    out_ref[:, :, :] = acc4.reshape(R, p, 4)
    fin_ref[:, :, 0:1] = carry.reshape(R, p, 1)
    fin_ref[:, :, 1:2] = jnp.broadcast_to(
        c_final.astype(jnp.float32), (R, p, 1))


def composite_tiles_anchor(
    abins: AnchorBins,
    width: int,
    height: int,
    config: RenderConfig,
    interpret: bool = False,
    tile_ids: jnp.ndarray | None = None,
    r_tiles: int | None = None,
    profile_phase: int = 3,
):
    """Composite all (or a subset of) tiles from an anchor-sorted slab →
    (tiles [G, P, 4], fin [G, P, 2]). `profile_phase` truncates the
    kernel for stage attribution (tools/profile_anchor.py): 0 = DMA
    loads only, 1 = + touch/rank, 2 = + one-hot merge, 3 = full."""
    ts = config.tile_size
    gx, gy = config.grid_size(width, height)
    num_tiles = gx * gy
    p = ts * ts
    from .raster import k_cap_for

    k_cap = k_cap_for(config)
    c_max = _c_max(config)
    packed = abins.packed

    if tile_ids is None:
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    grid_n = tile_ids.shape[0]
    # the merge scratch (union + keys + ranks + bf16 rows + ordered) is
    # ~0.5 MB per in-group tile at default caps — cap the group at 4 to
    # stay inside scoped VMEM (the dup kernel's r_tiles=8 default is
    # tuned for its much smaller slab scratch)
    r = min(r_tiles or config.r_tiles, 4, grid_n)
    n_groups = -(-grid_n // r)
    pad = n_groups * r - grid_n
    tiles_padded = jnp.concatenate(
        [tile_ids.astype(jnp.int32),
         jnp.full((pad,), num_tiles, jnp.int32)])

    c_cap = 2 * c_max * KCL
    fb_rows = 16 if packed else 32
    kernel = functools.partial(
        _fwd_kernel,
        gx=gx,
        num_tiles=num_tiles,
        tile_size=ts,
        k_cap=k_cap,
        c_max=c_max,
        alpha_cutoff=config.alpha_cutoff,
        alpha_max=config.alpha_max,
        log_eps=float(math.log(config.transmittance_eps)),
        r_tiles=r,
        packed=packed,
        early_exit=config.early_exit,
        profile_phase=profile_phase,
    )
    common_scratch = [
        pltpu.VMEM((r, 8, c_cap), jnp.int32),     # ukey (8 sublanes pad)
        pltpu.VMEM((r, 8, c_cap), jnp.float32),   # rank
        pltpu.VMEM((r, fb_rows, c_cap), jnp.bfloat16),   # field rows
        pltpu.VMEM((r, 16, k_cap), jnp.float32),  # ordered buffer
    ]
    if packed:
        scratch = [pltpu.VMEM((r, 8, c_cap), jnp.uint32)] \
            + common_scratch + [pltpu.SemaphoreType.DMA((r, 2 * c_max, 1))]
    else:
        scratch = [
            pltpu.VMEM((r, 8, c_cap), jnp.float32),
            pltpu.VMEM((r, 4, c_cap), jnp.float32),
        ] + common_scratch + [pltpu.SemaphoreType.DMA((r, 2 * c_max, 2))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(abins.slab),
        out_specs=(
            pl.BlockSpec((r, p, 4), lambda g, s, t: (g, 0, 0)),
            pl.BlockSpec((r, p, 2), lambda g, s, t: (g, 0, 0)),
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
    )(abins.starts, tiles_padded, *abins.slab)
    return out[:grid_n], fin[:grid_n]


# ======================================================================
# Backward
# ======================================================================

from .raster import F_PAD


def _bwd_kernel(
    starts_ref,            # SMEM [T+1] int32
    tiles_ref,             # SMEM [G_pad] int32
    cfin_ref,              # SMEM [G_pad] int32: chunks the forward walked
    *refs,
    gx: int,
    num_tiles: int,
    tile_size: int,
    k_cap: int,
    c_max: int,
    alpha_cutoff: float,
    alpha_max: float,
    log_eps: float,
    packed: bool,
):
    """Anchor backward, one tile per grid step: redo the merge (same
    deterministic ranks as the forward), walk the ordered buffer
    back-to-front reconstructing per-chunk transmittance carries from
    the stored finals (raster_bwd's scheme), accumulate the nine pair-
    gradient rows in ORDERED space in VMEM — no per-chunk store DMA
    chain — then scatter them back to slab positions with the one-hot
    transpose and store per union chunk into one of FOUR exclusive row
    groups (range row-type × tile-column parity), merging only each
    range's first/last boundary blocks."""
    if packed:
        (slab_hbm, fin_ref, cot_ref, dzero_hbm, dpairs_hbm, union_ref,
         ukey_ref, rank_ref, fldb_ref, ordered_ref, go_ref, gl_ref,
         rd_ref, st_ref, sem_ref) = refs

        def union_get(r, k, sl):
            return union_ref[r, k:k + 1, sl]

        def slab_dma(r, q, off):
            off = pl.multiple_of(off, KCL)
            return [pltpu.make_async_copy(
                slab_hbm.at[:, pl.ds(off, KCL)],
                union_ref.at[r, :, pl.ds(q * KCL, KCL)],
                sem_ref.at[0, q, 0],
            )]
    else:
        (f8_hbm, f4_hbm, fin_ref, cot_ref, dzero_hbm, dpairs_hbm,
         union8_ref, union4_ref, ukey_ref, rank_ref, fldb_ref,
         ordered_ref, go_ref, gl_ref, rd_ref, st_ref, sem_ref) = refs

        def union_get(r, k, sl):
            if k < 8:
                return union8_ref[r, k:k + 1, sl]
            return union4_ref[r, k - 8:k - 7, sl]

        def slab_dma(r, q, off):
            off = pl.multiple_of(off, KCL)
            return [
                pltpu.make_async_copy(
                    f8_hbm.at[:, pl.ds(off, KCL)],
                    union8_ref.at[r, :, pl.ds(q * KCL, KCL)],
                    sem_ref.at[0, q, 0],
                ),
                pltpu.make_async_copy(
                    f4_hbm.at[:, pl.ds(off, KCL)],
                    union4_ref.at[r, :, pl.ds(q * KCL, KCL)],
                    sem_ref.at[0, q, 1],
                ),
            ]

    del dzero_hbm
    p = tile_size * tile_size
    g = pl.program_id(0)
    n_slots = 2 * c_max
    n_kchunks = k_cap // KC

    t = tiles_ref[g]
    sc = _TileScalars(t, starts_ref, gx, num_tiles, c_max)
    group_par = (sc.tx % 2).astype(jnp.int32)

    def group_of(q):
        """dpairs row group of union slot q: row-type (A=0, B=1) ×
        column parity."""
        rowtype = 0 if q < c_max else 1
        return rowtype * 2 + group_par

    # prefetch the 4 boundary merge blocks (first/last chunk per range)
    def rd_dma(slot, q_first, nch, base):
        cq = jnp.where(slot % 2 == 0, 0, jnp.maximum(nch - 1, 0))
        off = pl.multiple_of(base + cq * KCL, KCL)
        grp = group_of(q_first)
        return pltpu.make_async_copy(
            dpairs_hbm.at[pl.ds(grp * F_PAD, F_PAD), pl.ds(off, KCL)],
            rd_ref.at[slot],
            sem_ref.at[1, slot, 0],
        )

    # (slot 0, 1) = range A first/last, (2, 3) = range B first/last;
    # the last-block read starts only for multi-chunk ranges (a single-
    # chunk range's first block IS its last block)
    rd_meta = [
        (0, 0, sc.nchA, sc.baseA, 0), (1, 0, sc.nchA, sc.baseA, 1),
        (2, c_max, sc.nchB, sc.baseB, 0),
        (3, c_max, sc.nchB, sc.baseB, 1),
    ]
    for slot, q_first, nch, base, min_nch in rd_meta:
        @pl.when(nch > min_nch)
        def _(slot=slot, q_first=q_first, nch=nch, base=base):
            rd_dma(slot, q_first, nch, base).start()

    _, k_used = _merge_tile(
        0, sc, union_get, ukey_ref, rank_ref, fldb_ref, ordered_ref,
        slab_dma, tile_size=tile_size, c_max=c_max, k_cap=k_cap,
        packed=packed)
    useful = jnp.minimum(cfin_ref[g], pl.cdiv(k_used, KC))

    # zero the ordered-gradient accumulator
    go_ref[:, :] = jnp.zeros((F_PAD, k_cap), jnp.float32)

    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (pix % tile_size).astype(jnp.float32)
    py = (pix // tile_size).astype(jnp.float32)
    ones_p = jnp.ones((p, 1), jnp.float32)
    u_mat = jnp.concatenate(
        [ones_p, px, py, px * px, py * py, px * py,
         jnp.zeros((p, 2), jnp.float32)],
        axis=1,
    )
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 1)
    ).astype(jnp.float32)
    tri_strict_low = (
        jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 1)
    ).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1)
    log_cut = float(math.log(alpha_cutoff))
    cot = cot_ref[0]                                     # [P, 4]

    def read_chunk(c):
        return jax.lax.switch(
            c, [lambda j=j: ordered_ref[0, :, j * KC:(j + 1) * KC]
                for j in range(n_kchunks)])

    def body(i, carries):
        s_carry, carry_end = carries      # [P, 1] each
        c = jnp.maximum(useful - 1 - i, 0)
        o = read_chunk(c)
        mx = o[0:1, :]
        my = o[1:2, :]
        ca = o[2:3, :]
        cb = o[3:4, :]
        cc = o[4:5, :]
        op = o[5:6, :]
        rgb_rows = o[6:9, :]
        f4 = jnp.concatenate(
            [rgb_rows, jnp.ones((1, KC), jnp.float32)], axis=0)

        v_mat = jnp.concatenate(
            [
                -(0.5 * ca * mx * mx + cb * mx * my + 0.5 * cc * my * my),
                ca * mx + cb * my,
                cc * my + cb * mx,
                -0.5 * ca,
                -0.5 * cc,
                -cb,
                jnp.zeros((2, KC), jnp.float32),
            ],
            axis=0,
        )
        raw_power = _dot_exact_bf16x3(u_mat, v_mat)       # [P, KC]
        power = jnp.minimum(raw_power, 0.0)
        e_pow = jnp.exp(power)
        a_pre = op * e_pow
        alpha = jnp.minimum(a_pre, alpha_max)
        window = (c * KC + lane) < k_used
        dead = jnp.logical_or(alpha < alpha_cutoff,
                              jnp.logical_not(window))
        alpha = jnp.where(dead, 0.0, alpha)

        log1m = jnp.log1p(-alpha)
        cum = _dot_bf16x2(log1m, tri)
        colsum = cum[:, KC - 1: KC]
        carry_start = carry_end - colsum
        log_t_incl = carry_start + cum
        contrib = log_t_incl >= log_eps
        t_excl = jnp.exp(log_t_incl - log1m)
        w = jnp.where(contrib, alpha * t_excl, 0.0)

        rr = _dot_general_bf16x3(cot, f4, (((1,), (0,)), ((), ())))
        rw = rr * w
        suffix = _dot_bf16x2(rw, tri_strict_low)
        s_k = s_carry + suffix

        dalpha = jnp.where(
            jnp.logical_and(contrib, jnp.logical_not(dead)),
            t_excl * rr - s_k / (1.0 - alpha),
            0.0,
        )
        da_pre = jnp.where(a_pre > alpha_max, 0.0, dalpha)
        dpow_u = da_pre * a_pre
        dpow = jnp.where(raw_power > 0.0, 0.0, dpow_u)

        d_op = jnp.sum(da_pre * e_pow, axis=0, keepdims=True)
        mom = _dot_general_bf16x3(
            u_mat, dpow, (((0,), (0,)), ((), ())))        # [8, KC]
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
        gmat = _dot_general_bf16x3(
            cot, w, (((0,), (0,)), ((), ())))             # [4, KC]
        grads = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, gmat[0:1], gmat[1:2],
             gmat[2:3], d_op, jnp.zeros((F_PAD - 9, KC), jnp.float32)],
            axis=0,
        )                                                 # [F_PAD, KC]
        for j in range(n_kchunks):
            @pl.when(c == j)
            def _(j=j, grads=grads):
                go_ref[:, j * KC:(j + 1) * KC] = grads

        return (s_carry + jnp.sum(rw, axis=1, keepdims=True), carry_start)

    finc0 = fin_ref[0][:, 0:1]
    jax.lax.fori_loop(
        0, useful, body, (jnp.zeros((p, 1), jnp.float32), finc0))

    # --- scatter ordered grads back to slab positions ------------------
    # gl[:, union lane] = Σ_oc go[:, oc] @ one-hotᵀ — exact per lane
    # (single nonzero), bf16x2 components ≈ 2^-16 relative
    kio = jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1)
    for ci in range(n_slots):
        sl_i = slice(ci * KCL, (ci + 1) * KCL)

        def scat(ci=ci, sl_i=sl_i):
            rcol = rank_ref[0, 0:1, sl_i].reshape(KCL, 1).astype(jnp.int32)
            acc = jnp.zeros((F_PAD, KCL), jnp.float32)
            for oc in range(n_kchunks):
                def one(oc=oc, rcol=rcol):
                    # [F_PAD, KC_o] × [KCL, KC_o] contract KC_o →
                    # [F_PAD, KCL]; one nonzero per output lane, bf16x2
                    # components ≈ 2^-16 relative
                    oh = (rcol == kio + oc * KC).astype(jnp.bfloat16)
                    goc = go_ref[:, oc * KC:(oc + 1) * KC]
                    h = goc.astype(jnp.bfloat16)
                    l1 = (goc - h.astype(jnp.float32)).astype(jnp.bfloat16)
                    dims = (((1,), (1,)), ((), ()))
                    return (
                        jax.lax.dot_general(
                            h, oh, dims,
                            preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                            l1, oh, dims,
                            preferred_element_type=jnp.float32)
                    )

                acc = acc + jax.lax.cond(
                    oc < pl.cdiv(k_used, KC), one,
                    lambda: jnp.zeros((F_PAD, KCL), jnp.float32))
            return acc

        gl = jax.lax.cond(
            sc.chunk_live(ci), scat,
            lambda: jnp.zeros((F_PAD, KCL), jnp.float32))
        gl_ref[:, sl_i] = gl

    # --- store per union chunk into its row group ----------------------
    # chunk 0 merges the prefetched first block (leading lanes belong to
    # the previous same-group tile's segment); the last chunk of a
    # multi-chunk range merges the last block (trailing lanes belong to
    # the NEXT same-group tile); interior chunks are pure stores of the
    # [s0, s1)-masked gradients. Sequential grid execution + the store
    # drains below order cross-step accesses to shared boundary blocks.
    lane_l = jax.lax.broadcasted_iota(jnp.int32, (1, KCL), 1)

    def store_dma(q, base, cq, grp):
        off = pl.multiple_of(base + cq * KCL, KCL)
        return pltpu.make_async_copy(
            st_ref.at[q],
            dpairs_hbm.at[pl.ds(grp * F_PAD, F_PAD), pl.ds(off, KCL)],
            sem_ref.at[2, q, 0],
        )

    for q in range(n_slots):
        base, s0, _, s1, nch, _, cq = sc.slot(q)   # cq is STATIC
        grp = group_of(q)
        rd_f = 0 if q < c_max else 2
        sl = slice(q * KCL, (q + 1) * KCL)

        @pl.when(cq < nch)
        def _(q=q, base=base, s0=s0, s1=s1, nch=nch, cq=cq, grp=grp,
              rd_f=rd_f, sl=sl):
            pos = base + cq * KCL + lane_l
            mine = jnp.logical_and(pos >= s0, pos < s1)
            blk = gl_ref[:, sl]
            is_last = cq == nch - 1

            if cq == 0:
                # first block (also the single-chunk case, where the
                # whole block incl. trailing lanes rode in with rd_f)
                rd_dma(rd_f, q, nch, base).wait()
                st_ref[q] = jnp.where(mine, blk, rd_ref[rd_f])
            else:
                @pl.when(is_last)
                def _():
                    rd_dma(rd_f + 1, q, nch, base).wait()
                    st_ref[q] = jnp.where(mine, blk, rd_ref[rd_f + 1])

                @pl.when(jnp.logical_not(is_last))
                def _():
                    st_ref[q] = jnp.where(mine, blk, 0.0)

            store_dma(q, base, cq, grp).start()

    for q in range(n_slots):
        base, _, _, _, nch, _, cq = sc.slot(q)
        grp = group_of(q)

        @pl.when(cq < nch)
        def _(q=q, base=base, cq=cq, grp=grp):
            store_dma(q, base, cq, grp).wait()


def backward_anchor_grads(
    abins: AnchorBins,
    fin: jnp.ndarray,             # [G, P, 2] forward finals
    cot_tiles: jnp.ndarray,       # [G, P, 4] cotangents per tile pixel
    width: int,
    height: int,
    config: RenderConfig,
    interpret: bool = False,
    tile_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Run the anchor backward kernel → pair gradients [4·F_PAD, M_pad]
    (row groups: range row-type × tile-column parity; sum the groups
    then fold with _fold_pair_grads)."""
    ts = config.tile_size
    gx, gy = config.grid_size(width, height)
    num_tiles = gx * gy
    p = ts * ts
    from .raster import k_cap_for

    k_cap = k_cap_for(config)
    c_max = _c_max(config)
    packed = abins.packed
    m_pad = abins.slab[0].shape[1]
    if tile_ids is None:
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    grid_n = tile_ids.shape[0]

    cfin_s = fin[:, 0, 1].astype(jnp.int32)
    c_cap = 2 * c_max * KCL
    fb_rows = 16 if packed else 32

    kernel = functools.partial(
        _bwd_kernel,
        gx=gx,
        num_tiles=num_tiles,
        tile_size=ts,
        k_cap=k_cap,
        c_max=c_max,
        alpha_cutoff=config.alpha_cutoff,
        alpha_max=config.alpha_max,
        log_eps=float(math.log(config.transmittance_eps)),
        packed=packed,
    )
    common_scratch = [
        pltpu.VMEM((1, 8, c_cap), jnp.int32),     # ukey
        pltpu.VMEM((1, 8, c_cap), jnp.float32),   # rank
        pltpu.VMEM((1, fb_rows, c_cap), jnp.bfloat16),
        pltpu.VMEM((1, 16, k_cap), jnp.float32),  # ordered
        pltpu.VMEM((F_PAD, k_cap), jnp.float32),  # go: ordered grads
        pltpu.VMEM((F_PAD, c_cap), jnp.float32),  # gl: loaded-space grads
        pltpu.VMEM((4, F_PAD, KCL), jnp.float32),  # rd: boundary reads
        pltpu.VMEM((2 * c_max, F_PAD, KCL), jnp.float32),  # st staging
        pltpu.SemaphoreType.DMA((3, 2 * c_max, 2)),
    ]
    if packed:
        scratch = [pltpu.VMEM((1, 8, c_cap), jnp.uint32)] + common_scratch
    else:
        scratch = [
            pltpu.VMEM((1, 8, c_cap), jnp.float32),
            pltpu.VMEM((1, 4, c_cap), jnp.float32),
        ] + common_scratch
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid_n,),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * len(abins.slab)
            + [
                pl.BlockSpec((1, p, 2), lambda g, s, t, c: (g, 0, 0)),
                pl.BlockSpec((1, p, 4), lambda g, s, t, c: (g, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),      # dzero
            ]
        ),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )
    dzero = jnp.zeros((4 * F_PAD, m_pad), jnp.float32)
    dzero_idx = 3 + len(abins.slab) + 2
    dpairs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4 * F_PAD, m_pad), jnp.float32),
        input_output_aliases={dzero_idx: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        abins.starts,
        tile_ids.astype(jnp.int32),
        cfin_s,
        *abins.slab,
        fin,
        cot_tiles,
        dzero,
    )
    return dpairs


def _forward_anchor(splats, width, height, config, interpret):
    from ..rasterize import assemble_image

    ts = config.tile_size
    gx, gy = config.grid_size(width, height)
    abins = bin_splats_anchor(splats, width, height, config)
    tiles, fin = composite_tiles_anchor(
        abins, width, height, config, interpret=interpret)
    out = assemble_image(tiles.reshape(-1, ts, ts, 4), width, height,
                         gx, gy)
    stats = {"num_pairs": abins.bins.num_pairs,
             "overflow": abins.bins.overflow}
    return (out[..., :3], out[..., 3], stats), (splats, abins, fin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def rasterize_anchor(splats, width, height, config, interpret=False):
    """Anchor-binned bin + composite in one differentiable op →
    (rgb, alpha, stats) — the round-4 replacement for
    raster.rasterize_pallas (config.binning == 'anchor'). Same API and
    semantics; the binning sort runs inside the custom-VJP boundary and
    depth ordering happens in-kernel (merge phase)."""
    out, _ = _forward_anchor(splats, width, height, config, interpret)
    return out


def _fwd_anchor(splats, width, height, config, interpret=False):
    return _forward_anchor(splats, width, height, config, interpret)


def _bwd_anchor(width, height, config, interpret, residuals, cotangent):
    import numpy as np

    from .raster import _cot_to_tiles, _fold_pair_grads

    splats, abins, fin = residuals
    n = splats.depth.shape[0]
    d_rgb, d_alpha, _ = cotangent

    cot_tiles = _cot_to_tiles((d_rgb, d_alpha), width, height, config)
    dpairs = backward_anchor_grads(
        abins, fin, cot_tiles, width, height, config, interpret=interpret)
    # sum the four hazard row groups → one F_PAD group for the fold
    m_pad = dpairs.shape[1]
    dsum = dpairs.reshape(4, F_PAD, m_pad).sum(axis=0)
    seg = _fold_pair_grads(dsum, abins.bins, n, config)

    d_splats = ProjectedSplats(
        mean2d=seg[:, 0:2],
        conic=seg[:, 2:5],
        depth=jnp.zeros_like(splats.depth),
        radius=jnp.zeros_like(splats.radius),
        rgb=seg[:, 5:8],
        opacity=seg[:, 8],
        valid=np.zeros(splats.valid.shape, jax.dtypes.float0),
    )
    return (d_splats,)


rasterize_anchor.defvjp(_fwd_anchor, _bwd_anchor)
