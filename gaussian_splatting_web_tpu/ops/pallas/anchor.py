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
    """Merge-phase load chunks per anchor range (static): enough for
    max_per_tile candidates plus one chunk of alignment lead."""
    return config.max_per_tile // KCL + 1
