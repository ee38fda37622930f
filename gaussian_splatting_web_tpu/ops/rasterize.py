"""Tile rasterizer: front-to-back alpha compositing over binned splats.

This is the reference's fragment stage + blend unit (simple_render.ts:169-200
with the one-minus-dst-alpha/one "under" blend state, :454-471) re-designed
for TPU:

  * Pixels live in tiles of `tile_size`² (= 256 = 2×128 lanes) so every
    per-pixel quantity is a well-shaped VPU vector.
  * The inherently sequential front-to-back transmittance recurrence
    T_{k+1} = T_k (1 - α_k) is replaced by an *exclusive cumulative sum of
    log(1-α)* along the depth-sorted splat axis: w_k = α_k exp(Σ_{j<k}
    log(1-α_j)). A cumsum is a parallel scan XLA maps well to the VPU, the
    whole compositor becomes a few dense element-wise ops + reductions, and —
    crucially — it is differentiable by construction, so the backward pass
    (the INRIA hand-written back-to-front CUDA kernel) falls out of jax.grad.
  * INRIA early termination (stop before the splat that would push
    transmittance under 1e-4) is an exact masked `cummax` instead of a loop
    break, so results bit-match the sequential formulation.
  * Tiles are processed in chunks via `lax.map` with a checkpointed body:
    the backward pass re-gathers and recomputes per-chunk activations
    instead of storing O(tiles × splats × pixels) residuals.

A fused Pallas kernel with identical semantics lives in ops/pallas/ for the
single-chip hot path; this module is the portable (CPU/TPU) and batching-
friendly implementation and the ground truth for it.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..core.types import CameraParams, GaussianCloud
from .projection import ProjectedSplats, project_gaussians
from .sort import TileBins, bin_splats


NUM_FIELDS = 9   # mx, my, conic_a, conic_b, conic_c, r, g, b, opacity
FIELD_ROW = 16   # row width the fields are padded to before the gather


def _pair_tiles(bins: TileBins, m: int) -> jnp.ndarray:
    """Tile id owning each position of the sorted pair array (positions
    past the last segment return the last tile — dead padding). Used by
    the gather fallbacks to apply the tile-relative mean16 quantization
    the payload path bakes in at pack time."""
    pos = jnp.arange(m, dtype=bins.tile_start.dtype)
    ti = jnp.searchsorted(bins.tile_start, pos, side="right").astype(
        jnp.int32) - 1
    return jnp.clip(ti, 0, None)


def _quantize_mean16_global(mx, my, bins: TileBins, gx: int, ts: int):
    """Tile-relative mean16 round-trip expressed on GLOBAL coordinates:
    rel_q + tile_origin is exact in f32 (both multiples of 1/32 below
    2^17·1/32), so the kernel's later origin subtract recovers rel_q
    bit-exactly and the XLA compositor's quantize_mean16 re-application
    is the identity."""
    from .sort import quantize_mean16

    ti = _pair_tiles(bins, mx.shape[0])
    tx = (ti % gx).astype(jnp.float32) * ts
    ty = (ti // gx).astype(jnp.float32) * ts
    return (quantize_mean16(mx - tx) + tx,
            quantize_mean16(my - ty) + ty)


def pack_sorted_fields(
    splats: ProjectedSplats, bins: TileBins, pad: int,
    quantize: bool = False, mean16: tuple | None = None,
) -> jnp.ndarray:
    """Gather splat appearance fields into (tile, depth)-sorted pair order.

    One contiguous [M + pad, 16] row gather replaces the per-tile
    [tiles × max_per_tile] element gathers that dominated raster time
    (padding-heavy gathers are the TPU's weakest access pattern; after this,
    every tile's splat list is a *contiguous slab* readable with a dynamic
    slice or a straight DMA). Rows are padded 9 → 16 lanes BEFORE the
    gather: 64-byte aligned rows gather ~5x faster than 36-byte ones
    (measured 4.8 vs 27 ns/row on v5e). `pad` zero rows keep end-of-array
    slices in bounds.

    With `quantize` (config.pack_fields), conic/rgb/opacity go through the
    same bf16 round-trip the fused kernel's packed sort payloads apply
    (ops.sort.pack_bf16_pair), keeping the two compositor paths
    semantically identical under the shipped config.
    """
    from .sort import quantize_bf16

    q = quantize_bf16 if quantize else (lambda x: x)
    packed = jnp.stack(
        [
            splats.mean2d[:, 0],
            splats.mean2d[:, 1],
            q(splats.conic[:, 0]),
            q(splats.conic[:, 1]),
            q(splats.conic[:, 2]),
            q(splats.rgb[:, 0]),
            q(splats.rgb[:, 1]),
            q(splats.rgb[:, 2]),
            q(splats.opacity),
        ]
        + [jnp.zeros_like(splats.opacity)] * (FIELD_ROW - NUM_FIELDS),
        axis=-1,
    )                                                        # [N, 16]
    sorted_fields = packed[bins.sorted_gidx]                 # [M, 16]
    if mean16 is not None:
        gx, ts = mean16
        qx, qy = _quantize_mean16_global(
            sorted_fields[:, 0], sorted_fields[:, 1], bins, gx, ts)
        sorted_fields = jnp.concatenate(
            [qx[:, None], qy[:, None], sorted_fields[:, 2:]], axis=1)
    return jnp.concatenate(
        [sorted_fields, jnp.zeros((pad, FIELD_ROW), sorted_fields.dtype)]
    )


def pack_sorted_fields_split(
    splats: ProjectedSplats, bins: TileBins, pad: int,
    quantize: bool = False, mean16: tuple | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather splat fields into pair order as TWO narrow row arrays:
    [M+pad, 8] = (mx, my, conic_a, conic_b, conic_c, r, g, b) and
    [M+pad, 4] = (opacity, 0, 0, 0).

    Row-gather cost on v5e is strongly super-linear in row width (measured
    14.9 ns/row at 64 B vs 5.6 ns/row at 32 B at 3M rows), so one 64-byte
    gather loses to an aligned 32-byte + 16-byte pair by ~40%. The Pallas
    compositor streams the two arrays with two DMAs per chunk.

    `quantize` applies the config.pack_fields bf16 round-trip (see
    pack_sorted_fields) so this fallback matches the payload path.
    """
    from .sort import quantize_bf16

    q = quantize_bf16 if quantize else (lambda x: x)
    z = jnp.zeros_like(splats.opacity)
    p8 = jnp.stack(
        [
            splats.mean2d[:, 0],
            splats.mean2d[:, 1],
            q(splats.conic[:, 0]),
            q(splats.conic[:, 1]),
            q(splats.conic[:, 2]),
            q(splats.rgb[:, 0]),
            q(splats.rgb[:, 1]),
            q(splats.rgb[:, 2]),
        ],
        axis=-1,
    )
    p4 = jnp.stack([q(splats.opacity), z, z, z], axis=-1)
    s8 = p8[bins.sorted_gidx]
    s4 = p4[bins.sorted_gidx]
    if mean16 is not None:
        gx, ts = mean16
        qx, qy = _quantize_mean16_global(s8[:, 0], s8[:, 1], bins, gx, ts)
        s8 = jnp.concatenate([qx[:, None], qy[:, None], s8[:, 2:]], axis=1)
    return (
        jnp.concatenate([s8, jnp.zeros((pad, 8), s8.dtype)]),
        jnp.concatenate([s4, jnp.zeros((pad, 4), s4.dtype)]),
    )


@jax.custom_jvp
def _power_bf16x3(u_mat, v_mat):
    """power[C,K,P] = Σ_b u[P,b]·v[C,K,b] via the SAME three-pass bf16
    decomposition as the fused kernel's _dot_exact_bf16x3: identical bf16
    roundings of identical v values and f32-accumulated MXU contractions
    of the same terms make `power` agree with the kernel TO THE BIT, so
    the discrete decisions downstream (1/255 cutoff, 0.99 clamp, 1e-4
    early exit) cannot flip between the two compositor paths. This
    replaced a precision=HIGHEST f32 einsum whose ~1e-6 disagreement
    caused the grad-parity max tail (a handful of 0.99-clamp tie flips at
    ~3e-2; VERDICT r4 item 6). Custom JVP because plain AD would route
    tangents through the bf16 round-trips (the correction branches cancel
    them to bf16 precision — measured 0.2-0.7 abs mean2d grad
    corruption); the true tangent of a rounded-operand matmul is the
    exact linear map, computed at HIGHEST precision."""
    ub = u_mat.astype(jnp.bfloat16)
    v1 = v_mat.astype(jnp.bfloat16)
    r1 = v_mat - v1.astype(jnp.float32)
    v2 = r1.astype(jnp.bfloat16)
    v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
    ein = partial(jnp.einsum, "pb,ckb->ckp",
                  preferred_element_type=jnp.float32)
    return ein(ub, v1) + ein(ub, v2) + ein(ub, v3)


@_power_bf16x3.defjvp
def _power_bf16x3_jvp(primals, tangents):
    u, v = primals
    du, dv = tangents
    ein = partial(jnp.einsum, "pb,ckb->ckp",
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    # du is an instantiated-zeros tangent when u is a constant (the pixel
    # basis); XLA's simplifier folds the zero contraction away
    return _power_bf16x3(u, v), ein(u, dv) + ein(du, v)


def _composite_chunk(
    tile_ids: jnp.ndarray,          # [C] int32
    sorted_fields: jnp.ndarray,     # [M + K, 9] (pack_sorted_fields)
    bins: TileBins,
    gx: int,
    config: RenderConfig,
) -> jnp.ndarray:
    """Rasterize a chunk of tiles → [C, P, 4] (rgb, alpha), P = tile_size²."""
    ts = config.tile_size
    k_cap = config.max_per_tile
    c = tile_ids.shape[0]
    p = ts * ts

    start = bins.tile_start[tile_ids]                       # [C]
    count = jnp.minimum(bins.tile_count[tile_ids], k_cap)   # [C]

    k = jnp.arange(k_cap, dtype=jnp.int32)                  # [K]
    live = k[None, :] < count[:, None]                      # [C, K]

    slab = jax.vmap(
        lambda s: jax.lax.dynamic_slice(
            sorted_fields, (s, 0), (k_cap, FIELD_ROW)
        )
    )(start)                                                 # [C, K, 9]
    mean = slab[..., 0:2]
    conic = slab[..., 2:5]
    rgb = slab[..., 5:8]
    opac = slab[..., 8]

    if config.debug_selected >= 0 and bins.sorted_gidx is not None:
        # "selected splat" highlight (simple_render.ts:171,181-190): the
        # chosen gaussian composites magenta at ≥0.9 alpha so its actual
        # screen footprint is visible through the normal blend stack
        gidx_p = jnp.concatenate(
            [bins.sorted_gidx,
             jnp.full((k_cap,), -1, bins.sorted_gidx.dtype)])
        gid_slab = jax.vmap(
            lambda s: jax.lax.dynamic_slice(gidx_p, (s,), (k_cap,))
        )(start)                                             # [C, K]
        sel = gid_slab == config.debug_selected
        rgb = jnp.where(sel[..., None],
                        jnp.asarray([1.0, 0.0, 1.0], rgb.dtype), rgb)
        opac = jnp.where(sel, jnp.maximum(opac, 0.9), opac)

    # TILE-LOCAL pixel coordinates, falloff as the SAME rank-6 bilinear
    # form the fused Pallas kernel evaluates (power is quadratic in the
    # pixel coords: power = Σ_b u_b(px,py)·v_b(splat); raster.py
    # chunk_body): aligning the algebra keeps the two compositor paths'
    # power values within the kernel's bf16x3 error (~1e-6 abs) instead
    # of ~1e-5 from a differently-associated direct conic evaluation, so
    # the discrete masks (1/255 cutoff, 0.99 clamp, 1e-4 early exit)
    # almost never flip between paths (VERDICT r2 item 6: grad-parity
    # max tail).
    tx = (tile_ids % gx).astype(jnp.float32) * ts           # [C]
    ty = (tile_ids // gx).astype(jnp.float32) * ts
    u = jnp.arange(ts, dtype=jnp.float32)
    px = jnp.broadcast_to(u[None, :], (ts, ts)).reshape(p)  # [P] tile-local
    py = jnp.broadcast_to(u[:, None], (ts, ts)).reshape(p)
    u_mat = jnp.stack(
        [jnp.ones((p,), jnp.float32), px, py, px * px, py * py, px * py],
        axis=1,
    )                                                       # [P, 6]

    mxl = mean[..., 0] - tx[:, None]                        # [C, K] local
    myl = mean[..., 1] - ty[:, None]
    if config.pack_fields and config.pack_mean16:
        # identical to the packed payload path's tile-relative u16
        # round-trip (ops.sort.pack_mean16_rel; straight-through grad)
        from .sort import quantize_mean16

        mxl = quantize_mean16(mxl)
        myl = quantize_mean16(myl)
    ca, cb, cc = conic[..., 0], conic[..., 1], conic[..., 2]
    # log(opacity) + the liveness mask fold into the constant row, exactly
    # as in the fused kernel (ops/pallas/raster.py chunk_body): alpha =
    # exp(power) directly and the 1/255 cutoff (:191-193) becomes a
    # compare on power. LOG_PAD (finite) kills dead slots via the cutoff.
    from .pallas.raster import LOG_PAD

    row0_extra = jnp.where(
        live, jnp.log(jnp.maximum(opac, 1e-30)), LOG_PAD)   # [C, K]
    v_mat = jnp.stack(
        [
            row0_extra
            - (0.5 * ca * mxl * mxl + cb * mxl * myl + 0.5 * cc * myl * myl),
            ca * mxl + cb * myl,
            cc * myl + cb * mxl,
            -0.5 * ca,
            -0.5 * cc,
            -cb,
        ],
        axis=-1,
    )                                                       # [C, K, 6]
    # Three-pass bf16 evaluation, the SAME decomposition as the fused
    # kernel's _dot_exact_bf16x3 (u is exact in bf16 — small integers):
    # identical bf16 roundings of identical v values and an f32-accumulated
    # MXU contraction of the same terms make `power` agree with the kernel
    # to the bit on TPU (and through interpret mode on CPU) — so the
    # discrete decisions downstream (1/255 cutoff, 0.99 clamp, 1e-4 early
    # exit on the carry) cannot flip between the two compositor paths from
    # power disagreement. This replaced a precision=HIGHEST f32 einsum
    # whose ~1e-6 disagreement with the kernel caused the grad-parity
    # max tail (a handful of 0.99-clamp tie flips at ~3e-2; VERDICT r4
    # item 6). Zero-padding differences in the contracted dim are exact
    # (adding 0.0 terms), so the 6-row form matches the kernel's 8-row.
    power = _power_bf16x3(u_mat, v_mat)                  # [C, K, P]
    alpha = jnp.where(
        power >= math.log(config.alpha_cutoff),
        jnp.minimum(jnp.exp(power), config.alpha_max), 0.0)

    # transmittance via exclusive cumsum of log(1-α)
    log1m = jnp.log1p(-alpha)
    log_t_incl = jnp.cumsum(log1m, axis=1)
    log_t_excl = log_t_incl - log1m
    # INRIA early termination: a splat contributes only if it would leave
    # T·(1-α) ≥ ε, and nothing after the first violator contributes.
    done = jnp.logical_not(
        jax.lax.cummax(
            (log_t_incl < jnp.log(config.transmittance_eps)).astype(jnp.int32),
            axis=1,
        )
        == 0
    )
    w = jnp.where(done, 0.0, alpha * jnp.exp(log_t_excl))   # [C, K, P]

    color = jnp.einsum("ckp,ckq->cpq", w, rgb)              # [C, P, 3]
    alpha_out = jnp.sum(w, axis=1)                          # [C, P]
    return jnp.concatenate([color, alpha_out[..., None]], axis=-1)


def composite_tiles(
    splats: ProjectedSplats,
    bins: TileBins,
    tile_ids: jnp.ndarray,
    gx: int,
    config: RenderConfig,
) -> jnp.ndarray:
    """Composite an arbitrary flat list of tile ids → [T, ts, ts, 4].

    `len(tile_ids)` must be a multiple of config.tile_chunk (pad with
    repeated ids). Shared by the single-chip path and the shard_map
    tile-sharded path (each device passes its owned tile ids).
    """
    ts = config.tile_size
    chunk = min(config.tile_chunk, tile_ids.shape[0])
    n_chunks = tile_ids.shape[0] // chunk
    assert n_chunks * chunk == tile_ids.shape[0], "pad tile_ids to a chunk multiple"

    sorted_fields = pack_sorted_fields(
        splats, bins, pad=config.max_per_tile,
        quantize=config.pack_fields,
        mean16=((gx, config.tile_size)
                if config.pack_fields and config.pack_mean16 else None))
    body = jax.checkpoint(
        partial(
            _composite_chunk,
            sorted_fields=sorted_fields,
            bins=bins,
            gx=gx,
            config=config,
        )
    )
    out = jax.lax.map(body, tile_ids.reshape(n_chunks, chunk))  # [n, C, P, 4]
    return out.reshape(tile_ids.shape[0], ts, ts, 4)


def composite_tiles_auto(
    splats: ProjectedSplats,
    tile_ids: jnp.ndarray,
    width: int,
    height: int,
    config: RenderConfig,
    gx: int,
    platform: str | None = None,
) -> jnp.ndarray:
    """Composite a tile-id subset → [T, ts, ts, 4], dispatching like
    render_impl: the fused Pallas kernel on TPU, the portable lax.map
    compositor elsewhere. Used by the shard_map tile-sharded paths (each
    device passes the tiles it owns); binning happens internally (inside
    the kernel's custom-VJP boundary on the Pallas path).

    `platform` must be the platform the computation actually runs on —
    sharded callers pass their mesh's device platform, because a virtual
    CPU mesh can coexist with a registered TPU default backend (the
    dryrun_multichip configuration)."""
    ts = config.tile_size
    if platform is None:
        platform = jax.default_backend()
    if config.use_pallas == "always" or (
        config.use_pallas == "auto" and platform == "tpu"
    ):
        from .pallas.raster import composite_tiles_subset_pallas

        tiles = composite_tiles_subset_pallas(
            splats, tile_ids, width, height, config
        )
        return tiles.reshape(-1, ts, ts, 4)
    bins = bin_splats(splats, width, height, config)
    return composite_tiles(splats, bins, tile_ids, gx, config)


def assemble_image(
    tiles_out: jnp.ndarray, width: int, height: int, gx: int, gy: int
) -> jnp.ndarray:
    """[gx·gy(+pad), ts, ts, 4] (row-major tile order) → [H, W, 4]."""
    ts = tiles_out.shape[1]
    out = tiles_out[: gx * gy]
    out = out.reshape(gy, gx, ts, ts, 4).transpose(0, 2, 1, 3, 4)
    return out.reshape(gy * ts, gx * ts, 4)[:height, :width]


def rasterize_tiles(
    splats: ProjectedSplats,
    bins: TileBins,
    width: int,
    height: int,
    config: RenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite all tiles → (rgb [H, W, 3], alpha [H, W])."""
    gx, gy = config.grid_size(width, height)
    num_tiles = gx * gy
    chunk = min(config.tile_chunk, num_tiles)
    padded = -(-num_tiles // chunk) * chunk
    tile_ids = jnp.arange(padded, dtype=jnp.int32) % num_tiles
    out = composite_tiles(splats, bins, tile_ids, gx, config)
    out = assemble_image(out, width, height, gx, gy)
    return out[..., :3], out[..., 3]


def select_fused_rasterizer(width: int, height: int, config: RenderConfig):
    """Fused bin+composite op for the configured binning architecture:
    (splats, w, h, config) → (rgb, alpha, stats). 'anchor' needs the
    tile id to fit 16 packed key bits — beyond-4K frames fall back to
    the duplicated-slot path."""
    if (config.binning == "anchor"
            and (config.num_tiles(width, height) < (1 << 16)
                 or not config.pack_fields)):
        from .pallas.anchor import rasterize_anchor

        return rasterize_anchor
    from .pallas.raster import rasterize_pallas

    return rasterize_pallas


def render_impl(
    cloud: GaussianCloud,
    camera: CameraParams,
    width: int,
    height: int,
    config: RenderConfig = RenderConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full forward render: project → bin → composite (+ background).

    The end-to-end analogue of the reference's per-frame draw()
    (renderer.ts:301-330: key-init pass → radix sort → instanced raster →
    blend), collapsed into one jittable program. Use `render` for the jitted
    entry point; use this inside larger jitted computations (loss functions,
    shard_map bodies).

    Returns (image [H, W, 3], aux) where aux carries alpha and binning stats.
    """
    if config.dtype not in ("float32", "f32"):
        # apply the configured scene-storage policy (bf16 SH/scale/quat/
        # opacity, f32 positions) so RenderConfig(dtype=...) acts even when
        # the caller didn't pre-convert the cloud; no-op on an already-
        # converted cloud
        cloud = cloud.with_storage_dtype(config.dtype)
    splats = project_gaussians(cloud, camera, width, height, config)

    if config.debug_selected < 0 and (config.use_pallas == "always" or (
        config.use_pallas == "auto" and jax.default_backend() == "tpu"
    )):
        # binning runs inside the fused op's custom-VJP boundary so the
        # splat fields can ride the binning sort as payloads (no pair
        # gather) without XLA AD transposing the sort.
        rasterize_fused = select_fused_rasterizer(width, height, config)
        rgb, alpha, stats = rasterize_fused(splats, width, height, config)
        num_pairs, overflow = stats["num_pairs"], stats["overflow"]
    else:
        bins = bin_splats(splats, width, height, config)
        rgb, alpha = rasterize_tiles(splats, bins, width, height, config)
        num_pairs, overflow = bins.num_pairs, bins.overflow

    bg = jnp.asarray(config.background, dtype=rgb.dtype)
    img = rgb + (1.0 - alpha[..., None]) * bg
    aux = {
        "alpha": alpha,
        "num_pairs": num_pairs,
        "overflow": overflow,
        "num_visible": jnp.sum(splats.valid.astype(jnp.int32)),
    }
    return img, aux


render = partial(jax.jit, static_argnums=(2, 3, 4))(render_impl)
