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
(tile,depth)-sorted pair-gradient array with read-add-write DMA (adjacent
tiles share boundary 128-lane blocks; grid steps execute sequentially so
RMW is race-free). A single XLA segment-sum then folds pair gradients onto
splats.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RenderConfig
from .raster import F_PAD, KC, _dot_bf16x2, _dot_exact_bf16x3, _dot_general_bf16x3


def _bwd_kernel(
    starts_ref,            # SMEM [T] int32
    counts_ref,            # SMEM [T] int32
    tiles_ref,             # SMEM [G] int32: grid→tile id
    f8_hbm,                # ANY [8, M_pad] f32 (mx,my,ca,cb,cc,r,g,b)
    f4_hbm,                # ANY [4, M_pad] f32 (opacity,0,0,0)
    carries_ref,           # VMEM [P, MAXC] f32 (start-of-chunk log T)
    cot_ref,               # VMEM [P, 4] f32 (g_r, g_g, g_b, g_alpha)
    dzero_hbm,             # ANY  [F_PAD, M_pad] f32 (zeros, aliased to out)
    dpairs_hbm,            # ANY  [F_PAD, M_pad] f32 out (aliased)
    slab8_ref,             # VMEM scratch [2, 8, KC]
    slab4_ref,             # VMEM scratch [2, 4, KC]
    rmw_ref,               # VMEM scratch [2, F_PAD, KC]
    sem_ref,               # DMA semaphores (2,2) slab + (4,) rmw r/w
    *,
    gx: int,
    tile_size: int,
    k_cap: int,
    alpha_cutoff: float,
    alpha_max: float,
    log_eps: float,
):
    del dzero_hbm
    t = tiles_ref[pl.program_id(0)]
    p = tile_size * tile_size
    maxc = carries_ref.shape[1]

    start = starts_ref[t]
    count = jnp.minimum(counts_ref[t], k_cap)
    base = (start // KC) * KC
    lead = start - base
    total = lead + count
    n_chunks = jnp.where(count > 0, pl.cdiv(total, KC), 0)

    # chunks whose starting transmittance is already below threshold were
    # never processed forward (carry sentinel -1e30) or contribute nothing
    chunk_live = jnp.max(carries_ref[:, :], axis=0, keepdims=True) >= log_eps
    chunk_idx = jax.lax.broadcasted_iota(jnp.int32, (1, maxc), 1)
    useful = jnp.sum(
        jnp.where(jnp.logical_and(chunk_live, chunk_idx < n_chunks), 1, 0)
    )

    tx = (t % gx).astype(jnp.float32)
    ty = (t // gx).astype(jnp.float32)
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

    cot4 = cot_ref[:, :]                # [P, 4] = (g_r, g_g, g_b, g_alpha)

    def slab8_dma(slot, c):
        off = pl.multiple_of(base + c * KC, KC)
        return pltpu.make_async_copy(
            f8_hbm.at[:, pl.ds(off, KC)],
            slab8_ref.at[slot],
            sem_ref.at[0, slot],
        )

    def slab4_dma(slot, c):
        off = pl.multiple_of(base + c * KC, KC)
        return pltpu.make_async_copy(
            f4_hbm.at[:, pl.ds(off, KC)],
            slab4_ref.at[slot],
            sem_ref.at[1, slot],
        )

    def slab_start(slot, c):
        slab8_dma(slot, c).start()
        slab4_dma(slot, c).start()

    def slab_wait(slot, c):
        slab8_dma(slot, c).wait()
        slab4_dma(slot, c).wait()

    def rmw_read_dma(slot, c):
        off = pl.multiple_of(base + c * KC, KC)
        return pltpu.make_async_copy(
            dpairs_hbm.at[:, pl.ds(off, KC)],
            rmw_ref.at[slot],
            sem_ref.at[2, slot],
        )

    def rmw_write_dma(slot, c):
        off = pl.multiple_of(base + c * KC, KC)
        return pltpu.make_async_copy(
            rmw_ref.at[slot],
            dpairs_hbm.at[:, pl.ds(off, KC)],
            sem_ref.at[3, slot],
        )

    @pl.when(useful > 0)
    def _():
        slab_start(0, useful - 1)
        rmw_read_dma(0, useful - 1).start()

    def body(i, s_carry):
        c = useful - 1 - i
        s = i % 2

        @pl.when(i + 1 < useful)
        def _():
            slab_start((i + 1) % 2, c - 1)

        slab_wait(s, c)
        slab = slab8_ref[s]

        mx = slab[0:1, :] - tx * tile_size   # tile-local splat center
        my = slab[1:2, :] - ty * tile_size
        ca = slab[2:3, :]
        cb = slab[3:4, :]
        cc = slab[4:5, :]
        op = slab4_ref[s][0:1, :]

        # alpha recompute: same rank-6 bilinear form as the forward kernel
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
        raw_power = _dot_exact_bf16x3(u_mat, v_mat)
        power = jnp.minimum(raw_power, 0.0)
        e_pow = jnp.exp(power)
        a_pre = op * e_pow
        alpha = jnp.minimum(a_pre, alpha_max)
        cut = alpha < alpha_cutoff
        g_idx = c * KC + lane
        window = jnp.logical_and(g_idx >= lead, g_idx < total)
        dead = jnp.logical_or(cut, jnp.logical_not(window))
        alpha = jnp.where(dead, 0.0, alpha)

        log1m = jnp.log1p(-alpha)
        cum = _dot_bf16x2(log1m, tri)
        # single-lane reads need static offsets → switch over chunk index
        carry_c = jax.lax.switch(
            jnp.minimum(c, maxc - 1),
            [(lambda ci=ci: carries_ref[:, ci : ci + 1]) for ci in range(maxc)],
        )
        log_t_incl = carry_c + cum
        contrib = log_t_incl >= log_eps
        t_excl = jnp.exp(log_t_incl - log1m)
        w = jnp.where(contrib, alpha * t_excl, 0.0)

        # r = g_rgb·c + g_alpha as one MXU contraction: cot4 @ (fr;fg;fb;1)
        f4 = jnp.concatenate(
            [slab[5:8, :], jnp.ones((1, KC), jnp.float32)], axis=0
        )                                  # [4, KC]
        r = _dot_general_bf16x3(cot4, f4, (((1,), (0,)), ((), ())))  # [P, KC]
        rw = r * w
        suffix = _dot_bf16x2(rw, tri_strict_low)
        s_k = s_carry + suffix

        dalpha = jnp.where(
            jnp.logical_and(contrib, jnp.logical_not(dead)),
            t_excl * r - s_k / (1.0 - alpha),
            0.0,
        )
        # chain through the alpha_max clamp and the 1/255 cutoff
        da_pre = jnp.where(a_pre > alpha_max, 0.0, dalpha)
        dpow_u = da_pre * a_pre
        d_op = jnp.sum(da_pre * e_pow, axis=0, keepdims=True)
        dpow = jnp.where(raw_power > 0.0, 0.0, dpow_u)

        # geometry gradients from pixel-coordinate moments of dpow (MXU):
        # Mom = Uᵀ dpow → rows [Σdpow, Σdpow·px, Σdpow·py, Σdpow·px²,
        #                       Σdpow·py², Σdpow·px·py]
        mom = _dot_general_bf16x3(
            u_mat, dpow, (((0,), (0,)), ((), ()))
        )                                  # [8, KC]
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
            cot4, w, (((0,), (0,)), ((), ()))
        )                                  # [4, KC]; rows r,g,b,(alpha-unused)
        d_fr = gmat[0:1, :]
        d_fg = gmat[1:2, :]
        d_fb = gmat[2:3, :]

        # Read-add-write of the pair-gradient block, double-buffered: the
        # read for chunk c was prefetched one iteration ahead (hidden behind
        # this chunk's compute) and the write drains asynchronously while
        # the next chunk computes. This is hazard-free because one tile's
        # chunk blocks are disjoint (block = base + c·KC, distinct c), the
        # VMEM slot is reused only after its write-out is waited, and the
        # cross-tile shared boundary block is protected by the end-of-tile
        # drain below (grid steps execute sequentially).
        rmw_read_dma(s, c).wait()
        grads = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_fr, d_fg, d_fb, d_op,
             jnp.zeros((F_PAD - 9, KC), jnp.float32)],
            axis=0,
        )
        rmw_ref[s] = rmw_ref[s] + grads
        rmw_write_dma(s, c).start()

        @pl.when(i + 1 < useful)
        def _():
            s2 = (i + 1) % 2

            @pl.when(i >= 1)
            def _():
                rmw_write_dma(s2, c + 1).wait()

            rmw_read_dma(s2, c - 1).start()

        return s_carry + jnp.sum(rw, axis=1, keepdims=True)

    jax.lax.fori_loop(0, useful, body, jnp.zeros((p, 1), jnp.float32))

    # drain the (up to two) in-flight pair-gradient writes before the next
    # grid step may touch a shared boundary block
    @pl.when(useful > 1)
    def _():
        rmw_write_dma((useful - 2) % 2, 1).wait()

    @pl.when(useful > 0)
    def _():
        rmw_write_dma((useful - 1) % 2, 0).wait()


def backward_pair_grads(
    fields_t,                     # ([8, M_pad], [4, M_pad]) from _sorted_fields_t
    carries: jnp.ndarray,         # [G, P, MAXC] forward carries
    cot_tiles: jnp.ndarray,       # [G, P, 4] cotangents per tile pixel
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    width: int,
    height: int,
    config: RenderConfig,
    interpret: bool = False,
    tile_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Run the backward kernel → pair gradients [F_PAD, M_pad]."""
    f8_t, f4_t = fields_t
    ts = config.tile_size
    gx, gy = config.grid_size(width, height)
    num_tiles = gx * gy
    if tile_ids is None:
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    grid_n = tile_ids.shape[0]
    p = ts * ts
    k_cap = max(KC, ((config.max_per_tile + KC - 1) // KC) * KC)
    maxc = carries.shape[-1]
    m_pad = f8_t.shape[1]

    kernel = functools.partial(
        _bwd_kernel,
        gx=gx,
        tile_size=ts,
        k_cap=k_cap,
        alpha_cutoff=config.alpha_cutoff,
        alpha_max=config.alpha_max,
        log_eps=float(math.log(config.transmittance_eps)),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                         # f8
            pl.BlockSpec(memory_space=pl.ANY),                         # f4
            pl.BlockSpec((None, p, maxc), lambda g, s, c, t: (g, 0, 0)),  # carries
            pl.BlockSpec((None, p, 4), lambda g, s, c, t: (g, 0, 0)),     # cot
            pl.BlockSpec(memory_space=pl.ANY),                         # dzero
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 8, KC), jnp.float32),
            pltpu.VMEM((2, 4, KC), jnp.float32),
            pltpu.VMEM((2, F_PAD, KC), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2)),
        ],
    )
    dzero = jnp.zeros((F_PAD, m_pad), jnp.float32)
    dpairs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F_PAD, m_pad), jnp.float32),
        input_output_aliases={7: 0},  # flat input index incl. scalar prefetch
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        tile_start,
        jnp.minimum(tile_count, k_cap).astype(jnp.int32),
        tile_ids.astype(jnp.int32),
        f8_t,
        f4_t,
        carries,
        cot_tiles,
        dzero,
    )
    return dpairs
