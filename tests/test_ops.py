"""Unit tests for ops: SH, projection, sort keys, binning."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussian_splatting_web_tpu.config import RenderConfig
from gaussian_splatting_web_tpu.core import camera as cam
from gaussian_splatting_web_tpu.ops.projection import (
    compute_cov3d, project_gaussians, quat_to_rotmat,
)
from gaussian_splatting_web_tpu.ops.sh import eval_sh
from gaussian_splatting_web_tpu.ops.sort import (
    bin_splats, depth_sort_indices, float_to_sortable_uint,
)
from tests.conftest import make_random_cloud


def test_sh_degree0_constant():
    sh = np.zeros((4, 1, 3), dtype=np.float32)
    sh[:, 0] = 1.0
    rgb = eval_sh(jnp.asarray(sh), jnp.zeros((4, 3)) + 5.0, jnp.zeros(3))
    np.testing.assert_allclose(rgb, 0.28209479 + 0.5, atol=1e-6)


def test_sh_higher_degrees_direction_dependent():
    rng = np.random.default_rng(0)
    sh = jnp.asarray(rng.normal(size=(1, 16, 3)).astype(np.float32))
    p1 = eval_sh(sh, jnp.asarray([[0.0, 0.0, 5.0]]), jnp.zeros(3))
    p2 = eval_sh(sh, jnp.asarray([[5.0, 0.0, 0.0]]), jnp.zeros(3))
    assert not np.allclose(p1, p2)


def test_sh_nonnegative_and_offset():
    """simple_render.ts:62-65: +0.5 then clamp at 0."""
    sh = -10.0 * np.ones((2, 1, 3), dtype=np.float32)
    rgb = eval_sh(jnp.asarray(sh), jnp.ones((2, 3)), jnp.zeros(3))
    assert np.all(np.asarray(rgb) == 0.0)


def test_quat_to_rotmat_identity_and_orthonormal():
    np.testing.assert_allclose(
        quat_to_rotmat(jnp.asarray([0.0, 0, 0, 1])), np.eye(3), atol=1e-6
    )
    rng = np.random.default_rng(1)
    q = rng.normal(size=(10, 4)).astype(np.float32)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (10, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_cov3d_isotropic():
    """exp(log s) = s on each axis → Σ = s² I for identity rotation."""
    cov = compute_cov3d(
        jnp.log(jnp.asarray([[0.5, 0.5, 0.5]])),
        jnp.asarray([[0.0, 0, 0, 1]]),
        jnp.float32(1.0),
    )
    np.testing.assert_allclose(cov[0], [0.25, 0, 0, 0.25, 0, 0.25], atol=1e-6)


def test_cov3d_rotation_invariant_trace():
    rng = np.random.default_rng(2)
    ls = jnp.asarray(rng.uniform(-2, 0, size=(5, 3)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    cov = np.asarray(compute_cov3d(ls, q, jnp.float32(1.0)))
    trace = cov[:, 0] + cov[:, 3] + cov[:, 5]
    expect = np.sum(np.exp(2 * np.asarray(ls)), axis=1)
    np.testing.assert_allclose(trace, expect, rtol=1e-5)


def _setup(n=50, seed=0, w=128, h=96):
    cloud = make_random_cloud(n, seed=seed)
    camera = cam.default_camera(w, h, eye=(0, 0, -6), center=(0, 0, 0))
    return cloud, camera, w, h


def test_project_center_gaussian():
    """A gaussian at the look-at center must land at the image center."""
    cloud = make_random_cloud(1, seed=0)
    cloud.xyz = np.zeros((1, 3), dtype=np.float32)
    w, h = 128, 96
    camera = cam.default_camera(w, h, eye=(0, 0, -6), center=(0, 0, 0))
    cfg = RenderConfig()
    s = project_gaussians(cloud, camera, w, h, cfg)
    assert bool(s.valid[0])
    np.testing.assert_allclose(s.mean2d[0], [(w - 1) / 2, (h - 1) / 2], atol=1e-3)
    np.testing.assert_allclose(s.depth[0], 6.0, atol=1e-5)


def test_project_behind_camera_culled():
    cloud = make_random_cloud(1, seed=0)
    cloud.xyz = np.array([[0, 0, -20.0]], dtype=np.float32)  # behind the eye
    camera = cam.default_camera(64, 64, eye=(0, 0, -6))
    s = project_gaussians(cloud, camera, 64, 64, RenderConfig())
    assert not bool(s.valid[0])
    assert float(s.radius[0]) == 0.0


def test_conic_is_inverse_cov2d():
    cloud, camera, w, h = _setup()
    s = project_gaussians(cloud, camera, w, h, RenderConfig())
    conic = np.asarray(s.conic)[np.asarray(s.valid)]
    # conic = [c, -b, a]/det of cov2d [a b; b c] → det(conic) = 1/det(cov2d) > 0
    det_conic = conic[:, 0] * conic[:, 2] - conic[:, 1] ** 2
    assert np.all(det_conic > 0)


def test_float_to_sortable_uint_monotonic():
    """shaders.ts:36-40 — order-preserving across sign boundary."""
    vals = jnp.asarray(
        [-1e30, -5.0, -1e-9, -0.0, 0.0, 1e-9, 2.5, 1e30], dtype=jnp.float32
    )
    keys = np.asarray(float_to_sortable_uint(vals), dtype=np.uint64)
    assert np.all(np.diff(keys.astype(np.int64)) >= 0)


def test_depth_sort_indices():
    depth = jnp.asarray([3.0, 1.0, 2.0, 5.0])
    valid = jnp.asarray([True, True, True, False])
    order = np.asarray(depth_sort_indices(depth, valid))
    assert list(order[:3]) == [1, 2, 0]
    assert order[3] == 3


def test_bin_splats_segments_sorted_by_depth():
    cloud, camera, w, h = _setup(n=80)
    cfg = RenderConfig(max_dup=64, depth_bits=0)  # exact two-key mode
    s = project_gaussians(cloud, camera, w, h, cfg)
    bins = bin_splats(s, w, h, cfg)
    start = np.asarray(bins.tile_start)
    count = np.asarray(bins.tile_count)
    gidx = np.asarray(bins.sorted_gidx)
    depth = np.asarray(s.depth)
    gx, gy = cfg.grid_size(w, h)
    assert start.shape == (gx * gy,)
    total = int(np.asarray(bins.num_pairs))
    assert total == int(count.sum())
    for t in range(gx * gy):
        seg = gidx[start[t] : start[t] + count[t]]
        d = depth[seg]
        assert np.all(np.diff(d) >= 0), f"tile {t} not depth sorted"


def test_bin_splats_covers_projected_center_tile():
    cloud = make_random_cloud(1, seed=0)
    cloud.xyz = np.zeros((1, 3), dtype=np.float32)
    w = h = 64
    camera = cam.default_camera(w, h, eye=(0, 0, -6))
    cfg = RenderConfig()
    s = project_gaussians(cloud, camera, w, h, cfg)
    bins = bin_splats(s, w, h, cfg)
    gx, _ = cfg.grid_size(w, h)
    cx, cy = int(s.mean2d[0, 0]) // cfg.tile_size, int(s.mean2d[0, 1]) // cfg.tile_size
    t = cy * gx + cx
    assert int(bins.tile_count[t]) >= 1


def test_bin_splats_overflow_counted():
    cloud = make_random_cloud(1, seed=0)
    cloud.xyz = np.zeros((1, 3), dtype=np.float32)
    cloud.log_scale = np.full((1, 3), 1.5, dtype=np.float32)  # huge splat
    cloud.opacity_logit = np.full((1,), 5.0, dtype=np.float32)
    w = h = 256
    camera = cam.default_camera(w, h, eye=(0, 0, -4))
    # gather_cap off: this test counts only footprint truncation
    cfg = RenderConfig(max_dup=4, gather_cap_factor=0.0)
    s = project_gaussians(cloud, camera, w, h, cfg)
    bins = bin_splats(s, w, h, cfg)
    assert int(bins.overflow) == 1


def test_bin_splats_packed_matches_exact():
    """depth_bits>0 packs (tile, depth) into one u32 key; segment membership
    must match the exact two-key sort, and per-tile order must still be
    depth-sorted up to the quantization quantum."""
    cloud, camera, w, h = _setup(n=80)
    from gaussian_splatting_web_tpu.ops.projection import project_gaussians as pg
    cfg_exact = RenderConfig(max_dup=64, depth_bits=0)
    cfg_packed = RenderConfig(max_dup=64, depth_bits=19)
    s = pg(cloud, camera, w, h, cfg_exact)
    be = bin_splats(s, w, h, cfg_exact)
    bp = bin_splats(s, w, h, cfg_packed)
    np.testing.assert_array_equal(np.asarray(be.tile_start), np.asarray(bp.tile_start))
    np.testing.assert_array_equal(np.asarray(be.tile_count), np.asarray(bp.tile_count))
    # same member sets per tile; packed order is depth-correct within quantum
    start = np.asarray(be.tile_start); count = np.asarray(be.tile_count)
    ge, gp = np.asarray(be.sorted_gidx), np.asarray(bp.sorted_gidx)
    depth = np.asarray(s.depth)
    for t in range(len(start)):
        seg_e = ge[start[t]:start[t]+count[t]]
        seg_p = gp[start[t]:start[t]+count[t]]
        assert set(seg_e) == set(seg_p)
        d = depth[seg_p]
        assert np.all(np.diff(d) >= -1e-3 * np.maximum(np.abs(d[:-1]), 1))


def test_bin_splats_two_tier_matches_single_tier():
    """tier_split>0 must produce the same per-tile segments (sets + depth
    order) as the single-tier grid when capacities suffice."""
    cloud, camera, w, h = _setup(n=120)
    from gaussian_splatting_web_tpu.ops.projection import project_gaussians as pg
    cfg1 = RenderConfig(max_dup=64, depth_bits=0)
    cfg2 = RenderConfig(max_dup=64, depth_bits=0, tier_split=4, big_frac=1.0)
    s = pg(cloud, camera, w, h, cfg1)
    b1 = bin_splats(s, w, h, cfg1)
    b2 = bin_splats(s, w, h, cfg2)
    np.testing.assert_array_equal(np.asarray(b1.tile_count), np.asarray(b2.tile_count))
    assert int(b1.num_pairs) == int(b2.num_pairs)
    start, count = np.asarray(b1.tile_start), np.asarray(b1.tile_count)
    s2_, c2_ = np.asarray(b2.tile_start), np.asarray(b2.tile_count)
    g1, g2 = np.asarray(b1.sorted_gidx), np.asarray(b2.sorted_gidx)
    depth = np.asarray(s.depth)
    for t in range(len(start)):
        seg1 = g1[start[t]:start[t]+count[t]]
        seg2 = g2[s2_[t]:s2_[t]+c2_[t]]
        assert set(seg1) == set(seg2), t
        assert np.all(np.diff(depth[seg2]) >= 0), t


def test_bin_splats_two_tier_big_overflow_counted():
    cloud = make_random_cloud(4, seed=0)
    cloud.xyz = np.zeros((4, 3), dtype=np.float32)
    cloud.log_scale = np.full((4, 3), 0.5, dtype=np.float32)  # big splats
    cloud.opacity_logit = np.full((4,), 5.0, dtype=np.float32)
    w = h = 256
    camera = cam.default_camera(w, h, eye=(0, 0, -4))
    # big tier capacity 256 min covers all 4 → no big-cap overflow, but
    # footprints may exceed max_dup
    cfg = RenderConfig(max_dup=8, tier_split=2, big_frac=1.0 / 16)
    s = project_gaussians(cloud, camera, w, h, cfg)
    bins = bin_splats(s, w, h, cfg)
    assert int(bins.overflow) >= 1  # footprint > max_dup counted
    assert np.all(np.asarray(bins.tile_count) >= 0)


def test_bin_splats_gather_cap_lossless_when_sufficient():
    cloud, camera, w, h = _setup(n=80)
    from gaussian_splatting_web_tpu.ops.projection import project_gaussians as pg
    cfg0 = RenderConfig(max_dup=64, depth_bits=0, gather_cap_factor=0.0)
    cfg1 = RenderConfig(max_dup=64, depth_bits=0, gather_cap_factor=64.0)
    s = pg(cloud, camera, w, h, cfg0)
    b0 = bin_splats(s, w, h, cfg0)
    b1 = bin_splats(s, w, h, cfg1)
    np.testing.assert_array_equal(np.asarray(b0.tile_count), np.asarray(b1.tile_count))
    m = int(b1.sorted_gidx.shape[0])
    np.testing.assert_array_equal(
        np.asarray(b0.sorted_gidx)[:m], np.asarray(b1.sorted_gidx)
    )
    assert int(b1.overflow) == int(b0.overflow)


def test_bin_splats_gather_cap_truncates_gracefully():
    cloud, camera, w, h = _setup(n=80)
    from gaussian_splatting_web_tpu.ops.projection import project_gaussians as pg
    cfg = RenderConfig(max_dup=64, gather_cap_factor=0.05,
                       gather_cap_floor=8)  # absurdly small
    s = pg(cloud, camera, w, h, cfg)
    b = bin_splats(s, w, h, cfg)
    start, count = np.asarray(b.tile_start), np.asarray(b.tile_count)
    m = int(b.sorted_gidx.shape[0])
    assert np.all(start + count <= m)
    assert int(b.overflow) > 0


def test_rect_quad_min_matches_bruteforce():
    """_rect_quad_min: exact min of the PD quadratic over a rectangle,
    checked against a dense grid evaluation."""
    from gaussian_splatting_web_tpu.ops.sort import _rect_quad_min

    rng = np.random.default_rng(3)
    for _ in range(50):
        # random positive-definite (A, B, C)
        l1, l2 = rng.uniform(0.05, 2.0, 2)
        th = rng.uniform(0, np.pi)
        c, s = np.cos(th), np.sin(th)
        A = l1 * c * c + l2 * s * s
        C = l1 * s * s + l2 * c * c
        B = (l1 - l2) * c * s
        x0, y0 = rng.uniform(-20, 10, 2)
        dx0, dy0 = x0, y0
        dx1, dy1 = x0 + rng.uniform(1, 20), y0 + rng.uniform(1, 20)
        got = float(
            _rect_quad_min(
                jnp.float32(A), jnp.float32(B), jnp.float32(C),
                jnp.float32(dx0), jnp.float32(dx1),
                jnp.float32(dy0), jnp.float32(dy1),
            )
        )
        xs = np.linspace(dx0, dx1, 201)
        ys = np.linspace(dy0, dy1, 201)
        X, Y = np.meshgrid(xs, ys)
        q = 0.5 * A * X * X + B * X * Y + 0.5 * C * Y * Y
        ref = float(q.min())
        # grid min overestimates the true min slightly; the closed form
        # must never exceed it and must be close
        assert got <= ref + 1e-4 * max(abs(ref), 1.0)
        assert got >= ref - 0.05 * max(abs(ref), 1.0) - 1e-4


def test_tile_cull_is_output_exact():
    """tile_cull drops only (splat, tile) pairs whose cutoff level-set
    ellipse misses the tile — rendered images must be identical."""
    from gaussian_splatting_web_tpu.ops.rasterize import render_impl

    cloud, camera, w, h = _setup(n=120, seed=7)
    base = dict(max_dup=32, use_pallas="never")
    img0, aux0 = render_impl(
        cloud, camera, w, h, RenderConfig(tile_cull=False, **base)
    )
    img1, aux1 = render_impl(
        cloud, camera, w, h, RenderConfig(tile_cull=True, **base)
    )
    assert int(aux1["num_pairs"]) <= int(aux0["num_pairs"])
    np.testing.assert_allclose(
        np.asarray(img0), np.asarray(img1), rtol=0, atol=1e-6
    )


def test_tile_cull_output_exact_two_tier():
    """Same, through the two-tier + packed-key binning path."""
    from gaussian_splatting_web_tpu.ops.rasterize import render_impl

    cloud, camera, w, h = _setup(n=120, seed=11)
    base = dict(max_dup=16, tier_split=2, depth_bits=19,
                gather_cap_factor=3.0, use_pallas="never")
    img0, _ = render_impl(
        cloud, camera, w, h, RenderConfig(tile_cull=False, **base)
    )
    img1, aux1 = render_impl(
        cloud, camera, w, h, RenderConfig(tile_cull=True, **base)
    )
    np.testing.assert_allclose(
        np.asarray(img0), np.asarray(img1), rtol=0, atol=1e-6
    )


def test_default_depth_bits_order_quantized_monotone():
    """Under the shipped default (depth_bits>0) each tile's segment is
    non-decreasing in the QUANTIZED depth key — ties may reorder, nothing
    else (sort.py bin_splats docstring)."""
    from gaussian_splatting_web_tpu.ops.sort import float_to_sortable_uint

    cloud, camera, w, h = _setup(n=80)
    cfg = RenderConfig(max_dup=64)
    assert cfg.depth_bits > 0  # shipped default is the packed single key
    s = project_gaussians(cloud, camera, w, h, cfg)
    bins = bin_splats(s, w, h, cfg)
    start = np.asarray(bins.tile_start)
    count = np.asarray(bins.tile_count)
    gidx = np.asarray(bins.sorted_gidx)
    gx, gy = cfg.grid_size(w, h)
    num_tiles = gx * gy
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = min(cfg.depth_bits, 32 - tile_bits)
    qkey = np.asarray(float_to_sortable_uint(s.depth)) >> (32 - depth_bits)
    for t in range(num_tiles):
        seg = gidx[start[t]: start[t] + count[t]]
        assert np.all(np.diff(qkey[seg].astype(np.int64)) >= 0)
