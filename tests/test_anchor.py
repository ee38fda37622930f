"""Anchor-binning kernel tests (ops/pallas/anchor.py): the round-4
merge-in-kernel rasterizer against the portable XLA compositor oracle —
interpret mode on CPU, same kernel code that runs compiled on TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_splatting_web_tpu.config import RenderConfig
from gaussian_splatting_web_tpu.core import camera as cam
from gaussian_splatting_web_tpu.ops.projection import project_gaussians
from gaussian_splatting_web_tpu.ops.rasterize import (
    assemble_image, rasterize_tiles)
from gaussian_splatting_web_tpu.ops.sort import bin_splats
from gaussian_splatting_web_tpu.ops.pallas.anchor import (
    bin_splats_anchor, composite_tiles_anchor, rasterize_anchor)
from tests.conftest import make_random_cloud

W, H = 64, 48


def _cfg(packed, **kw):
    base = dict(max_dup=16, max_per_tile=256, tile_chunk=4, depth_bits=0,
                pack_fields=packed, pack_grads=False,
                # mean16 is a dup-binning sort-payload optimization; the
                # anchor path carries mean2d unquantized, so compare
                # against the unquantized oracle
                pack_mean16=False,
                gather_cap_factor=0.0, r_tiles=1, binning="anchor")
    base.update(kw)
    return RenderConfig(**base)


def _setup(n, seed, cfg, w=W, h=H):
    cloud = make_random_cloud(n, seed=seed, sh_degree=0)
    camera = cam.default_camera(w, h, eye=(0, 0, -6), center=(0, 0, 0))
    return project_gaussians(cloud, camera, w, h, cfg)


def _oracle(s, cfg, w=W, h=H):
    cfg_ref = cfg.replace(tier_split=0)   # single tier: no mid-cap drops
    b = bin_splats(s, w, h, cfg_ref)
    return rasterize_tiles(s, b, w, h, cfg_ref)


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("seed,n", [(0, 300), (1, 800), (5, 40)])
def test_anchor_forward_matches_xla(packed, seed, n):
    cfg = _cfg(packed)
    s = _setup(n, seed, cfg)
    rgb0, a0 = _oracle(s, cfg)
    rgb1, a1, stats = rasterize_anchor(s, W, H, cfg, True)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=2e-4)
    assert int(stats["overflow"]) == 0


def test_anchor_forward_grouped_tiles():
    """r_tiles > 1: several tiles merged + composited per grid step."""
    cfg = _cfg(True, r_tiles=4)
    s = _setup(500, 2, cfg)
    rgb0, a0 = _oracle(s, cfg)
    rgb1, a1, _ = rasterize_anchor(s, W, H, cfg, True)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=2e-4)


def test_anchor_big_splats_dup_tier():
    """A scene of mostly LARGE footprints exercises the dup tier (and
    its interleaving with anchors in the same segments)."""
    cloud = make_random_cloud(60, seed=3, sh_degree=0)
    cloud.log_scale = np.full((60, 3), -1.2, np.float32)  # big splats
    cfg = _cfg(True)
    camera = cam.default_camera(W, H, eye=(0, 0, -6), center=(0, 0, 0))
    s = project_gaussians(cloud, camera, W, H, cfg)
    rgb0, a0 = _oracle(s, cfg)
    rgb1, a1, _ = rasterize_anchor(s, W, H, cfg, True)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0),
                               atol=2e-4)


def test_anchor_empty_and_culled():
    """No visible splats → black frame, no NaNs."""
    cfg = _cfg(True)
    cloud = make_random_cloud(32, seed=0, sh_degree=0)
    camera = cam.default_camera(W, H, eye=(0, 0, -6), center=(0, 0, 0))
    cloud.xyz = cloud.xyz + np.array([0, 0, -100.0], np.float32)  # behind
    s = project_gaussians(cloud, camera, W, H, cfg)
    rgb, a, stats = rasterize_anchor(s, W, H, cfg, True)
    assert np.all(np.isfinite(np.asarray(rgb)))
    np.testing.assert_allclose(np.asarray(rgb), 0.0, atol=1e-7)


@pytest.mark.parametrize("packed", [False, True])
def test_anchor_grad_matches_xla(packed):
    cfg = _cfg(packed)
    s = _setup(500, 1, cfg)
    cfg_ref = cfg.replace(tier_split=0)
    b = bin_splats(s, W, H, cfg_ref)
    ww = jnp.linspace(0.5, 1.5, W)[None, :, None]

    def loss_anchor(s):
        rgb, a, _ = rasterize_anchor(s, W, H, cfg, True)
        return jnp.sum(rgb * ww) + jnp.sum(a ** 2)

    def loss_xla(s):
        rgb, a = rasterize_tiles(s, b, W, H, cfg_ref)
        return jnp.sum(rgb * ww) + jnp.sum(a ** 2)

    g1 = jax.grad(loss_anchor, allow_int=True)(s)
    g0 = jax.grad(loss_xla, allow_int=True)(s)
    for name in ("mean2d", "conic", "rgb", "opacity"):
        a_ = np.asarray(getattr(g1, name))
        b_ = np.asarray(getattr(g0, name))
        scale = np.abs(b_).max() + 1e-12
        np.testing.assert_allclose(a_, b_, atol=5e-4 + 1e-3 * scale,
                                   err_msg=name)


def test_anchor_grad_through_early_exit_scene():
    """Opaque stacked scene: the early-exit path and the backward's
    useful-chunk reconstruction must agree with the oracle."""
    n = 40
    cloud = make_random_cloud(n, seed=5, sh_degree=0)
    rng = np.random.default_rng(7)
    cloud.xyz = np.concatenate(
        [rng.normal(scale=0.05, size=(n, 2)), rng.uniform(-2, 2, (n, 1))],
        axis=1).astype(np.float32)
    cloud.opacity_logit = np.full((n,), 6.0, np.float32)
    cloud.log_scale = np.full((n, 3), -0.7, np.float32)
    cfg = _cfg(True)
    camera = cam.default_camera(W, H, eye=(0, 0, -6), center=(0, 0, 0))
    s = project_gaussians(cloud, camera, W, H, cfg)

    rgb0, a0 = _oracle(s, cfg)
    rgb1, a1, _ = rasterize_anchor(s, W, H, cfg, True)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0),
                               atol=2e-4)

    def loss_anchor(s):
        rgb, a, _ = rasterize_anchor(s, W, H, cfg, True)
        return jnp.sum(rgb ** 2)

    cfg_ref = cfg.replace(tier_split=0)
    b = bin_splats(s, W, H, cfg_ref)

    def loss_xla(s):
        rgb, a = rasterize_tiles(s, b, W, H, cfg_ref)
        return jnp.sum(rgb ** 2)

    g1 = jax.grad(loss_anchor, allow_int=True)(s)
    g0 = jax.grad(loss_xla, allow_int=True)(s)
    for name in ("mean2d", "conic", "rgb", "opacity"):
        a_ = np.asarray(getattr(g1, name))
        b_ = np.asarray(getattr(g0, name))
        scale = np.abs(b_).max() + 1e-12
        np.testing.assert_allclose(a_, b_, atol=5e-4 + 1e-3 * scale,
                                   err_msg=name)


def test_anchor_packed_grads_fold():
    """pack_grads=True (bf16-packed fold payloads) stays within the
    documented rounding tolerance of the exact fold."""
    cfg = _cfg(True, pack_grads=True)
    cfg0 = _cfg(True, pack_grads=False)
    s = _setup(300, 4, cfg)

    def loss(cfg):
        def f(s):
            rgb, a, _ = rasterize_anchor(s, W, H, cfg, True)
            return jnp.sum(rgb ** 2) + jnp.sum(a)
        return f

    g1 = jax.grad(loss(cfg), allow_int=True)(s)
    g0 = jax.grad(loss(cfg0), allow_int=True)(s)
    for name in ("mean2d", "conic", "rgb", "opacity"):
        a_ = np.asarray(getattr(g1, name))
        b_ = np.asarray(getattr(g0, name))
        scale = np.abs(b_).max() + 1e-12
        assert np.abs(a_ - b_).max() < 1e-2 * scale, name
