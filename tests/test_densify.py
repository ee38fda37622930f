"""Adaptive density control tests (train/densify.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussian_splatting_web_tpu.models.gaussian_model import GaussianModel
from gaussian_splatting_web_tpu.train.densify import (
    DEAD_OPACITY, DensifyState, accumulate_stats, compact, densify_and_prune,
    pad_to_capacity, reset_opacity,
)
from tests.conftest import make_random_cloud


def _model(n=8, seed=0):
    return GaussianModel.from_cloud(make_random_cloud(n, seed=seed))


def test_pad_to_capacity():
    m, st = pad_to_capacity(_model(8), 32)
    assert m.num_gaussians == 32
    assert int(st.alive.sum()) == 8
    # dead slots are invisible
    assert float(jax.nn.sigmoid(m.opacity_logit[8:]).max()) < 1e-6


def test_accumulate_stats():
    _, st = pad_to_capacity(_model(4), 8)
    d = jnp.ones((8, 2))
    vis = jnp.asarray([True, True, False, True, True, True, True, True])
    st2 = accumulate_stats(st, d, vis)
    # only alive ∧ visible accumulate
    assert float(st2.grad_accum[0]) > 0
    assert float(st2.grad_accum[2]) == 0.0  # not visible
    assert float(st2.grad_accum[5]) == 0.0  # not alive
    assert float(st2.denom[1]) == 1.0


def test_clone_grows_population():
    m, st = pad_to_capacity(_model(8), 32)
    # small splats with huge accumulated gradient → clone
    m.log_scale = jnp.full_like(m.log_scale, -6.0)
    st = DensifyState(
        grad_accum=jnp.where(st.alive, 1.0, 0.0),
        denom=jnp.ones_like(st.denom),
        alive=st.alive,
    )
    m2, st2 = densify_and_prune(m, st, jax.random.PRNGKey(0),
                                grad_threshold=1e-3, scene_extent=1.0,
                                min_opacity=0.0)
    assert int(st2.alive.sum()) == 16  # every source cloned once
    # clones inherit position exactly
    assert np.isfinite(np.asarray(m2.xyz)).all()


def test_split_changes_scale_and_position():
    m, st = pad_to_capacity(_model(4), 16)
    m.log_scale = jnp.full_like(m.log_scale, 1.0)  # huge → split
    st = DensifyState(
        grad_accum=jnp.where(st.alive, 1.0, 0.0),
        denom=jnp.ones_like(st.denom),
        alive=st.alive,
    )
    m2, st2 = densify_and_prune(m, st, jax.random.PRNGKey(1),
                                grad_threshold=1e-3, scene_extent=1e6,
                                percent_dense=1e-9, min_opacity=0.0)
    assert int(st2.alive.sum()) == 8
    # sources shrank by 1.6x
    np.testing.assert_allclose(
        np.asarray(m2.log_scale[:4]), 1.0 - np.log(1.6), atol=1e-5
    )


def test_prune_faint():
    m, st = pad_to_capacity(_model(8), 16)
    logit = np.asarray(m.opacity_logit).copy()
    logit[:4] = -10.0  # ~0 opacity
    m.opacity_logit = jnp.asarray(logit)
    m2, st2 = densify_and_prune(m, st, jax.random.PRNGKey(0),
                                grad_threshold=1e9, min_opacity=0.005)
    assert int(st2.alive.sum()) == 4
    assert float(m2.opacity_logit[0]) == DEAD_OPACITY


def test_capacity_overflow_is_graceful():
    m, st = pad_to_capacity(_model(8), 10)  # only 2 free slots
    m.log_scale = jnp.full_like(m.log_scale, -6.0)
    st = DensifyState(
        grad_accum=jnp.where(st.alive, 1.0, 0.0),
        denom=jnp.ones_like(st.denom),
        alive=st.alive,
    )
    m2, st2 = densify_and_prune(m, st, jax.random.PRNGKey(0),
                                grad_threshold=1e-3, min_opacity=0.0)
    assert int(st2.alive.sum()) == 10  # capped at capacity


def test_reset_opacity_and_compact():
    m, st = pad_to_capacity(_model(6), 12)
    m2 = reset_opacity(m, st.alive)
    op = np.asarray(jax.nn.sigmoid(m2.opacity_logit))[:6]
    assert np.all(op <= 0.0101)
    small = compact(m2, st)
    assert small.num_gaussians == 6


def test_densified_model_still_renders():
    from gaussian_splatting_web_tpu.config import RenderConfig
    from gaussian_splatting_web_tpu.core import camera as cam
    from gaussian_splatting_web_tpu.ops.rasterize import render

    m, st = pad_to_capacity(_model(8), 32)
    st = DensifyState(
        grad_accum=jnp.where(st.alive, 1.0, 0.0),
        denom=jnp.ones_like(st.denom), alive=st.alive,
    )
    m2, st2 = densify_and_prune(m, st, jax.random.PRNGKey(0),
                                grad_threshold=1e-3, min_opacity=0.0)
    cfg = RenderConfig(max_dup=32, max_per_tile=64, tile_chunk=2)
    img, _ = render(m2.to_cloud(), cam.default_camera(32, 32, eye=(0, 0, -6)),
                    32, 32, cfg)
    assert np.all(np.isfinite(np.asarray(img)))
