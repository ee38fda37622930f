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
    m2, st2, chg = densify_and_prune(m, st, jax.random.PRNGKey(0),
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
    m2, st2, chg = densify_and_prune(m, st, jax.random.PRNGKey(1),
                                grad_threshold=1e-3, scene_extent=1e6,
                                percent_dense=1e-9, min_opacity=0.0)
    # INRIA split: 2 resampled children per source, source pruned
    assert int(st2.alive.sum()) == 8
    alive = np.asarray(st2.alive)
    assert not alive[:4].any()          # sources pruned
    assert alive[4:12].all()            # 8 children placed
    # children carry scale ÷ 1.6 and were resampled away from the source
    np.testing.assert_allclose(
        np.asarray(m2.log_scale[4:12]), 1.0 - np.log(1.6), atol=1e-5
    )
    src_xyz = np.asarray(m.xyz[:4])
    child_xyz = np.asarray(m2.xyz[4:12])
    assert np.abs(child_xyz[:, None, :] - src_xyz[None, :, :]).min() > 1e-6
    # both the children and the freed sources are marked changed
    assert np.asarray(chg)[:12].all()


def test_prune_faint():
    m, st = pad_to_capacity(_model(8), 16)
    logit = np.asarray(m.opacity_logit).copy()
    logit[:4] = -10.0  # ~0 opacity
    m.opacity_logit = jnp.asarray(logit)
    m2, st2, chg = densify_and_prune(m, st, jax.random.PRNGKey(0),
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
    m2, st2, chg = densify_and_prune(m, st, jax.random.PRNGKey(0),
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
    m2, st2, chg = densify_and_prune(m, st, jax.random.PRNGKey(0),
                                grad_threshold=1e-3, min_opacity=0.0)
    cfg = RenderConfig(max_dup=32, max_per_tile=64, tile_chunk=2)
    img, _ = render(m2.to_cloud(), cam.default_camera(32, 32, eye=(0, 0, -6)),
                    32, 32, cfg)
    assert np.all(np.isfinite(np.asarray(img)))


def test_split_overflow_keeps_source():
    """If the arena can't hold both children, the source is NOT pruned —
    overflow degrades to a clone instead of losing mass."""
    m, st = pad_to_capacity(_model(4), 5)  # one free slot, 4 split sources
    m.log_scale = jnp.full_like(m.log_scale, 1.0)
    st = DensifyState(
        grad_accum=jnp.where(st.alive, 1.0, 0.0),
        denom=jnp.ones_like(st.denom), alive=st.alive,
    )
    m2, st2, chg = densify_and_prune(m, st, jax.random.PRNGKey(0),
                                     grad_threshold=1e-3, scene_extent=1e6,
                                     percent_dense=1e-9, min_opacity=0.0)
    alive = np.asarray(st2.alive)
    assert alive[:4].all() and alive.sum() == 5


def test_reset_opt_rows_zeroes_changed_moments():
    import optax

    from gaussian_splatting_web_tpu.train.train_loop import reset_opt_rows
    from gaussian_splatting_web_tpu.train.trainer import (
        init_train_state, make_optimizer,
    )

    m, st = pad_to_capacity(_model(4), 8)
    opt = make_optimizer()
    state = init_train_state(m, opt)
    # one real update so the moments are non-zero
    grads = jax.tree_util.tree_map(jnp.ones_like, m)
    updates, opt_state = opt.update(grads, state.opt_state, m)

    changed = jnp.asarray([True, False] * 4)
    reset = reset_opt_rows(opt_state, changed)
    mus = [x for x in jax.tree_util.tree_leaves(reset)
           if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 8]
    assert mus, "expected per-row moment leaves"
    for leaf in mus:
        arr = np.asarray(leaf)
        if arr.size == 0:  # e.g. sh_rest at degree 0
            continue
        assert np.all(arr[np.asarray(changed)] == 0.0)
        assert np.any(arr[~np.asarray(changed)] != 0.0)


def test_reset_opt_opacity_rows():
    from gaussian_splatting_web_tpu.train.train_loop import reset_opt_opacity
    from gaussian_splatting_web_tpu.train.trainer import (
        init_train_state, make_optimizer,
    )

    m, st = pad_to_capacity(_model(4), 8)
    opt = make_optimizer()
    state = init_train_state(m, opt)
    grads = jax.tree_util.tree_map(jnp.ones_like, m)
    _, opt_state = opt.update(grads, state.opt_state, m)

    reset = reset_opt_opacity(opt_state, 8)

    def leaves_named(tree, name):
        out = []

        def visit(path, x):
            if any(getattr(p, "name", "") == name for p in path):
                out.append(x)
            return x

        jax.tree_util.tree_map_with_path(visit, tree)
        return out

    for leaf in leaves_named(reset, "opacity_logit"):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == 8:
            assert np.all(np.asarray(leaf) == 0.0)
    # other groups untouched
    xyz_leaves = [x for x in leaves_named(reset, "xyz")
                  if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 8]
    assert any(np.any(np.asarray(x) != 0.0) for x in xyz_leaves)
