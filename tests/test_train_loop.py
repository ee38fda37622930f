"""End-to-end training loop test: overfit a tiny synthetic capture."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussian_splatting_web_tpu.config import RenderConfig
from gaussian_splatting_web_tpu.core import camera as cam
from gaussian_splatting_web_tpu.io.dataset import View, scene_extent
from gaussian_splatting_web_tpu.models.gaussian_model import GaussianModel
from gaussian_splatting_web_tpu.ops.rasterize import render
from gaussian_splatting_web_tpu.train.densify import compact
from gaussian_splatting_web_tpu.train.train_loop import (
    TrainLoopConfig, train,
)
from tests.conftest import make_random_cloud

CFG = RenderConfig(max_dup=32, max_per_tile=64, tile_chunk=4)
W = H = 32


def _views(target_cloud, n_views=3):
    views = []
    for i in range(n_views):
        angle = i * 0.5
        eye = (4 * np.sin(angle), 0.5, -4 * np.cos(angle))
        camera = cam.default_camera(W, H, eye=eye, center=(0, 0, 0))
        img, _ = render(target_cloud, camera, W, H, CFG)
        views.append(View(camera=camera, image=np.asarray(img), name=f"v{i}"))
    return views


def test_train_loop_overfits_and_densifies():
    target = make_random_cloud(24, seed=1, sh_degree=0)
    views = _views(target)

    start = GaussianModel.from_cloud(make_random_cloud(24, seed=2, sh_degree=0))
    losses = []
    state, dstate = train(
        start, views, W, H, render_config=CFG,
        loop=TrainLoopConfig(
            iterations=60, densify_from=10, densify_until=50,
            densify_every=20, opacity_reset_every=10_000,
            sh_upgrade_every=10_000, log_every=10,
            capacity_factor=3.0, grad_threshold=1e-6,  # force densify
        ),
        on_log=lambda it, loss, alive: losses.append((it, loss, alive)),
    )
    assert losses, "no logs emitted"
    first_loss = losses[0][1]
    last_loss = losses[-1][1]
    assert np.isfinite(last_loss)
    assert last_loss < first_loss  # learning happened
    # densification grew the population (grad threshold forced low)
    assert losses[-1][2] >= losses[0][2]

    final = compact(state.params, dstate)
    assert final.num_gaussians == int(jnp.sum(dstate.alive))
    img, _ = render(final.to_cloud(), views[0].camera, W, H, CFG)
    assert np.all(np.isfinite(np.asarray(img)))


def test_scene_extent():
    target = make_random_cloud(4, seed=0)
    views = _views(target, n_views=3)
    ext = scene_extent(views)
    assert 0.5 < ext < 20.0
