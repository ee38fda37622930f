"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4:
the TPU-world fake backend for distributed tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from gaussian_splatting_web_tpu.config import RenderConfig
from gaussian_splatting_web_tpu.core import camera as cam
from gaussian_splatting_web_tpu.core.types import stack_cameras
from gaussian_splatting_web_tpu.models.gaussian_model import GaussianModel
from gaussian_splatting_web_tpu.ops.rasterize import render
from gaussian_splatting_web_tpu.parallel.mesh import make_mesh
from gaussian_splatting_web_tpu.parallel.render_sharded import render_sharded
from gaussian_splatting_web_tpu.parallel.train_sharded import make_sharded_train_step
from gaussian_splatting_web_tpu.train.trainer import init_train_state
from tests.conftest import make_random_cloud

CFG = RenderConfig(max_dup=64, max_per_tile=64, tile_chunk=2)
W, H = 64, 48

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _camera(eye=(0, 0, -6)):
    return cam.default_camera(W, H, eye=eye, center=(0, 0, 0))


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 1, "tile": 8}
    mesh2 = make_mesh(data=2)
    assert mesh2.shape == {"data": 2, "tile": 4}
    with pytest.raises(ValueError):
        make_mesh(data=3, tile=3)


def test_render_sharded_matches_single_device():
    cloud = make_random_cloud(40, seed=0, sh_degree=1)
    camera = _camera()
    img_1, _ = render(cloud, camera, W, H, CFG)
    mesh = make_mesh(tile=8)
    rgb, alpha = render_sharded(cloud, camera, W, H, mesh, CFG)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(img_1), atol=1e-5)


def test_render_sharded_2d_mesh():
    cloud = make_random_cloud(24, seed=1)
    camera = _camera()
    mesh = make_mesh(data=2, tile=4)
    rgb, _ = render_sharded(cloud, camera, W, H, mesh, CFG)
    img_1, _ = render(cloud, camera, W, H, CFG)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(img_1), atol=1e-5)


def test_sharded_train_step_matches_single_device():
    """Sharded grads (tile psum + data pmean) == single-device grads."""
    from gaussian_splatting_web_tpu.train.trainer import make_train_step

    cloud = make_random_cloud(24, seed=3, sh_degree=0)
    model = GaussianModel.from_cloud(cloud)
    cams = [_camera((0, 0, -6)), _camera((0, 1, -6))]
    targets = []
    for c in cams:
        t, _ = render(make_random_cloud(24, seed=9), c, W, H, CFG)
        targets.append(t)
    targets = jnp.stack(targets)
    cameras = stack_cameras(cams)

    opt = optax.adam(1e-3)
    mesh = make_mesh(data=2, tile=4)
    state0 = init_train_state(model, opt)
    sharded_step = make_sharded_train_step(opt, W, H, mesh, CFG, lambda_dssim=0.2)
    state_sharded, loss_sharded = sharded_step(state0, cameras, targets)

    # single-device equivalent: mean loss over the 2 cameras
    step1 = make_train_step(opt, W, H, CFG, lambda_dssim=0.2)
    # manual two-camera mean using the same optimizer
    import jax as _jax
    from gaussian_splatting_web_tpu.train.loss import photometric_loss
    from gaussian_splatting_web_tpu.ops.rasterize import render_impl

    def loss_fn(params):
        def one(cam_i, tgt):
            img, _ = render_impl(params.to_cloud(), cam_i, W, H, CFG)
            return photometric_loss(img, tgt, 0.2)
        return (one(cams[0], targets[0]) + one(cams[1], targets[1])) / 2

    loss_ref, g_ref = _jax.value_and_grad(loss_fn)(model)
    np.testing.assert_allclose(float(loss_sharded), float(loss_ref), atol=1e-5)

    updates, _ = opt.update(g_ref, state0.opt_state, model)
    params_ref = optax.apply_updates(model, updates)
    for a, b in zip(jax.tree_util.tree_leaves(state_sharded.params),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


# ---------------------------------------------------------------------------
# round 2: gaussian sharding with ring exchange (VERDICT r1 item 4)
# ---------------------------------------------------------------------------

def test_ring_all_gather_matches_full():
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from gaussian_splatting_web_tpu.parallel.gaussian_sharded import (
        ring_all_gather,
    )
    from gaussian_splatting_web_tpu.parallel.mesh import AXES

    mesh = make_mesh(tile=8)
    x = jnp.arange(8 * 4 * 3, dtype=jnp.float32).reshape(32, 3)

    # every device must reconstruct the identical full array
    @partial(shard_map, mesh=mesh, in_specs=P(AXES.tile), out_specs=P(AXES.tile),
             check_vma=False)
    def run_diff(shard):
        full = ring_all_gather(shard, AXES.tile, 8)
        return jnp.abs(full - x).max()[None]  # per-device max error

    err = run_diff(x)
    assert float(jnp.max(err)) == 0.0


def test_render_gaussian_sharded_matches_single_device():
    from gaussian_splatting_web_tpu.parallel.gaussian_sharded import (
        render_gaussian_sharded,
    )

    cloud = make_random_cloud(40, seed=0, sh_degree=1)
    camera = _camera()
    img_1, _ = render(cloud, camera, W, H, CFG)
    mesh = make_mesh(tile=8)
    rgb, alpha = render_gaussian_sharded(cloud, camera, W, H, mesh, CFG)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(img_1), atol=1e-5)


def test_render_gaussian_sharded_banded_matches_and_shrinks():
    """Ring-sharded binning (VERDICT r2 item 5): contiguous-band tile
    ownership + per-hop candidate compaction must (a) match the replicated
    render exactly up to compositor tolerance, (b) match its GRADIENTS,
    and (c) bin only ~cand_factor/S of the splats per device (the
    O(N·d/S) sort/memory claim, asserted on the static candidate count).
    """
    from gaussian_splatting_web_tpu.parallel.gaussian_sharded import (
        render_gaussian_sharded_banded,
    )

    cloud = make_random_cloud(8192, seed=2, sh_degree=1)
    # taller frame so the 4 bands each own ≥2 tile rows (the band filter
    # needs gy ≥ n_shards to partition; splats are center-heavy, so the
    # middle bands see the most candidates). Single-tier binning: this
    # dense mini-scene overflows the compacted-tier caps, and cap
    # truncation keeps the FIRST cap_j splats in input order — the ring
    # reorders candidates, so an overflowing config is order-sensitive
    # by design (graceful degradation); exactness claims need overflow 0.
    cfg = CFG.replace(tier_split=0, depth_bits=0)
    w, h = 64, 128
    camera = cam.default_camera(w, h, eye=(0, 0, -6), center=(0, 0, 0))
    mesh = make_mesh(tile=4)
    s = 4
    cand_factor = 2.5

    img_1, aux = render(cloud, camera, w, h, cfg)
    assert int(aux["overflow"]) == 0
    rgb, alpha, overflow = jax.jit(
        lambda c: render_gaussian_sharded_banded(
            c, camera, w, h, mesh, cfg, cand_factor=cand_factor)
    )(cloud)
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(img_1),
                               atol=2e-5)

    # (b) gradients through the ring + compaction match the replicated path
    ww = jnp.linspace(0.5, 1.5, w)[None, :, None]

    def loss_banded(c):
        rgb, a, _ = render_gaussian_sharded_banded(
            c, camera, w, h, mesh, cfg, cand_factor=cand_factor)
        return jnp.sum(rgb * ww) + jnp.sum(a)

    def loss_rep(c):
        img, aux = __import__(
            "gaussian_splatting_web_tpu.ops.rasterize",
            fromlist=["render_impl"]).render_impl(c, camera, w, h, cfg)
        return jnp.sum(img * ww) + jnp.sum(aux["alpha"])

    g_b = jax.grad(loss_banded)(cloud)
    g_r = jax.grad(loss_rep)(cloud)
    for a, b in zip(jax.tree_util.tree_leaves(g_b),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    # (c) per-device candidate set is ~cand_factor/S of N (vs the
    # replicated-binning ring path, which bins all N on every device)
    from gaussian_splatting_web_tpu.parallel.gaussian_sharded import (
        banded_cap_hop,
    )

    n = cloud.num_gaussians
    n_local = s * banded_cap_hop(n, s, cand_factor)
    assert n_local <= cand_factor * n / s, (n_local, n)


def test_gaussian_sharded_train_matches_single_device():
    """Sharded params + ring exchange: one step == replicated step, and
    param/moment memory per device is N/S."""
    import jax as _jax
    import optax as _optax

    from gaussian_splatting_web_tpu.ops.rasterize import render_impl
    from gaussian_splatting_web_tpu.parallel.gaussian_sharded import (
        init_sharded_train_state, make_gaussian_sharded_train_step,
    )
    from gaussian_splatting_web_tpu.train.loss import photometric_loss

    n = 24
    cloud = make_random_cloud(n, seed=3, sh_degree=0)
    model = GaussianModel.from_cloud(cloud)
    cams = [_camera((0, 0, -6)), _camera((0, 1, -6))]
    targets = jnp.stack([
        render(make_random_cloud(n, seed=9), c, W, H, CFG)[0] for c in cams
    ])
    cameras = stack_cameras(cams)

    opt = _optax.adam(1e-3)
    mesh = make_mesh(data=2, tile=4)
    state0 = init_sharded_train_state(model, opt, mesh)

    # params and moments live sharded: N/S rows per device
    xyz = state0.params.xyz
    shard_rows = xyz.addressable_shards[0].data.shape[0]
    assert shard_rows == n // 4

    step = make_gaussian_sharded_train_step(opt, W, H, mesh, CFG,
                                            lambda_dssim=0.2)
    state1, loss_sharded, _aux = step(state0, cameras, targets)

    def loss_fn(params):
        def one(cam_i, tgt):
            img, _ = render_impl(params.to_cloud(), cam_i, W, H, CFG)
            return photometric_loss(img, tgt, 0.2)
        return (one(cams[0], targets[0]) + one(cams[1], targets[1])) / 2

    loss_ref, g_ref = _jax.value_and_grad(loss_fn)(model)
    np.testing.assert_allclose(float(loss_sharded), float(loss_ref), atol=1e-5)

    state_ref0 = init_train_state(model, opt)
    updates, _ = opt.update(g_ref, state_ref0.opt_state, model)
    params_ref = optax.apply_updates(model, updates)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gaussian_sharded_banded_train_matches_replicated():
    """Banded TRAIN step (VERDICT r3 item 5): the ring-sharded binning
    inside make_gaussian_sharded_train_step(banded=True) must produce the
    same loss and post-step params as the replicated single-device step,
    while each device bins only ≈cand_factor·N/S candidates (static
    shape assertion — the O(N·d/S) claim for TRAINING)."""
    import optax as _optax

    from gaussian_splatting_web_tpu.ops.rasterize import render_impl
    from gaussian_splatting_web_tpu.parallel.gaussian_sharded import (
        banded_cap_hop, init_sharded_train_state,
        make_gaussian_sharded_train_step,
    )
    from gaussian_splatting_web_tpu.train.loss import photometric_loss

    n = 2048
    cfg = CFG.replace(tier_split=0, depth_bits=0)
    w, h = 64, 128
    cloud = make_random_cloud(n, seed=4, sh_degree=0)
    model = GaussianModel.from_cloud(cloud)
    cams = [cam.default_camera(w, h, eye=(0, y, -6), center=(0, 0, 0))
            for y in (0.0, 1.0)]
    tgt = [render(make_random_cloud(256, seed=11), c, w, h, cfg)[0]
           for c in cams]
    cameras = stack_cameras(cams)
    targets = jnp.stack(tgt)

    opt = _optax.adam(1e-3)
    mesh = make_mesh(data=2, tile=4)
    s = 4
    cand_factor = 2.5
    state0 = init_sharded_train_state(model, opt, mesh)

    step = make_gaussian_sharded_train_step(
        opt, w, h, mesh, cfg, lambda_dssim=0.2,
        banded=True, cand_factor=cand_factor, n_gaussians=n)
    state1, loss_banded, aux_b = step(state0, cameras, targets)

    # per-device candidate set is ≈cand_factor/S of N in the TRAIN step
    assert s * banded_cap_hop(n, s, cand_factor) <= cand_factor * n / s

    def loss_fn(params):
        def one(c, t):
            img, _ = render_impl(params.to_cloud(), c, w, h, cfg)
            return photometric_loss(img, t, 0.2)
        return (one(cams[0], tgt[0]) + one(cams[1], tgt[1])) / 2

    loss_ref, g_ref = jax.value_and_grad(loss_fn)(model)
    np.testing.assert_allclose(float(loss_banded), float(loss_ref),
                               atol=1e-5)

    state_ref0 = init_train_state(model, opt)
    updates, _ = opt.update(g_ref, state_ref0.opt_state, model)
    params_ref = optax.apply_updates(model, updates)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_multihost_init_noop_without_coordinator(monkeypatch):
    from gaussian_splatting_web_tpu.parallel.multihost import (
        initialize_multihost,
    )

    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_multihost() is False  # single-process: no-op


def test_run_with_restarts_retries_then_succeeds():
    from gaussian_splatting_web_tpu.parallel.multihost import (
        run_with_restarts,
    )

    calls = []

    def flaky(ckpt_dir):
        calls.append(ckpt_dir)
        if len(calls) < 3:
            raise RuntimeError("simulated preemption")
        return "done"

    out = run_with_restarts(flaky, checkpoint_dir="/tmp/x", max_restarts=3,
                            backoff_s=0.0)
    assert out == "done" and len(calls) == 3


def test_run_with_restarts_gives_up():
    import pytest as _pytest

    from gaussian_splatting_web_tpu.parallel.multihost import (
        run_with_restarts,
    )

    def always_fails(_):
        raise RuntimeError("hard failure")

    with _pytest.raises(RuntimeError):
        run_with_restarts(always_fails, max_restarts=2, backoff_s=0.0)


def test_run_with_restarts_no_retry_deterministic():
    """Deterministic errors surface immediately; transient-named ones
    (e.g. grpc UnavailableError) retry even if not RuntimeError
    (ADVICE r4)."""
    import pytest as _pytest

    from gaussian_splatting_web_tpu.parallel.multihost import (
        run_with_restarts,
    )

    calls = []

    def bad_config(_):
        calls.append(1)
        raise ValueError("shape mismatch")

    with _pytest.raises(ValueError):
        run_with_restarts(bad_config, max_restarts=3, backoff_s=0.0)
    assert len(calls) == 1  # not retried

    class UnavailableError(Exception):  # grpc-style transient
        pass

    calls2 = []

    def flaky_rpc(_):
        calls2.append(1)
        if len(calls2) < 2:
            raise UnavailableError("channel down")
        return "ok"

    assert run_with_restarts(flaky_rpc, max_restarts=3,
                             backoff_s=0.0) == "ok"
    assert len(calls2) == 2


def test_banded_a2a_matches_ring_stream():
    """The round-5 all_to_all candidate delivery (one class sort of the
    OWNED splats, O(N/S) per device) must render identically to the
    legacy per-hop ring filter (O(N) compaction per device) — same
    candidate SET per band, different order; depth_bits=0 makes the
    compositor order-exact."""
    from gaussian_splatting_web_tpu.parallel.gaussian_sharded import (
        render_gaussian_sharded_banded,
    )

    cloud = make_random_cloud(4096, seed=7, sh_degree=0)
    cfg = CFG.replace(tier_split=0, depth_bits=0)
    w, h = 64, 128
    camera = cam.default_camera(w, h, eye=(0, 0, -6), center=(0, 0, 0))
    mesh = make_mesh(tile=4)

    out = {}
    for stream in ("ring", "a2a"):
        rgb, alpha, over = jax.jit(
            lambda c, stream=stream: render_gaussian_sharded_banded(
                c, camera, w, h, mesh, cfg, cand_factor=2.5,
                stream=stream)
        )(cloud)
        assert int(over) == 0, stream
        out[stream] = np.asarray(rgb)
    np.testing.assert_allclose(out["a2a"], out["ring"], atol=2e-5)
