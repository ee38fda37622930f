"""End-to-end renderer tests: tiled TPU-style renderer vs the NumPy oracle
(BASELINE.md correctness configs: image allclose vs CPU reference)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_splatting_web_tpu.config import RenderConfig
from gaussian_splatting_web_tpu.core import camera as cam
from gaussian_splatting_web_tpu.io.ply import read_ply
from gaussian_splatting_web_tpu.ops.rasterize import render
from gaussian_splatting_web_tpu.ref.cpu_reference import render_reference
from tests.conftest import REFERENCE_PUBLIC, assert_images_close, make_random_cloud

# Exact-order oracle-parity mode: depth_bits=0 keeps the (tile, depth)
# two-key sort so per-tile order bit-matches the NumPy reference, and
# pack_fields=False keeps conic/rgb/opacity exact f32 (the shipped default
# bf16-rounds them to halve sort-payload traffic). The shipped defaults
# (depth_bits=19, pack_fields=True) are validated against this exact mode
# in test_default_config_quality.
CFG = RenderConfig(max_dup=128, max_per_tile=256, tile_chunk=8, depth_bits=0,
                   pack_fields=False)


def _orbit(w, h, eye=(0, 0, -6)):
    return cam.default_camera(w, h, eye=eye, center=(0, 0, 0))


@pytest.mark.parametrize("seed,sh_degree", [(0, 0), (1, 1), (2, 3)])
def test_render_matches_oracle_random(seed, sh_degree):
    cloud = make_random_cloud(48, seed=seed, sh_degree=sh_degree)
    w, h = 96, 64
    camera = _orbit(w, h)
    img, aux = render(cloud, camera, w, h, CFG)
    ref = render_reference(cloud, camera, w, h, CFG)
    assert int(aux["overflow"]) == 0
    np.testing.assert_allclose(np.asarray(img), ref, atol=2e-4)


def test_render_simple_ply_vs_oracle():
    """BASELINE config 1: reference scene, cam.json-style camera."""
    cloud = read_ply(f"{REFERENCE_PUBLIC}/simple.ply")
    lo, hi = cloud.bbox()
    center = np.asarray((np.asarray(lo) + np.asarray(hi)) / 2)
    w = h = 64
    camera = cam.default_camera(w, h, eye=center + np.array([0, 0, -3.0]),
                                center=center)
    img, _ = render(cloud, camera, w, h, CFG)
    ref = render_reference(cloud, camera, w, h, CFG)
    np.testing.assert_allclose(np.asarray(img), ref, atol=2e-4)
    assert float(jnp.max(img)) > 0.0  # scene actually visible


def test_render_background():
    cloud = make_random_cloud(4, seed=0)
    cloud.opacity_logit = np.full((4,), -20.0, dtype=np.float32)  # invisible
    cfg = CFG.replace(background=(0.25, 0.5, 0.75))
    w = h = 32
    img, _ = render(cloud, _orbit(w, h), w, h, cfg)
    np.testing.assert_allclose(
        np.asarray(img), np.broadcast_to([0.25, 0.5, 0.75], (h, w, 3)), atol=1e-5
    )


def test_render_empty_tiles_are_background():
    """A single tiny splat in the corner leaves the rest of the image empty."""
    cloud = make_random_cloud(1, seed=0)
    cloud.xyz = np.array([[2.0, 2.0, 0.0]], dtype=np.float32)
    w, h = 64, 48
    img, _ = render(cloud, _orbit(w, h), w, h, CFG)
    assert np.all(np.isfinite(np.asarray(img)))


def test_front_to_back_ordering():
    """A nearer opaque splat must occlude a farther one on the same ray."""
    cloud = make_random_cloud(2, seed=0, sh_degree=0)
    cloud.xyz = np.array([[0, 0, -1.0], [0, 0, 1.0]], dtype=np.float32)
    cloud.log_scale = np.full((2, 3), -1.0, dtype=np.float32)
    cloud.quat = np.tile(np.array([[0, 0, 0, 1.0]], np.float32), (2, 1))
    cloud.opacity_logit = np.array([8.0, 8.0], dtype=np.float32)  # ~opaque
    # near one red-ish, far one blue-ish (degree 0: color = C0·sh + 0.5)
    cloud.sh = np.zeros((2, 1, 3), dtype=np.float32)
    cloud.sh[0, 0] = [1.5, -1.5, -1.5]
    cloud.sh[1, 0] = [-1.5, -1.5, 1.5]
    w = h = 64
    camera = _orbit(w, h, eye=(0, 0, -6))  # near splat is the one at z=-1
    img, _ = render(cloud, camera, w, h, CFG)
    center = np.asarray(img)[h // 2, w // 2]
    assert center[0] > 0.8 and center[2] < 0.2  # red wins
    ref = render_reference(cloud, camera, w, h, CFG)
    np.testing.assert_allclose(np.asarray(img), ref, atol=2e-4)


def test_early_termination_matches_oracle():
    """Stack many opaque splats so the transmittance cutoff actually fires."""
    n = 30
    cloud = make_random_cloud(n, seed=5, sh_degree=0)
    rng = np.random.default_rng(7)
    cloud.xyz = np.concatenate(
        [rng.normal(scale=0.05, size=(n, 2)), rng.uniform(-2, 2, (n, 1))], axis=1
    ).astype(np.float32)
    cloud.opacity_logit = np.full((n,), 6.0, dtype=np.float32)
    cloud.log_scale = np.full((n, 3), -0.7, dtype=np.float32)
    w = h = 48
    camera = _orbit(w, h)
    img, _ = render(cloud, camera, w, h, CFG)
    ref = render_reference(cloud, camera, w, h, CFG)
    assert_images_close(img, ref)


def test_max_per_tile_truncation_is_graceful():
    cloud = make_random_cloud(64, seed=3)
    cfg = CFG.replace(max_per_tile=8)
    w = h = 32
    img, _ = render(cloud, _orbit(w, h), w, h, cfg)
    assert np.all(np.isfinite(np.asarray(img)))


def test_render_jit_cache():
    """Second call with same shapes must not retrace (static-arg hygiene)."""
    cloud = make_random_cloud(8, seed=0)
    w = h = 32
    camera = _orbit(w, h)
    img1, _ = render(cloud, camera, w, h, CFG)
    camera2 = cam.default_camera(w, h, eye=(0, 1, -6), center=(0, 0, 0))
    img2, _ = render(cloud, camera2, w, h, CFG)
    assert img1.shape == img2.shape == (h, w, 3)


def test_default_config_quality_vs_exact_sort():
    """The SHIPPED RenderConfig (packed depth key, two-tier binning, pair
    cap) must render the same image as the exact two-key mode up to
    depth-tie reordering on isolated pixels (VERDICT r1 item 3: defaults ==
    benched config, re-verified against the oracle-parity mode)."""
    cloud = make_random_cloud(128, seed=5, sh_degree=1)
    w, h = 96, 64
    camera = _orbit(w, h)
    img_default, aux = render(cloud, camera, w, h, RenderConfig())
    img_exact, _ = render(cloud, camera, w, h,
                          RenderConfig(depth_bits=0, gather_cap_factor=0.0))
    assert int(aux["overflow"]) == 0
    assert_images_close(np.asarray(img_default), np.asarray(img_exact),
                        atol=2e-4, max_bad_frac=5e-3)
    # and against the FULLY exact mode (pack_fields=False too), which pins
    # the documented bf16 field-payload quantization cost on the image:
    # ~1e-3 abs, not cancelled between the two sides (ADVICE r2 item 2)
    img_exact_f32, _ = render(
        cloud, camera, w, h,
        RenderConfig(depth_bits=0, gather_cap_factor=0.0, pack_fields=False))
    assert_images_close(np.asarray(img_default), np.asarray(img_exact_f32),
                        atol=8e-3, max_bad_frac=5e-3)


def test_bfloat16_storage_close_to_f32():
    """config.dtype='bfloat16' scene storage (SH/scale/quat/opacity in bf16,
    positions f32; GaussianCloud.with_storage_dtype) renders within ~1% of
    the f32 scene — the SURVEY §7 'bf16 storage, f32 accumulate' policy."""
    cloud = make_random_cloud(64, seed=3, sh_degree=2)
    w, h = 96, 64
    camera = _orbit(w, h)
    img_f32, _ = render(cloud, camera, w, h, CFG)
    import jax
    cloud_bf = jax.device_put(cloud).with_storage_dtype("bfloat16")
    assert cloud_bf.sh.dtype.name == "bfloat16"
    assert cloud_bf.xyz.dtype.name == "float32"
    img_bf, _ = render(cloud_bf, camera, w, h, CFG)
    diff = np.abs(np.asarray(img_bf) - np.asarray(img_f32))
    assert diff.mean() < 5e-3
    assert np.percentile(diff, 99) < 0.05
    # the documented knob must act through the config too: passing an f32
    # cloud with RenderConfig(dtype='bfloat16') applies the same storage
    # policy inside render_impl (VERDICT r2 item 9)
    img_cfg, _ = render(cloud, camera, w, h, CFG.replace(dtype="bfloat16"))
    np.testing.assert_array_equal(np.asarray(img_cfg), np.asarray(img_bf))


def test_debug_selected_splat_highlight():
    """config.debug_selected: the chosen gaussian renders magenta at ≥0.9
    alpha through the normal blend stack (the reference's negative-opacity
    "selected" path, simple_render.ts:171,181-190), other pixels
    unchanged."""
    cloud = make_random_cloud(12, seed=6, sh_degree=0)
    w = h = 64
    camera = _orbit(w, h)
    img0, _ = render(cloud, camera, w, h, CFG)
    imgd, _ = render(cloud, camera, w, h, CFG.replace(debug_selected=3))
    d = np.abs(np.asarray(imgd) - np.asarray(img0))
    changed = d.max(axis=-1) > 1e-3
    assert changed.any()                       # the splat is visible
    # changed pixels lean magenta: green differs from red/blue
    ch = np.asarray(imgd)[changed]
    assert float(np.mean(ch[:, 0] + ch[:, 2] - 2 * ch[:, 1])) > 0.1
    # a far-away region is untouched
    assert not changed.all()
