"""Orbit state machine + web viewer + CLI smoke tests."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from gaussian_splatting_web_tpu.viewer import orbit
from tests.conftest import make_random_cloud


def test_rotate_preserves_radius():
    s = orbit.OrbitState(eye=(0, 0, -3), center=(0, 0, 0), radius=3.0)
    s2 = orbit.rotate(s, 0.5, 0.2)
    r = np.linalg.norm(np.asarray(s2.eye) - np.asarray(s2.center))
    assert abs(r - 3.0) < 1e-6
    assert s2.eye != s.eye


def test_rotate_noop_on_zero_delta():
    s = orbit.OrbitState()
    assert orbit.rotate(s, 0, 0) is s


def test_pole_flip_guard():
    """Large pitch deltas near the pole are rejected (camera.ts:218-223)."""
    s = orbit.OrbitState(eye=(0.01, 2.99, 0.0), center=(0, 0, 0), radius=3.0,
                         sensitivity=1.0)
    s2 = orbit.rotate(s, 0.0, 2.0)  # huge pitch → should be vetoed
    assert abs(s2.eye[1] - s.eye[1]) < 0.5


def test_translate_moves_eye_and_center_together():
    s = orbit.OrbitState(eye=(0, 0, -3), center=(0, 0, 0))
    s2 = orbit.translate(s, 0.1, 0.0)
    d_eye = np.asarray(s2.eye) - np.asarray(s.eye)
    d_center = np.asarray(s2.center) - np.asarray(s.center)
    np.testing.assert_allclose(d_eye, d_center, atol=1e-9)
    assert np.linalg.norm(d_eye) > 0


def test_zoom_clamps_radius():
    s = orbit.OrbitState(eye=(0, 0, -3), center=(0, 0, 0), radius=3.0)
    s2 = orbit.zoom(s, -1e6)
    assert s2.radius == 0.2  # camera.ts:168


def test_inertia_decay():
    s = orbit.OrbitState(eye=(1, 0, -3), center=(0, 0, 0),
                         previous_eye=(0, 0, -3))
    s = orbit.release(s)
    assert orbit.is_dirty(s)
    for _ in range(25):
        s = orbit.update(s)
    assert not orbit.is_dirty(s)


def test_to_camera():
    s = orbit.OrbitState(eye=(0, 0, -4), center=(0, 0, 0))
    c = orbit.to_camera(s, 64, 48)
    assert c.view.shape == (4, 4)
    np.testing.assert_allclose(c.cam_pos, [0, 0, -4], atol=1e-5)


def test_viewer_server_roundtrip():
    from gaussian_splatting_web_tpu.config import RenderConfig
    from gaussian_splatting_web_tpu.viewer.server import serve

    cloud = make_random_cloud(8, seed=0)
    cfg = RenderConfig(max_dup=16, max_per_tile=16, tile_chunk=2)
    httpd, app = serve(cloud, host="127.0.0.1", port=0, width=32, height=32,
                       config=cfg, block=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/") as r:
            assert b"tpu splat viewer" in r.read()
        with urllib.request.urlopen(base + "/info") as r:
            info = json.loads(r.read())
            assert info["num_gaussians"] == 8
        req = urllib.request.Request(
            base + "/event",
            data=json.dumps({"kind": "rotate", "dx": 0.3, "dy": 0.1}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            png = r.read()
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # malformed events must yield 400, not a dropped connection
        bad = urllib.request.Request(
            base + "/event", data=b"garbage!!!", method="POST"
        )
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # and the server must still serve afterwards
        with urllib.request.urlopen(base + "/info") as r:
            assert json.loads(r.read())["num_gaussians"] == 8
    finally:
        httpd.shutdown()


def test_cli_info_and_render(tmp_path, capsys):
    from gaussian_splatting_web_tpu.cli import main
    from gaussian_splatting_web_tpu.io.ply import write_ply

    cloud = make_random_cloud(6, seed=0, sh_degree=1)
    ply = tmp_path / "scene.ply"
    write_ply(cloud, str(ply))

    main(["info", "--ply", str(ply)])
    out = json.loads(capsys.readouterr().out)
    assert out["num_gaussians"] == 6 and out["sh_degree"] == 1

    outdir = tmp_path / "renders"
    main(["render", "--ply", str(ply), "--out", str(outdir),
          "--width", "48", "--height", "32",
          "--max-dup", "16", "--max-per-tile", "16", "--tile-chunk", "2"])
    pngs = list(outdir.glob("*.png"))
    assert len(pngs) == 1


def test_png_writer(tmp_path):
    from gaussian_splatting_web_tpu.utils.image import write_png, _png_bytes

    img = np.random.default_rng(0).uniform(size=(8, 10, 3)).astype(np.float32)
    p = tmp_path / "x.png"
    write_png(img, str(p))
    assert p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    # pure-python fallback encoder too
    raw = _png_bytes((img * 255).astype(np.uint8))
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"


def test_post_process():
    import jax.numpy as jnp

    from gaussian_splatting_web_tpu.ops.composite import post_process

    rgb = jnp.ones((8, 8, 3)) * 0.5
    alpha = jnp.full((8, 8), 0.4)
    out = post_process(rgb, alpha)
    # a' = sat(0.4*1.5) = 0.6 < 0.99 → 0.6^4
    np.testing.assert_allclose(np.asarray(out[..., 3]), 0.6**4, atol=1e-6)
    out2 = post_process(rgb, jnp.full((8, 8), 0.7))
    np.testing.assert_allclose(np.asarray(out2[..., 3]), 1.0, atol=1e-6)
