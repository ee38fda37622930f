"""Test configuration: run everything on CPU with an 8-device virtual mesh.

SURVEY.md §4: the TPU-world "fake backend" for distributed tests is
`--xla_force_host_platform_device_count=N` on the CPU platform. The
environment pre-sets JAX_PLATFORMS=axon (the real-TPU tunnel), so we must
override it both in the env and through jax.config *before* any backend is
touched.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: XLA-CPU compiles are slow on this box; cache them
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gaussian_splatting_web_tpu.core.types import GaussianCloud  # noqa: E402

REFERENCE_PUBLIC = "/root/reference/public"


def make_random_cloud(n: int, seed: int = 0, sh_degree: int = 0,
                      spread: float = 1.0, center=(0.0, 0.0, 0.0)) -> GaussianCloud:
    """A reproducible random test scene (the role of the reference's tiny
    checked-in PLYs, SURVEY.md §4)."""
    rng = np.random.default_rng(seed)
    k = {0: 1, 1: 4, 2: 9, 3: 16}[sh_degree]
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return GaussianCloud(
        xyz=(rng.normal(size=(n, 3)) * spread + np.asarray(center)).astype(np.float32),
        log_scale=rng.uniform(-3.5, -1.5, size=(n, 3)).astype(np.float32),
        quat=q,
        opacity_logit=rng.uniform(-2.0, 2.0, size=(n,)).astype(np.float32),
        sh=rng.normal(scale=0.3, size=(n, k, 3)).astype(np.float32),
    )


@pytest.fixture
def random_cloud():
    return make_random_cloud(64, seed=0, sh_degree=0)


def assert_images_close(img, ref, atol=2e-4, max_bad_frac=2e-4):
    """allclose for rendered images with an escape hatch for transmittance-
    threshold ties: the parallel log-cumsum compositor and a sequential
    product can round the T<1e-4 early-termination comparison differently on
    isolated knife-edge pixels. Those pixels are bounded in number, not in
    magnitude."""
    img = np.asarray(img, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    diff = np.abs(img - ref).max(axis=-1)
    bad = diff > atol
    frac = bad.mean()
    assert frac <= max_bad_frac, (
        f"{bad.sum()} pixels (frac {frac:.2e}) differ by more than {atol}; "
        f"max diff {diff.max():.3e}"
    )
