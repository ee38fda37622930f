"""Which knob drives the grad-parity MAX tail? Runs the bench parity
check at the 1M/1080p scene under (a) shipped config, (b) pack_grads off,
(c) pack_fields off — attributing the 3.4e-2 max (p99 is 1e-4). TPU only;
not library API."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from gaussian_splatting_web_tpu import bench_lib
from gaussian_splatting_web_tpu.bench_lib import _grad_parity
from gaussian_splatting_web_tpu.config import RenderConfig
from gaussian_splatting_web_tpu.core import camera as cam
from gaussian_splatting_web_tpu.utils.metrics import enable_compile_cache


def main():
    enable_compile_cache()
    import jax

    cloud = jax.device_put(bench_lib.make_scene(1_000_000))
    camera = jax.device_put(cam.default_camera(
        1920, 1080, eye=np.array([0, 0, -8.0]), center=np.zeros(3)))
    for name, cfg in (
        ("shipped", RenderConfig()),
        ("pack_grads=False", RenderConfig(pack_grads=False)),
        ("pack_fields=False too", RenderConfig(pack_grads=False,
                                               pack_fields=False)),
    ):
        g = _grad_parity(cloud, camera, 1920, 1080, cfg)
        print(f"{name:24s} p50={g['grad_p50']:.2e} p99={g['grad_p99']:.2e} "
              f"max={g['grad_max']:.2e}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
