"""Scaling-efficiency harness (BASELINE.md: ≥85% at N≥2).

Times the sharded render/train step on meshes of 1, 2, 4, ... devices and
reports efficiency = t(1) / (t(S) · S') where S' is the per-device work
ratio (tile compositing shards; projection shards in the gaussian-sharded
path; binning does not — see parallel/gaussian_sharded.py notes).

On real multi-chip hardware this measures ICI collectives; on the virtual
CPU mesh (the only multi-device backend in this environment —
xla_force_host_platform_device_count) the numbers are INDICATIVE ONLY:
virtual devices share host cores, so perfect scaling shows up as flat
wall-clock rather than 1/S. We therefore report both wall-clock and the
flat-time efficiency proxy. Not part of the library API.

Usage: JAX_PLATFORMS=cpu python tools/scaling_bench.py  (or on a TPU pod)
"""

from __future__ import annotations

import json
import os
import sys

if __name__ == "__main__" and "--tpu" not in sys.argv:
    os.environ.setdefault("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

sys.path.insert(0, "/root/repo")

from gaussian_splatting_web_tpu import bench_lib  # noqa: E402
from gaussian_splatting_web_tpu.config import RenderConfig  # noqa: E402
from gaussian_splatting_web_tpu.core import camera as cam  # noqa: E402
from gaussian_splatting_web_tpu.core.types import stack_cameras  # noqa: E402
from gaussian_splatting_web_tpu.models.gaussian_model import (  # noqa: E402
    GaussianModel,
)
from gaussian_splatting_web_tpu.parallel.mesh import make_mesh  # noqa: E402
from gaussian_splatting_web_tpu.parallel.train_sharded import (  # noqa: E402
    make_sharded_train_step,
)
from gaussian_splatting_web_tpu.train.trainer import (  # noqa: E402
    init_train_state,
)
from gaussian_splatting_web_tpu.utils.metrics import time_fn  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from gaussian_splatting_web_tpu.parallel.gaussian_sharded import (
        make_gaussian_sharded_train_step, shard_model,
    )

    n_dev = len(jax.devices())
    w, h, n = 256, 192, 50_000
    config = RenderConfig(max_per_tile=256)
    model = GaussianModel.from_cloud(bench_lib.make_scene(n, sh_degree=1))
    camera = cam.default_camera(w, h, eye=np.array([0, 0, -8.0]),
                                center=np.zeros(3))
    cameras = stack_cameras([camera])
    targets = jnp.zeros((1, h, w, 3), jnp.float32)
    opt = optax.adam(1e-3)

    out = {"platform": jax.default_backend(), "n_devices": n_dev,
           "note": ("virtual CPU mesh: devices share host cores, so perfect "
                    "scaling is FLAT wall-clock (flat_* proxy), not 1/S; "
                    "the eff_* strong-scaling numbers only apply on real "
                    "multi-chip ICI hardware, which this environment does "
                    "not expose (single tunneled v5e chip)"),
           "paths": {}}
    sizes = [s for s in (1, 2, 4, 8) if s <= n_dev]

    for name, maker, shard_params in (
        ("replicated_params", make_sharded_train_step, False),
        ("gaussian_sharded", make_gaussian_sharded_train_step, True),
    ):
        results = {}
        for s in sizes:
            mesh = make_mesh(jax.devices()[:s], data=1, tile=s)
            state = init_train_state(model, opt)
            if shard_params:
                state = init_train_state(
                    shard_model(model, mesh), opt)
            step = maker(opt, w, h, mesh, config)
            t = time_fn(step, state, cameras, targets, iters=4, warmup=1)
            results[s] = t
            log(f"{name} tile={s}: {t*1e3:8.1f} ms/step")

        t1 = results[sizes[0]]
        path = {"step_ms": {}}
        for s in sizes:
            # strong-scaling efficiency: t1 / (S * tS) on real chips; on
            # the shared-core virtual mesh, flat time (t1/tS) is the proxy
            path["step_ms"][s] = round(results[s] * 1e3, 1)
            eff = t1 / (s * results[s])
            flat = t1 / results[s]
            log(f"{name} tile={s}: strong-scaling eff={eff*100:5.1f}%  "
                f"flat-time proxy={flat*100:5.1f}%")
            path[f"eff_{s}"] = round(eff, 3)
            path[f"flat_{s}"] = round(flat, 3)
        out["paths"][name] = path
    print(json.dumps(out))


if __name__ == "__main__":
    main()
