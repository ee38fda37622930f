"""Real-scale PLY artifact (VERDICT r4 item 4; BASELINE configs 3-4):
write a >=2M-splat trained-scene-shaped cloud as an INRIA-layout PLY file
(io.ply.write_ply), load it back through the real file path
(io.ply.read_ply), and run the shipped render pipeline on it at 1080p on
the TPU — recording throughput plus the overflow/slot-cap behavior that
only shows up at this scale.

The reference ships captured scenes of this size stripped from its repo
(/root/reference/public/.MISSING_LARGE_BLOBS lists kaido.ply / ply.ply);
bench_lib.make_scene is the trained-scene-shaped stand-in (footprint and
opacity distributions matched to a trained capture). Optionally appends a
genuinely trained model (--trained-ply, from tools/train_bench.py
--save-ply) tiled+jittered to the target count instead.

Writes BIGSCENE_r05.json. Usage:
    python tools/bigscene_bench.py [--n 2500000] [--trained-ply f.ply]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_500_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--ply", default="/tmp/bigscene.ply")
    ap.add_argument("--trained-ply", default=None,
                    help="tile+jitter this trained model to --n splats "
                    "instead of the synthetic generator")
    ap.add_argument("--out", default="BIGSCENE_r05.json")
    ap.add_argument("--grads", action="store_true",
                    help="also time fwd+bwd at this scale")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_splatting_web_tpu import bench_lib
    from gaussian_splatting_web_tpu.config import RenderConfig
    from gaussian_splatting_web_tpu.core import camera as cam
    from gaussian_splatting_web_tpu.core.types import GaussianCloud
    from gaussian_splatting_web_tpu.io.ply import read_ply, write_ply
    from gaussian_splatting_web_tpu.ops.projection import project_gaussians
    from gaussian_splatting_web_tpu.ops.rasterize import render_impl
    from gaussian_splatting_web_tpu.utils.metrics import (
        enable_compile_cache, time_fn_device,
    )

    def log(m):
        print(m, file=sys.stderr, flush=True)

    enable_compile_cache()
    w, h = args.width, args.height
    config = RenderConfig()

    # --- build + write the PLY (the artifact's provenance) ---------------
    if args.trained_ply:
        base = read_ply(args.trained_ply)
        nb = base.num_gaussians
        reps = -(-args.n // nb)
        rng = np.random.default_rng(11)
        parts = []
        for r in range(reps):
            # jittered copies fill a grid of scene-extent cells so the
            # result is a plausible larger capture, not a superposition
            off = (np.array([r % 3 - 1, (r // 3) % 3 - 1, r // 9])
                   * 2.6).astype(np.float32)
            parts.append(GaussianCloud(
                xyz=np.asarray(base.xyz) + off
                + rng.normal(scale=0.01, size=(nb, 3)).astype(np.float32),
                log_scale=np.asarray(base.log_scale),
                quat=np.asarray(base.quat),
                opacity_logit=np.asarray(base.opacity_logit),
                sh=np.asarray(base.sh),
            ))
        cat = {f: np.concatenate(
            [np.asarray(getattr(p, f)) for p in parts])[:args.n]
            for f in ("xyz", "log_scale", "quat", "opacity_logit", "sh")}
        cloud = GaussianCloud(**cat)
        source = f"trained model {args.trained_ply} tiled x{reps}"
    else:
        cloud = bench_lib.make_scene(args.n, sh_degree=3)
        source = "bench_lib.make_scene (trained-scene-shaped synthetic)"

    t0 = time.time()
    write_ply(cloud, args.ply)
    t_write = time.time() - t0
    size_mb = os.path.getsize(args.ply) / 1e6
    log(f"wrote {args.ply}: {args.n} splats, {size_mb:.0f} MB "
        f"in {t_write:.1f}s ({source})")

    t0 = time.time()
    cloud = read_ply(args.ply)
    t_read = time.time() - t0
    n = cloud.num_gaussians
    log(f"read back {n} splats in {t_read:.1f}s "
        f"(SH degree {int(np.sqrt(cloud.sh.shape[1])) - 1})")

    lo, hi = cloud.bbox()
    center = (np.asarray(lo) + np.asarray(hi)) / 2
    eye = center + np.array([0, 0, -5.0])
    camera = jax.device_put(cam.default_camera(w, h, eye=eye, center=center))
    cloud = jax.device_put(cloud)

    # --- footprint/slot-cap accounting at this scale ---------------------
    splats = jax.jit(lambda c: project_gaussians(c, camera, w, h, config)
                     )(cloud)
    from gaussian_splatting_web_tpu.ops.sort import _footprints

    x0, y0, rw, rh = jax.jit(
        lambda s: _footprints(s, w, h, config))(splats)
    ntg = np.asarray(rw) * np.asarray(rh)
    mid_cap = max(min(int(n * config.mid_frac), n), 256)
    big_cap = max(min(int(n * config.big_frac), n), 256)
    n_mid = int(((ntg > config.tier_split) & (ntg <= config.tier_mid)).sum())
    n_big = int((ntg > config.tier_mid).sum())
    n_over = int((ntg > config.max_dup).sum())
    log(f"footprints: visible={int((ntg > 0).sum())} "
        f"mid(3-4 tiles)={n_mid}/{mid_cap} big(>4)={n_big}/{big_cap} "
        f">max_dup={n_over}")

    # --- forward render timing (the shipped pipeline, fused kernel) ------
    import dataclasses

    def perturbed(c):
        return dataclasses.replace(cloud, xyz=cloud.xyz + c * 1e-30)

    def fwd_body(c):
        img, _ = render_impl(perturbed(c), camera, w, h, config)
        return jnp.sum(img) * 1e-30

    t_f = time_fn_device(fwd_body, iters=8)
    mpixps = w * h / t_f / 1e6
    log(f"forward: {t_f*1e3:.2f} ms -> {mpixps:.1f} Mpix/s "
        f"({n} gaussians @{w}x{h})")

    img, aux = jax.jit(
        lambda c: render_impl(c, camera, w, h, config),
        static_argnums=())(cloud)
    overflow = int(aux["overflow"])
    pairs = int(aux["num_pairs"])
    log(f"pairs={pairs} overflow={overflow} "
        f"visible={int(aux['num_visible'])}")

    out = {
        "n_gaussians": n,
        "source": source,
        "ply_mb": round(size_mb, 1),
        "ply_write_s": round(t_write, 2),
        "ply_read_s": round(t_read, 2),
        "resolution": [w, h],
        "forward_ms": round(t_f * 1e3, 2),
        "forward_mpix_per_s": round(mpixps, 2),
        "num_pairs": pairs,
        "overflow": overflow,
        "footprint_mid_used": n_mid, "footprint_mid_cap": mid_cap,
        "footprint_big_used": n_big, "footprint_big_cap": big_cap,
        "footprint_over_max_dup": n_over,
        "config": {k: getattr(config, k) for k in
                   ("max_dup", "tier_split", "tier_mid", "mid_frac",
                    "big_frac", "max_per_tile", "gather_cap_factor",
                    "depth_bits")},
        "platform": jax.default_backend(),
    }

    if args.grads:
        def loss(c):
            img, _ = render_impl(perturbed(c), camera, w, h, config)
            return jnp.sum(img)

        t_b = time_fn_device(lambda c: jax.grad(loss)(c) * 1e-30, iters=4)
        out["fwd_bwd_ms"] = round(t_b * 1e3, 2)
        out["fwd_bwd_mpix_per_s"] = round(w * h / t_b / 1e6, 2)
        log(f"fwd+bwd: {t_b*1e3:.2f} ms")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps({k: out[k] for k in
                      ("n_gaussians", "forward_mpix_per_s", "overflow")}))


if __name__ == "__main__":
    main()
