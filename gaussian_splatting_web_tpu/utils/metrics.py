"""Timing + throughput metrics.

The reference's only instrumentation is a DOM FPS label updated per frame
(renderer.ts:70-72, 332-338). Here: a block_until_ready timing harness and
structured per-frame stats (Mpix/s, splats sorted/s, tiles touched), per
SURVEY.md §5 observability plan.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class FrameStats:
    frame_ms: float
    mpix_per_s: float
    num_gaussians: int
    num_pairs: int = 0
    overflow: int = 0

    def as_dict(self) -> Dict:
        return dataclasses.asdict(self)


class Timer:
    """Wall-clock timer that blocks on JAX async dispatch."""

    def __init__(self):
        self.t0 = None
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def enable_compile_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (first axon-TPU compiles
    route through a remote-compile tunnel and take minutes; the cache makes
    every later CLI/bench invocation start hot). Defaults to a repo-local
    directory (survives /tmp wipes between driver rounds)."""
    import os

    import jax

    if path is None:
        path = os.environ.get("GSWT_COMPILE_CACHE") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


_scalarize = None


def _force(out) -> float:
    """Force completion of a computation with a 4-byte device→host fetch.

    On tunneled/remote PJRT platforms (the axon TPU relay here),
    `block_until_ready` can return before execution finishes and full-array
    fetches pay seconds of relay bandwidth; reducing on-device and pulling
    one scalar is the only reliable, cheap completion barrier.
    """
    global _scalarize
    if _scalarize is None:
        _scalarize = jax.jit(
            lambda leaves: sum(
                jnp.sum(x.astype(jnp.float32)) for x in leaves
            )
        )
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    return float(_scalarize(leaves))


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median seconds per call of `fn(*args)`, forcing completion via an
    on-device reduction + scalar fetch (see _force)."""
    for _ in range(warmup):
        _force(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def time_fn_device(body: Callable, iters: int = 8, reps: int = 3) -> float:
    """Seconds per iteration of `body`, measured with an on-device
    `fori_loop` so per-call dispatch/tunnel overhead (tens of ms through the
    axon relay) amortizes away.

    `body(carry: f32[]) -> f32[]` must *consume* the carry (e.g. perturb an
    input by `carry * 1e-30`) so XLA cannot hoist it out of the loop, and
    return a scalar contribution (e.g. `sum(out) * 1e-30`).
    """
    f1 = jax.jit(lambda: jax.lax.fori_loop(0, 1, lambda i, c: body(c), 0.0))
    fn = jax.jit(
        lambda: jax.lax.fori_loop(0, iters, lambda i, c: body(c), 0.0)
    )
    t1 = time_fn(f1, iters=reps, warmup=1)
    tn = time_fn(fn, iters=reps, warmup=1)
    return max((tn - t1) / (iters - 1), 1e-9)


def throughput_mpixps(width: int, height: int, seconds: float) -> float:
    return width * height / seconds / 1e6
