"""Measure lax.sort cost at the anchor-binning sizes (round-4 design):
the anchor scheme sorts N + big_dup ≈ 1.25M elements (key + 6 payloads +
slot) instead of the duplicated 3.45M-slot 8-operand sort.

Usage: python tools/anchor_sort.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def measure(n, n_payloads, iters=6):
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**31, size=(n,), dtype=np.int64)
                      .astype(np.uint32))
    pays = tuple(
        jnp.asarray(rng.integers(0, 2**31, size=(n,), dtype=np.int64)
                    .astype(np.uint32))
        for _ in range(n_payloads))

    @jax.jit
    def f(key, pays):
        out = jax.lax.sort((key,) + pays, num_keys=1)
        # consume every payload so nothing is DCE'd by the sort simplifier
        return sum(o[::4096].astype(jnp.float32).sum() for o in out)

    from gaussian_splatting_web_tpu.utils.metrics import time_fn

    jax.block_until_ready(f(key, pays))
    t = time_fn(lambda: f(key, pays) * 1e-30, iters=iters, warmup=2)
    print(f"n={n:>9,} key+{n_payloads} payloads: {t * 1e3:8.2f} ms")
    return t


def main():
    from gaussian_splatting_web_tpu.utils.metrics import enable_compile_cache

    enable_compile_cache()
    print(f"devices={jax.devices()}", file=sys.stderr)
    for n in (1_000_000, 1_250_000, 1_500_000, 2_000_000, 3_450_000):
        measure(n, 7)
    # operand sensitivity at the anchor size
    for p in (2, 5, 7, 9):
        measure(1_250_000, p)


if __name__ == "__main__":
    main()
