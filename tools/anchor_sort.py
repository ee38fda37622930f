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


def measure(n, n_payloads, iters=8):
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**31, size=(n,), dtype=np.int64)
                      .astype(np.uint32))
    pays = tuple(
        jnp.asarray(rng.integers(0, 2**31, size=(n,), dtype=np.int64)
                    .astype(np.uint32))
        for _ in range(n_payloads))

    def body(c):
        # perturb the key with the carry so the sort cannot hoist; consume
        # every payload so nothing is DCE'd by the sort simplifier
        k = key ^ c.astype(jnp.uint32)
        out = jax.lax.sort((k,) + pays, num_keys=1)
        return sum(o[::4096].astype(jnp.float32).sum()
                   for o in out) * 1e-30

    from gaussian_splatting_web_tpu.utils.metrics import time_fn_device

    t = time_fn_device(body, iters=iters)
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
