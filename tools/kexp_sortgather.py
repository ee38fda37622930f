"""Micro-benchmarks for the sort/gather/fold redesign (scratch tool).

Times, at bench shapes (N=1M, slots≈5M/4.25M, cap 2.5-3M):
  * lax.sort u32 with 0/1/2/11 payloads at several sizes
  * post-sort row gathers: [cap,16] single vs [cap,8]+[cap,4] split
  * fold-shaped gather [n_slots,16]
All single-program timings with the dispatch floor subtracted.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gaussian_splatting_web_tpu.utils.metrics import (
    enable_compile_cache,
    time_fn,
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    enable_compile_cache()
    log(f"platform={jax.default_backend()}")
    floor = time_fn(jax.jit(lambda x: x + 1.0), jnp.float32(0.0),
                    iters=8, warmup=2)
    log(f"floor: {floor*1e3:.2f} ms")
    key = jax.random.PRNGKey(0)

    def t(fn, *args, iters=6):
        return (time_fn(fn, *args, iters=iters, warmup=2) - floor) * 1e3

    # --- sorts -----------------------------------------------------------
    for n_slots in (5_000_000, 4_250_000, 3_500_000):
        keys = jax.device_put(
            jax.random.randint(key, (n_slots,), 0, (1 << 31) - 1,
                               dtype=jnp.int32).astype(jnp.uint32))
        iota = jnp.arange(n_slots, dtype=jnp.int32)
        f32s = [jax.device_put(
            jax.random.normal(jax.random.PRNGKey(i), (n_slots,)))
            for i in range(9)]

        def consume(out):
            return sum(jnp.sum(x[::173].astype(jnp.float32)) * 1e-30
                       for x in out)

        f = jax.jit(lambda c, ks=keys: consume(
            jax.lax.sort((ks + c.astype(jnp.uint32),), num_keys=1)))
        log(f"sort[{n_slots}] 0pay: {t(f, jnp.uint32(0)):8.2f} ms")

        f = jax.jit(lambda c, ks=keys: consume(
            jax.lax.sort((ks + c.astype(jnp.uint32), iota), num_keys=1)))
        log(f"sort[{n_slots}] 1pay: {t(f, jnp.uint32(0)):8.2f} ms")

        f = jax.jit(lambda c, ks=keys: consume(
            jax.lax.sort((ks + c.astype(jnp.uint32), iota, iota),
                         num_keys=1)))
        log(f"sort[{n_slots}] 2pay: {t(f, jnp.uint32(0)):8.2f} ms")

        f = jax.jit(lambda c, ks=keys: consume(
            jax.lax.sort(
                (ks + c.astype(jnp.uint32), iota, iota) + tuple(f32s),
                num_keys=1)))
        log(f"sort[{n_slots}] 11pay: {t(f, jnp.uint32(0)):8.2f} ms")

    # --- gathers ---------------------------------------------------------
    n = 1_000_000
    for cap in (2_500_000, 3_000_000, 5_000_000):
        idx = jax.device_put(
            jax.random.randint(key, (cap,), 0, n, dtype=jnp.int32))
        src16 = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (n, 16),
                              dtype=jnp.float32))

        f = jax.jit(lambda c, s=src16, ix=idx: jnp.sum(
            (s + c)[ix]) * 1e-30)
        log(f"gather16[{cap}] from [{n},16]: {t(f, jnp.float32(0)):8.2f} ms")

        f = jax.jit(lambda c, s=src16, ix=idx: jnp.sum(
            (s[:, :8] + c)[ix]) * 1e-30
            + jnp.sum((s[:, :4] + c)[ix]) * 1e-30)
        log(f"gather8+4[{cap}]:          {t(f, jnp.float32(0)):8.2f} ms")

    # fold-shaped: big source (pair array), index = positions
    for n_slots in (5_000_000, 4_250_000, 3_500_000):
        m_pad = 3_100_000
        src = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(2), (m_pad, 16),
                              dtype=jnp.float32))
        pos = jax.device_put(
            jax.random.randint(key, (n_slots,), 0, m_pad, dtype=jnp.int32))
        f = jax.jit(lambda c, s=src, ix=pos: jnp.sum(
            (s + c)[ix]) * 1e-30)
        log(f"foldgather16[{n_slots}] from [{m_pad},16]: "
            f"{t(f, jnp.float32(0)):8.2f} ms")


if __name__ == "__main__":
    main()
