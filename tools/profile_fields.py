"""Why does the sorted-fields pad+stack cost ~38 ms at the bench scale?

Times variants of assembling 9 [cap] f32 arrays into the [8, M_pad] +
[4, M_pad] slab layout the compositor kernel DMAs from. Run on TPU.
Not library API.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gaussian_splatting_web_tpu.utils.metrics import (
    enable_compile_cache, time_fn_device,
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


CAP = 3_000_000
PAD = 1280


def main():
    enable_compile_cache()
    rng = np.random.default_rng(0)
    fs = jax.device_put(tuple(
        jnp.asarray(rng.normal(size=(CAP,)).astype(np.float32))
        for _ in range(9)
    ))

    def consume(f8, f4):
        # touch every row so nothing is DCE'd, but read only a few lanes
        return (jnp.sum(f8[:, ::4093]) + jnp.sum(f4[:, ::4093])) * 1e-30

    def v_stack(c):
        """Today's path: pad each, stack."""
        ps = [jnp.pad(f + c * 1e-30, (0, PAD)) for f in fs]
        f8 = jnp.stack(ps[:8], axis=0)
        z = jnp.zeros_like(ps[8])
        f4 = jnp.stack([ps[8], z, z, z], axis=0)
        return consume(f8, f4)

    def v_stack_aligned(c):
        """Pad total length to a multiple of 1024 sublane-tiles first."""
        total = -(-(CAP + PAD) // 1024) * 1024
        ps = [jnp.pad(f + c * 1e-30, (0, total - CAP)) for f in fs]
        f8 = jnp.stack(ps[:8], axis=0)
        z = jnp.zeros_like(ps[8])
        f4 = jnp.stack([ps[8], z, z, z], axis=0)
        return consume(f8, f4)

    def v_concat_reshape(c):
        """Concatenate along the flat axis, then reshape to [8, M]."""
        total = -(-(CAP + PAD) // 1024) * 1024
        ps = [jnp.pad(f + c * 1e-30, (0, total - CAP)) for f in fs]
        f8 = jnp.concatenate(ps[:8]).reshape(8, total)
        z = jnp.zeros_like(ps[8])
        f4 = jnp.concatenate([ps[8], z, z, z]).reshape(4, total)
        return consume(f8, f4)

    def v_dus(c):
        """dynamic_update_slice rows into a preallocated buffer."""
        total = -(-(CAP + PAD) // 1024) * 1024
        f8 = jnp.zeros((8, total), jnp.float32)
        for i in range(8):
            f8 = jax.lax.dynamic_update_slice(
                f8, (fs[i] + c * 1e-30)[None, :], (i, 0))
        f4 = jnp.zeros((4, total), jnp.float32)
        f4 = jax.lax.dynamic_update_slice(
            f4, (fs[8] + c * 1e-30)[None, :], (0, 0))
        return consume(f8, f4)

    def v_pad_only(c):
        ps = [jnp.pad(f + c * 1e-30, (0, PAD)) for f in fs]
        return sum(jnp.sum(p[::4093]) for p in ps) * 1e-30

    def v_touch(c):
        return sum(jnp.sum(f[::4093] + c * 1e-30) for f in fs) * 1e-30

    for name, f in (
        ("touch only", v_touch),
        ("pad only", v_pad_only),
        ("pad+stack (today)", v_stack),
        ("pad+stack aligned", v_stack_aligned),
        ("concat+reshape", v_concat_reshape),
        ("dyn_update_slice", v_dus),
    ):
        t = time_fn_device(f, iters=8)
        log(f"{name:22s} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
