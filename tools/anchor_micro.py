"""Microbench for the anchor-binning kernel's per-tile MERGE phase
(round-4 design): blocked int32 key compares → rank, one-hot build, and
the exact one-hot permute matmuls that depth-order a tile's candidate
union in VMEM.

The anchor rework replaces the 3.45M-slot 8-operand binning sort with a
1.25M-element sort + this in-kernel merge; whether it wins depends on
whether the merge phase costs ≲4 ms at bench scale (8160 tiles, C≈1024
loaded lanes, K≈512 ordered candidates). This measures exactly that
compute on the real TPU before the kernel is built.

Usage: python tools/anchor_micro.py [--tiles 8160] [--c-chunks 4]
       [--k-chunks 2] [--variant all|compare|onehot|full]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KCL = 256


def make_kernel(c_chunks, k_chunks, variant, f_rows=16):
    """Per grid step = one tile: DMA c_chunks slabs, rank, one-hot
    permute into K=k_chunks*KCL ordered lanes, consume."""
    C = c_chunks * KCL
    K = k_chunks * KCL

    def kernel(offs_ref, slab_hbm, out_ref, union_ref, ukey_ref,
               rank_ref, sem_ref):
        g = pl.program_id(0)

        # --- load: c_chunks aligned DMAs at pseudo-random offsets ------
        for j in range(c_chunks):
            off = pl.multiple_of(offs_ref[g * c_chunks + j], KCL)
            pltpu.make_async_copy(
                slab_hbm.at[:, pl.ds(off, KCL)],
                union_ref.at[:, pl.ds(j * KCL, KCL)],
                sem_ref.at[j],
            ).start()
        for j in range(c_chunks):
            pltpu.make_async_copy(
                slab_hbm.at[:, pl.ds(0, KCL)],
                union_ref.at[:, pl.ds(j * KCL, KCL)],
                sem_ref.at[j],
            ).wait()

        # unique int keys: (key<<12 | lane) from slab row 0.
        # Round-trip through a VMEM ref: lane-offset slices of computed
        # vectors carry layouts Mosaic cannot broadcast (vpad {*, off});
        # ref loads at static offsets are clean.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        ukey_ref[:, :] = (
            (union_ref[0:1, :].astype(jnp.int32) & 0xFFFF) << 12) | lane

        # --- rank: blocked compares + bf16 ones-matmul colsum ----------
        rank = jnp.zeros((1, C), jnp.float32)
        if variant in ("compare_vpu", "full_vpu"):
            cols = []
            for cj in range(c_chunks):
                kj = ukey_ref[0:1, cj * KCL:(cj + 1) * KCL]
                cols.append(kj.reshape(KCL, 1))
            parts = []
            for ci in range(c_chunks):
                ki = ukey_ref[0:1, ci * KCL:(ci + 1) * KCL]  # [1, KCL]
                acc = jnp.zeros((1, KCL), jnp.float32)
                for cj in range(c_chunks):
                    less = (cols[cj] < ki).astype(jnp.float32)
                    acc = acc + jnp.sum(less, axis=0, keepdims=True)
                parts.append(acc)
            rank_ref[:, :] = jnp.concatenate(parts, axis=1)  # [1, C]
        if variant in ("compare", "full"):
            ones_row = jnp.ones((8, KCL), jnp.bfloat16)
            cols = []
            for cj in range(c_chunks):
                kj = ukey_ref[0:1, cj * KCL:(cj + 1) * KCL]
                cols.append(kj.reshape(KCL, 1))
            parts = []
            for ci in range(c_chunks):
                ki = ukey_ref[0:1, ci * KCL:(ci + 1) * KCL]  # [1, KCL]
                acc = jnp.zeros((8, KCL), jnp.float32)
                for cj in range(c_chunks):
                    less = (cols[cj] < ki).astype(jnp.bfloat16)
                    # colsum on MXU: counts ≤ C are exact in f32
                    acc = acc + jnp.dot(ones_row, less,
                                        preferred_element_type=jnp.float32)
                parts.append(acc[0:1, :])
            rank_ref[:, :] = jnp.concatenate(parts, axis=1)  # [1, C]

        # --- one-hot permute: [F, C-block] @ [C-block, K-block] --------
        acc_out = jnp.zeros((f_rows, K), jnp.float32)
        if variant in ("onehot", "full", "full_vpu"):
            fields = jnp.concatenate(
                [jax.lax.bitcast_convert_type(union_ref[:, :], jnp.float32)]
                + [jax.lax.bitcast_convert_type(union_ref[:, :],
                                                jnp.float32) * 0.5]
                * ((f_rows // 8) - 1),
                axis=0,
            ).astype(jnp.bfloat16)                           # [F, C]
            kio = jax.lax.broadcasted_iota(jnp.int32, (1, KCL), 1)
            outs = []
            for oc in range(k_chunks):
                o = jnp.zeros((f_rows, KCL), jnp.float32)
                for ci in range(c_chunks):
                    rcol = rank_ref[0:1, ci * KCL:(ci + 1) * KCL].reshape(
                        KCL, 1).astype(jnp.int32)
                    oh = (rcol == (kio + oc * KCL)).astype(jnp.bfloat16)
                    o = o + jnp.dot(fields[:, ci * KCL:(ci + 1) * KCL], oh,
                                    preferred_element_type=jnp.float32)
                outs.append(o)
            acc_out = jnp.concatenate(outs, axis=1)          # [F, K]

        out_ref[0, :, :] = acc_out[:, :] + rank_ref[0, 0]


    return kernel, C, K


def run_variant(n_tiles, c_chunks, k_chunks, variant, m=2_000_000):
    kernel, C, K = make_kernel(c_chunks, k_chunks, variant)
    rng = np.random.default_rng(0)
    slab = jnp.asarray(rng.integers(0, 2**31, size=(8, m), dtype=np.int64)
                       .astype(np.uint32))
    offs = jnp.asarray(
        (rng.integers(0, (m - KCL) // KCL, size=(n_tiles * c_chunks,))
         * KCL).astype(np.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 16, K), lambda g, offs: (g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((8, C), jnp.uint32),
            pltpu.VMEM((1, C), jnp.int32),
            pltpu.VMEM((1, C), jnp.float32),
            pltpu.SemaphoreType.DMA((c_chunks,)),
        ],
    )
    fn = jax.jit(lambda offs, slab: pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 16, K), jnp.float32),
    )(offs, slab))

    from gaussian_splatting_web_tpu.utils.metrics import time_fn

    out = fn(offs, slab)
    jax.block_until_ready(out)
    t = time_fn(lambda: jnp.sum(fn(offs, slab)) * 1e-30, iters=8, warmup=2)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=8160)
    ap.add_argument("--c-chunks", type=int, default=4)
    ap.add_argument("--k-chunks", type=int, default=2)
    ap.add_argument("--variant", default="all")
    args = ap.parse_args()

    from gaussian_splatting_web_tpu.utils.metrics import enable_compile_cache

    enable_compile_cache()
    print(f"devices={jax.devices()}", file=sys.stderr)

    variants = (["none", "compare", "compare_vpu", "onehot", "full",
                 "full_vpu"]
                if args.variant == "all" else [args.variant])
    base = None
    for v in variants:
        t = run_variant(args.tiles, args.c_chunks, args.k_chunks, v)
        extra = ""
        if v == "none":
            base = t
        elif base is not None:
            extra = f"  (+{(t - base) * 1e3:.2f} ms over dma-only)"
        print(f"{v:8s} C={args.c_chunks * KCL} K={args.k_chunks * KCL} "
              f"tiles={args.tiles}: {t * 1e3:.2f} ms{extra}")


if __name__ == "__main__":
    main()
