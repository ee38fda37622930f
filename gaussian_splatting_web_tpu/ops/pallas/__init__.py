"""Pallas TPU kernels for the rasterization hot path.

These kernels implement the same tile-compositing semantics as
ops.rasterize (the portable XLA path) with TPU-specific wins the XLA
program can't express:

  * per-tile early exit: stop streaming splat chunks once every pixel's
    transmittance is below threshold (the reference's blend unit cannot
    early-out; its fragment shader only `discard`s, simple_render.ts:191);
  * no [K, P] intermediates in HBM — splat slabs stream through VMEM;
  * forward stores only the per-pixel final transmittance + contributor
    count; the custom-VJP backward re-walks splats back-to-front
    (INRIA-style) instead of saving activations.
"""

from .raster import (
    rasterize_tiles_pallas,
    composite_tiles_pallas,
    rasterize_pallas,
)

__all__ = [
    "rasterize_tiles_pallas",
    "composite_tiles_pallas",
    "rasterize_pallas",
]
