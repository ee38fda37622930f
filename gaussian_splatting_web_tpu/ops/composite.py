"""Post-process pass (ref: src/post_process_render.ts).

The reference runs a fullscreen pass that samples the offscreen rgba16float
framebuffer and shapes alpha before presenting (post_process_render.ts:63-76):
boost a' = saturate(a·1.5), then a' = a'^4 below the 0.99 knee (haze
suppression), with a vertical flip (:65) because WebGPU framebuffer rows are
y-down. Here it is a jitted element-wise op; the flip is optional since our
renderer already produces row-0-at-top images.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import RenderConfig


@partial(jax.jit, static_argnums=(2, 3))
def post_process(
    rgb: jnp.ndarray,
    alpha: jnp.ndarray,
    config: RenderConfig = RenderConfig(),
    flip_y: bool = False,
) -> jnp.ndarray:
    """Apply the reference's alpha shaping; returns [H, W, 4] rgba.

    rgb is premultiplied (the raster output), matching the reference's
    premultiplied-alpha canvas (renderer.ts:129-135).
    """
    a = jnp.clip(alpha * config.post_alpha_boost, 0.0, 1.0)
    a = jnp.where(a < config.post_alpha_knee, a**config.post_alpha_pow, a)
    out = jnp.concatenate([rgb, a[..., None]], axis=-1)
    if flip_y:
        out = out[::-1]
    return out


def to_uint8(img: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float image → uint8."""
    return jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8)
