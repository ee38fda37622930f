"""The trainable Gaussian scene model.

The reference is a forward-only viewer whose "model" is the immutable packed
PLY buffer (src/ply.ts:220-355). Here the model is a first-class trainable
pytree: raw parameters (positions, log-scales, quaternions, opacity logits,
SH coefficients) flow straight into the differentiable renderer, and the
PLY file doubles as the interchange/checkpoint format (SURVEY.md §5).

SH coefficients are split into `sh_dc` / `sh_rest` so training can use the
INRIA schedule (DC at full lr, rest at lr/20) and progressive SH-degree
unlocking without re-partitioning arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import GaussianCloud


@dataclasses.dataclass
class GaussianModel:
    """Trainable parameters. All leaves are arrays; the whole object is a
    pytree suitable for optax/jax.grad."""

    xyz: jax.Array            # [N, 3]
    log_scale: jax.Array      # [N, 3]
    quat: jax.Array           # [N, 4] (x, y, z, w), unnormalized ok
    opacity_logit: jax.Array  # [N]
    sh_dc: jax.Array          # [N, 1, 3]
    sh_rest: jax.Array        # [N, K-1, 3]

    @property
    def num_gaussians(self) -> int:
        return self.xyz.shape[0]

    @property
    def max_sh_degree(self) -> int:
        k = 1 + self.sh_rest.shape[1]
        return {1: 0, 4: 1, 9: 2, 16: 3}[k]

    def to_cloud(self, active_sh_degree: Optional[int] = None) -> GaussianCloud:
        """Assemble the renderer input. `active_sh_degree` truncates higher
        bands to zero (progressive SH training, INRIA `oneupSHdegree`)."""
        sh = jnp.concatenate([self.sh_dc, self.sh_rest], axis=1)
        if active_sh_degree is not None and active_sh_degree < self.max_sh_degree:
            k_active = {0: 1, 1: 4, 2: 9, 3: 16}[active_sh_degree]
            mask = (jnp.arange(sh.shape[1]) < k_active)[None, :, None]
            sh = sh * mask
        return GaussianCloud(
            xyz=self.xyz,
            log_scale=self.log_scale,
            quat=self.quat,
            opacity_logit=self.opacity_logit,
            sh=sh,
        )

    @classmethod
    def from_cloud(cls, cloud: GaussianCloud) -> "GaussianModel":
        sh = jnp.asarray(cloud.sh)
        return cls(
            xyz=jnp.asarray(cloud.xyz),
            log_scale=jnp.asarray(cloud.log_scale),
            quat=jnp.asarray(cloud.quat),
            opacity_logit=jnp.asarray(cloud.opacity_logit),
            sh_dc=sh[:, :1],
            sh_rest=sh[:, 1:],
        )

    @classmethod
    def from_points(
        cls,
        xyz: np.ndarray,
        rgb: Optional[np.ndarray] = None,
        sh_degree: int = 3,
        initial_opacity: float = 0.1,
    ) -> "GaussianModel":
        """Initialize from a point cloud (the INRIA from-SfM init recipe):
        isotropic scales from mean nearest-neighbor distance, identity
        rotations, inverse-sigmoid opacity, colors into the DC band."""
        xyz = np.asarray(xyz, dtype=np.float32)
        n = xyz.shape[0]
        k = {0: 1, 1: 4, 2: 9, 3: 16}[sh_degree]

        # mean distance to a few nearest neighbors (blocked O(N²) on host;
        # fine for init-time use)
        if n > 1:
            cap = min(n, 2048)
            sub = xyz[np.random.default_rng(0).choice(n, cap, replace=False)]
            d2 = ((xyz[:, None, :] - sub[None, :, :]) ** 2).sum(-1) if n * cap < 4e7 \
                else None
            if d2 is None:
                dist = np.full(n, 0.01, np.float32)
            else:
                d2[d2 == 0] = np.inf
                dist = np.sqrt(np.clip(np.partition(d2, 2, axis=1)[:, :3].mean(1),
                                       1e-7, None))
        else:
            dist = np.full(n, 0.1, np.float32)

        quat = np.zeros((n, 4), dtype=np.float32)
        quat[:, 3] = 1.0
        sh_dc = np.zeros((n, 1, 3), dtype=np.float32)
        if rgb is not None:
            # invert the SH DC mapping color = C0·dc + 0.5
            sh_dc[:, 0] = (np.asarray(rgb, np.float32) - 0.5) / 0.28209479177387814
        inv_sigmoid = float(np.log(initial_opacity / (1 - initial_opacity)))

        return cls(
            xyz=jnp.asarray(xyz),
            log_scale=jnp.log(jnp.asarray(dist))[:, None].repeat(3, axis=1),
            quat=jnp.asarray(quat),
            opacity_logit=jnp.full((n,), inv_sigmoid, jnp.float32),
            sh_dc=jnp.asarray(sh_dc),
            sh_rest=jnp.zeros((n, k - 1, 3), jnp.float32),
        )


jax.tree_util.register_dataclass(
    GaussianModel,
    data_fields=["xyz", "log_scale", "quat", "opacity_logit", "sh_dc", "sh_rest"],
    meta_fields=[],
)
