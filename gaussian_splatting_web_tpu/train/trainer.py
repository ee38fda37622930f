"""Single-chip training: optimizer, train state, jitted train step.

New capability over the forward-only reference. Optimizer follows the INRIA
recipe: per-parameter-group Adam learning rates (positions get an
exponentially decayed lr scaled by the scene extent; SH rest at lr/20),
realized with optax.multi_transform over the GaussianModel pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import RenderConfig
from ..core.types import CameraParams
from ..models.gaussian_model import GaussianModel
from ..ops.rasterize import render_impl
from .loss import photometric_loss


@dataclasses.dataclass
class TrainState:
    params: GaussianModel
    opt_state: optax.OptState
    step: jax.Array


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)


def make_optimizer(
    scene_extent: float = 1.0,
    position_lr: float = 1.6e-4,
    position_lr_final: float = 1.6e-6,
    position_lr_max_steps: int = 30_000,
    sh_dc_lr: float = 2.5e-3,
    sh_rest_lr_div: float = 20.0,
    opacity_lr: float = 0.05,
    scale_lr: float = 5e-3,
    quat_lr: float = 1e-3,
) -> optax.GradientTransformation:
    """INRIA per-group Adam."""
    position_sched = optax.exponential_decay(
        init_value=position_lr * scene_extent,
        transition_steps=position_lr_max_steps,
        decay_rate=position_lr_final / position_lr,
        end_value=position_lr_final * scene_extent,
    )

    def adam(lr):
        return optax.adam(lr, eps=1e-15)

    labels = GaussianModel(
        xyz="xyz", log_scale="scale", quat="quat",
        opacity_logit="opacity", sh_dc="sh_dc", sh_rest="sh_rest",
    )
    return optax.multi_transform(
        {
            "xyz": adam(position_sched),
            "scale": adam(scale_lr),
            "quat": adam(quat_lr),
            "opacity": adam(opacity_lr),
            "sh_dc": adam(sh_dc_lr),
            "sh_rest": adam(sh_dc_lr / sh_rest_lr_div),
        },
        labels,
    )


def make_train_step(
    optimizer: optax.GradientTransformation,
    width: int,
    height: int,
    config: RenderConfig = RenderConfig(),
    lambda_dssim: float = 0.2,
    active_sh_degree: Optional[int] = None,
) -> Callable[[TrainState, CameraParams, jnp.ndarray], Tuple[TrainState, jnp.ndarray]]:
    """Build a jitted (state, camera, target[H,W,3]) → (state, loss) step."""

    def loss_fn(params: GaussianModel, camera: CameraParams, target):
        img, _ = render_impl(
            params.to_cloud(active_sh_degree), camera, width, height, config
        )
        return photometric_loss(img, target, lambda_dssim)

    @jax.jit
    def step(state: TrainState, camera: CameraParams, target):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, camera, target)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return step


def init_train_state(model: GaussianModel, optimizer) -> TrainState:
    return TrainState(
        params=model,
        opt_state=optimizer.init(model),
        step=jnp.zeros((), jnp.int32),
    )
