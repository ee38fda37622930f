"""Checkpoint / resume.

The reference's only "checkpoint" is the immutable .ply itself (SURVEY.md §5:
re-parse file = resume). Here both layers exist:

  * `save_ply` / `load_ply`: the canonical interchange format — exported
    scenes load in the reference viewer and the INRIA toolchain (io.ply).
  * orbax for full training state (params + optimizer + step), the
    TPU-native resume path.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from ..io.ply import read_ply, write_ply
from ..models.gaussian_model import GaussianModel
from .trainer import TrainState


def save_ply(state_or_model, path: str, active_sh_degree: Optional[int] = None):
    model = state_or_model.params if isinstance(state_or_model, TrainState) \
        else state_or_model
    write_ply(jax.device_get(model.to_cloud(active_sh_degree)), path)


def load_ply_model(path: str) -> GaussianModel:
    return GaussianModel.from_cloud(read_ply(path))


def _ckpt(path: str):
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer(), os.path.abspath(path)


def save_train_state(state: TrainState, path: str) -> None:
    ckptr, path = _ckpt(path)
    ckptr.save(path, jax.device_get(state), force=True)


def restore_train_state(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (built from the same model
    shape + optimizer)."""
    ckptr, path = _ckpt(path)
    restored = ckptr.restore(path, item=jax.device_get(template))
    return jax.tree_util.tree_map(lambda x: x, restored)
