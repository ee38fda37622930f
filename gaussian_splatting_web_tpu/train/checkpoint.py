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
    ckptr.save(path, _pad_empty(jax.device_get(state)), force=True)


def restore_train_state(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (built from the same model
    shape + optimizer)."""
    ckptr, path = _ckpt(path)
    template = jax.device_get(template)
    restored = ckptr.restore(path, item=_pad_empty(template))
    return _unpad_empty(template, restored)


def has_checkpoint(path: Optional[str]) -> bool:
    return bool(path) and os.path.isdir(path) and bool(os.listdir(path))


def _pad_empty(tree):
    """Orbax refuses zero-size arrays (e.g. sh_rest at SH degree 0);
    replace them with a 1-element placeholder for the save."""
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: np.zeros((1,), x.dtype)
        if getattr(x, "size", 1) == 0 else x, tree)


def _unpad_empty(template, restored):
    return jax.tree_util.tree_map(
        lambda t, r: t if getattr(t, "size", 1) == 0 else r,
        template, restored)


def save_loop_state(state, dstate, it: int, path: str) -> None:
    """Persist the FULL training-loop state (TrainState + DensifyState +
    iteration) — what checkpoint-restart (`parallel.multihost.
    run_with_restarts`, `cli train --restarts`) resumes from."""
    ckptr, path = _ckpt(path)
    ckptr.save(path, _pad_empty(jax.device_get(
        {"state": state, "dstate": dstate, "it": it})), force=True)


def restore_loop_state(path: str, state_template, dstate_template):
    """Inverse of save_loop_state → (state, dstate, it). Templates must be
    built from the same model capacity + optimizer."""
    ckptr, path = _ckpt(path)
    item = jax.device_get(
        {"state": state_template, "dstate": dstate_template, "it": 0})
    r = ckptr.restore(path, item=_pad_empty(item))
    r = _unpad_empty(item, r)
    return r["state"], r["dstate"], int(r["it"])
