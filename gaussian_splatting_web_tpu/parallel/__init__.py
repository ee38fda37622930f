from .gaussian_sharded import (
    init_sharded_train_state,
    make_gaussian_sharded_train_step,
    render_gaussian_sharded,
    ring_all_gather,
    shard_model,
)
from .mesh import MeshAxes, make_mesh
from .multihost import initialize_multihost, run_with_restarts
from .render_sharded import render_sharded
from .train_sharded import make_sharded_train_step

__all__ = [
    "MeshAxes",
    "init_sharded_train_state",
    "initialize_multihost",
    "make_gaussian_sharded_train_step",
    "make_mesh",
    "make_sharded_train_step",
    "render_gaussian_sharded",
    "render_sharded",
    "ring_all_gather",
    "run_with_restarts",
    "shard_model",
]
