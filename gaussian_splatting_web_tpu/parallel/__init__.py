from .mesh import make_mesh, MeshAxes
from .render_sharded import render_sharded
from .train_sharded import make_sharded_train_step

__all__ = ["make_mesh", "MeshAxes", "render_sharded", "make_sharded_train_step"]
