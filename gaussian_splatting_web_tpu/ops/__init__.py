from .sh import eval_sh
from .projection import project_gaussians, ProjectedSplats
from .sort import bin_splats, TileBins, depth_sort_indices
from .rasterize import rasterize_tiles, render, render_impl
from .composite import post_process

__all__ = [
    "eval_sh",
    "project_gaussians",
    "ProjectedSplats",
    "bin_splats",
    "TileBins",
    "depth_sort_indices",
    "rasterize_tiles",
    "render",
    "post_process",
]
