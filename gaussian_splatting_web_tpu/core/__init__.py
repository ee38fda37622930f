from .types import GaussianCloud, CameraParams
from . import camera

__all__ = ["GaussianCloud", "CameraParams", "camera"]
