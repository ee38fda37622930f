from .gaussian_model import GaussianModel

__all__ = ["GaussianModel"]
