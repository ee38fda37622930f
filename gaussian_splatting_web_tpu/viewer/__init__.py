from .orbit import OrbitState, rotate, translate, zoom, update, to_camera

__all__ = ["OrbitState", "rotate", "translate", "zoom", "update", "to_camera"]
