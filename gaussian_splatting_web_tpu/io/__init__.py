from .ply import read_ply, write_ply, PlyHeader
from .cameras import load_cameras_json, camera_from_json

__all__ = [
    "read_ply",
    "write_ply",
    "PlyHeader",
    "load_cameras_json",
    "camera_from_json",
]
