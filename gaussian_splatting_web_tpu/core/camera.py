"""Camera math as pure functions (NumPy; small 4x4 host-side work).

Re-implements the reference's camera model (src/camera.ts) with the same
conventions:

  * INRIA-style projection matrix (camera.ts:19-42): symmetric frustum,
    +z forward, depth mapped to [0, 1], row 3 = [0, 0, 1, 0].
  * wgpu-style perspective (camera.ts:106: mat4.perspective) used by the
    default orbit camera: -z forward (z_sign = -1).
  * look-at view matrix (camera.ts:114).
  * cameras.json loading convention (camera.ts:467-503): JSON `rotation` is
    the camera-to-world rotation (row-major 3x3), `position` the camera
    center; the world-to-camera matrix is view = [Rᵀ | -Rᵀ t].

All functions return float32 NumPy arrays; `make_camera` assembles the
CameraParams pytree consumed by the renderer.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

from .types import CameraParams

DEFAULT_FOV = 1.04719755  # 60 degrees (camera.ts:4)


def projection_inria(znear: float, zfar: float, fov_x: float, fov_y: float) -> np.ndarray:
    """INRIA-convention projection matrix (ref camera.ts:19-42).

    +z is the viewing direction; NDC z in [0,1]; w' = z.
    """
    tan_half_fov_y = math.tan(fov_y / 2)
    tan_half_fov_x = math.tan(fov_x / 2)
    top = tan_half_fov_y * znear
    right = tan_half_fov_x * znear

    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def perspective_wgpu(fov_y: float, aspect: float, znear: float, zfar: float) -> np.ndarray:
    """wgpu-matrix `mat4.perspective` equivalent (used by the orbit camera,
    ref camera.ts:106,245): -z forward, NDC z in [0,1]."""
    f = 1.0 / math.tan(fov_y / 2)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = f / aspect
    P[1, 1] = f
    P[2, 2] = zfar / (znear - zfar)
    P[2, 3] = zfar * znear / (znear - zfar)
    P[3, 2] = -1.0
    return P


def look_at(eye: Sequence[float], center: Sequence[float], up: Sequence[float]) -> np.ndarray:
    """Right-handed look-at view matrix, -z forward (wgpu-matrix `mat4.lookAt`
    equivalent; ref camera.ts:114)."""
    eye = np.asarray(eye, dtype=np.float64)
    center = np.asarray(center, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)

    z = eye - center
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)

    view = np.eye(4, dtype=np.float64)
    view[0, :3] = x
    view[1, :3] = y
    view[2, :3] = z
    view[:3, 3] = -view[:3, :3] @ eye
    return view.astype(np.float32)


def focal2fov(focal: float, pixels: float) -> float:
    """ref camera.ts:463-465."""
    return 2 * math.atan(pixels / (2 * focal))


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def world_to_cam_from_rt(R_c2w: np.ndarray, cam_center: Sequence[float]) -> np.ndarray:
    """World→camera matrix from a cameras.json entry (ref camera.ts:467-473).

    The JSON stores the camera-to-world rotation (row-major) and the camera
    center; wgpu-matrix's column-major `mat3.create(...flat row-major...)`
    implicitly transposes it, so the math applied by the reference is
    view(p) = Rᵀ (p - t).
    """
    R_c2w = np.asarray(R_c2w, dtype=np.float64).reshape(3, 3)
    t = np.asarray(cam_center, dtype=np.float64)
    view = np.eye(4, dtype=np.float64)
    view[:3, :3] = R_c2w.T
    view[:3, 3] = -R_c2w.T @ t
    return view.astype(np.float32)


def camera_position_from_view(view: np.ndarray) -> np.ndarray:
    """Camera center in world space = translation of the inverse view matrix
    (ref camera.ts:135-138)."""
    R = view[:3, :3]
    t = view[:3, 3]
    return (-R.T @ t).astype(np.float32)


def make_camera(
    view: np.ndarray,
    proj: np.ndarray,
    width: int,
    height: int,
    focal_x: float | None = None,
    focal_y: float | None = None,
    scale_modifier: float = 1.0,
) -> CameraParams:
    """Assemble CameraParams. Focals default to what the projection implies.

    tanHalfFov is derived from the projection diagonal exactly like the
    shader does (simple_render.ts:262-263): tan = 1 / P[0][0] etc.
    """
    view = np.asarray(view, dtype=np.float32)
    proj = np.asarray(proj, dtype=np.float32)
    tan_x = 1.0 / abs(float(proj[0, 0]))
    tan_y = 1.0 / abs(float(proj[1, 1]))
    if focal_x is None:
        focal_x = width / (2 * tan_x)  # simple_render.ts:273
    if focal_y is None:
        focal_y = height / (2 * tan_y)
    return CameraParams(
        view=view,
        proj=proj,
        cam_pos=camera_position_from_view(view),
        focal=np.array([focal_x, focal_y], dtype=np.float32),
        tan_half_fov=np.array([tan_x, tan_y], dtype=np.float32),
        scale_modifier=np.float32(scale_modifier),
    )


GL_TO_COLMAP = np.diag(np.array([1.0, -1.0, -1.0, 1.0], dtype=np.float32))


def gl_to_colmap_view(view_gl: np.ndarray) -> np.ndarray:
    """Convert a -z-forward/y-up (GL/wgpu) view matrix to the +z-forward/y-down
    (COLMAP/INRIA) convention the renderer canonicalizes on.

    The renderer assumes INRIA projection semantics throughout (clip.w = +z);
    the reference instead mixes both conventions (wgpu perspective for the
    orbit camera at camera.ts:106, INRIA projection for cam.json presets at
    camera.ts:484) and leans on WebGPU blending order, which inverts the
    compositing order for the orbit camera (see ops.projection docstring).
    """
    return (GL_TO_COLMAP @ np.asarray(view_gl, dtype=np.float32)).astype(np.float32)


def default_camera(
    width: int,
    height: int,
    eye=(0, -5, 3),
    center=(0, 0, 0),
    fov_y: float = DEFAULT_FOV,
    znear: float = 0.03,
    zfar: float = 1000.0,
    up=(0, 1, 0),
) -> CameraParams:
    """The reference's default orbit camera (camera.ts:101-111): look-at from
    `eye` with a 60° perspective — canonicalized to the INRIA convention.
    `up` supports camera roll (the u/o keys, camera.ts:398-424)."""
    aspect = width / height
    fov_x = 2 * math.atan(math.tan(fov_y / 2) * aspect)
    view = gl_to_colmap_view(look_at(eye, center, up))
    proj = projection_inria(znear, zfar, fov_x, fov_y)
    return make_camera(view, proj, width, height)
