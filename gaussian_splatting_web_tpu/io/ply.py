"""Vectorized PLY reader/writer for 3D Gaussian splat checkpoints.

Replaces the reference's per-vertex scalar JS loop (src/ply.ts:272-354 — the
"seconds to a couple of minutes" hot loop called out in its loading popup)
with a single `np.frombuffer` over a structured dtype plus vectorized field
transforms; parsing is O(bytes) memcpy-speed. An optional C++ native path
(native/plyio) accelerates the strided interleave→SoA transpose for huge
scenes.

Semantics reproduced from the reference:
  * header decode: `element vertex N` + `property <type> <name>` table,
    binary little-endian body after `end_header\\n` (ply.ts:54-107).
  * float and uchar properties; uchar values are scaled by 1/255
    (ply.ts:116-125).
  * SH degree inferred from the number of `f_rest_*` properties:
    degree = sqrt(n_rest/3 + 1) - 1 (ply.ts:227-235).
  * SH coefficient read order: f_dc_{0..2} first, then
    f_rest_{rgb * n_coeffs_per_color + i} interleaved color-major
    (ply.ts:238-246) into an [N, K, 3] array.
  * rotation quaternions: PLY stores (w, x, y, z); the reference normalizes
    and swizzles to (x, y, z, w) (NormalizeSwizzleRotation, ply.ts:170-176)
    then flips the sign of the vector part (PackSmallest3Rotation with
    s = -1, ply.ts:202-213). That sign flip is the conjugate quaternion,
    which exactly cancels the transpose introduced by WGSL's column-major
    mat3x3 constructor in the shader (simple_render.ts:110-114); the two
    quirks compose to the *standard* rotation matrix of the normalized
    (x, y, z, w) quaternion. We therefore store the plain normalized
    (x, y, z, w) quaternion and use the standard rotation matrix — bit-for-
    bit the same covariance, no swizzle gymnastics.
  * NaN guard: non-finite quaternion components are zeroed (qq[i] ||= 0,
    ply.ts:293-296).
  * scales stay in log space (the reference exps on the CPU at load,
    ply.ts:333-335, LinearScale = |exp(s)|; we exp in-kernel instead so
    log-scale remains the differentiable parameter).
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from ..core.types import GaussianCloud

_PLY_TYPES: Dict[str, np.dtype] = {
    "float": np.dtype("<f4"),
    "float32": np.dtype("<f4"),
    "double": np.dtype("<f8"),
    "float64": np.dtype("<f8"),
    "uchar": np.dtype("<u1"),
    "uint8": np.dtype("<u1"),
    "char": np.dtype("<i1"),
    "int8": np.dtype("<i1"),
    "ushort": np.dtype("<u2"),
    "uint16": np.dtype("<u2"),
    "short": np.dtype("<i2"),
    "int16": np.dtype("<i2"),
    "uint": np.dtype("<u4"),
    "uint32": np.dtype("<u4"),
    "int": np.dtype("<i4"),
    "int32": np.dtype("<i4"),
}


@dataclasses.dataclass
class PlyHeader:
    vertex_count: int
    properties: List[Tuple[str, str]]  # (name, ply type)
    body_offset: int
    sh_degree: int
    n_sh_coeffs: int


def n_sh_coeffs(degree: int) -> int:
    """ref ply.ts:130-143."""
    try:
        return {0: 1, 1: 4, 2: 9, 3: 16}[degree]
    except KeyError:
        raise ValueError(f"Unsupported SH degree: {degree}")


def _parse_header(data: bytes) -> PlyHeader:
    end = data.find(b"end_header")
    if end < 0:
        raise ValueError("not a PLY file: no end_header")
    body_offset = data.find(b"\n", end) + 1
    header_text = data[:end].decode("ascii", errors="replace")
    lines = [ln.strip() for ln in header_text.split("\n")]

    if not lines or lines[0] != "ply":
        raise ValueError("not a PLY file: missing 'ply' magic")
    fmt = next((ln for ln in lines if ln.startswith("format")), "")
    if "binary_little_endian" not in fmt:
        raise ValueError(f"unsupported PLY format: {fmt!r} "
                         "(only binary_little_endian, like the reference)")

    vertex_count = 0
    properties: List[Tuple[str, str]] = []
    in_vertex_element = False
    for ln in lines:
        if ln.startswith("element"):
            m = re.match(r"element\s+(\w+)\s+(\d+)", ln)
            in_vertex_element = bool(m and m.group(1) == "vertex")
            if in_vertex_element:
                vertex_count = int(m.group(2))
        elif ln.startswith("property") and in_vertex_element:
            m = re.match(r"property\s+(\w+)\s+(\w+)", ln)
            if m:
                ptype, pname = m.group(1), m.group(2)
                if ptype == "list":
                    raise ValueError("list properties unsupported in vertex element")
                properties.append((pname, ptype))

    n_rest = sum(1 for name, _ in properties if name.startswith("f_rest_"))
    n_per_color = n_rest // 3
    degree_f = np.sqrt(n_per_color + 1) - 1  # ply.ts:234
    degree = int(round(degree_f))
    if n_sh_coeffs(degree) - 1 != n_per_color:
        raise ValueError(f"inconsistent f_rest count {n_rest}")

    return PlyHeader(
        vertex_count=vertex_count,
        properties=properties,
        body_offset=body_offset,
        sh_degree=degree,
        n_sh_coeffs=n_sh_coeffs(degree),
    )


def _structured_dtype(props: List[Tuple[str, str]]) -> np.dtype:
    return np.dtype([(name, _PLY_TYPES[ptype]) for name, ptype in props])


def _field(rec: np.ndarray, name: str, props: Dict[str, str]) -> np.ndarray:
    v = rec[name].astype(np.float32)
    if props[name] in ("uchar", "uint8"):
        v = v / 255.0  # ply.ts:122
    return v


def read_ply(
    path_or_bytes,
    progress: Optional[Callable[[int, int], None]] = None,
    use_native: Optional[bool] = None,
) -> GaussianCloud:
    """Read an INRIA-style Gaussian-splat PLY into a GaussianCloud (NumPy
    arrays; move to device with jax.device_put).

    Args:
      path_or_bytes: filesystem path, bytes, or file-like object.
      progress: optional callback(bytes_read, total_bytes) — the role of the
        reference's streaming progress bar (index.ts:55-84).
      use_native: force (True) / forbid (False) the C++ fast path; default
        auto-detects the built extension.
    """
    if isinstance(path_or_bytes, (str, os.PathLike)):
        total = os.path.getsize(path_or_bytes)
        with open(path_or_bytes, "rb") as f:
            if progress is None:
                data = f.read()
            else:
                chunks = []
                got = 0
                while True:
                    chunk = f.read(1 << 24)
                    if not chunk:
                        break
                    chunks.append(chunk)
                    got += len(chunk)
                    progress(got, total)
                data = b"".join(chunks)
    elif isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
        data = bytes(path_or_bytes)
    else:
        data = path_or_bytes.read()

    header = _parse_header(data)
    props = dict(header.properties)
    dtype = _structured_dtype(header.properties)
    n = header.vertex_count
    body = data[header.body_offset : header.body_offset + n * dtype.itemsize]
    if len(body) < n * dtype.itemsize:
        raise ValueError(
            f"PLY body truncated: need {n * dtype.itemsize} bytes, got {len(body)}"
        )

    fields = None
    if use_native is not False:
        try:
            from ..native import plyio  # C++ threaded unpack fast path

            fields = plyio.unpack_fields(body, header.properties, n)
        except Exception:
            if use_native:
                raise
    if fields is None:
        rec = np.frombuffer(body, dtype=dtype, count=n)
        fields = {name: _field(rec, name, props) for name, _ in header.properties}

    def col(name):
        return fields[name]

    xyz = np.stack([col(c) for c in ("x", "y", "z")], axis=1)
    log_scale = np.stack([col(f"scale_{i}") for i in range(3)], axis=1)

    # quaternion: PLY order (w,x,y,z) → (x,y,z,w); normalize; NaN→0.
    q_wxyz = np.stack([col(f"rot_{i}") for i in range(4)], axis=1)
    q = q_wxyz[:, [1, 2, 3, 0]]
    norm = np.linalg.norm(q, axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        q = q / norm
    q = np.nan_to_num(q, nan=0.0, posinf=0.0, neginf=0.0)  # ply.ts:293-296

    opacity_logit = col("opacity")

    # SH: f_dc then f_rest color-major interleave (ply.ts:238-246).
    k = header.n_sh_coeffs
    n_per_color = k - 1
    sh = np.empty((n, k, 3), dtype=np.float32)
    for rgb in range(3):
        sh[:, 0, rgb] = col(f"f_dc_{rgb}")
    for i in range(n_per_color):
        for rgb in range(3):
            sh[:, 1 + i, rgb] = col(f"f_rest_{rgb * n_per_color + i}")

    return GaussianCloud(
        xyz=xyz,
        log_scale=log_scale,
        quat=q,
        opacity_logit=opacity_logit,
        sh=sh,
    )


def write_ply(cloud: GaussianCloud, path_or_file) -> None:
    """Write a GaussianCloud as an INRIA-layout binary PLY, loadable by the
    reference viewer and the INRIA toolchain (the .ply *is* the checkpoint
    format — SURVEY.md §5 Checkpoint/resume).

    Quaternions are written back in PLY (w,x,y,z) order; scales in log space;
    zero normals (nx,ny,nz) are emitted for INRIA layout compatibility.
    """
    xyz = np.asarray(cloud.xyz, dtype=np.float32)
    log_scale = np.asarray(cloud.log_scale, dtype=np.float32)
    q = np.asarray(cloud.quat, dtype=np.float32)
    opacity = np.asarray(cloud.opacity_logit, dtype=np.float32)
    sh = np.asarray(cloud.sh, dtype=np.float32)
    n, k, _ = sh.shape
    n_per_color = k - 1

    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(3 * n_per_color)]
    names += ["opacity"] + [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]

    rec = np.zeros(n, dtype=np.dtype([(nm, "<f4") for nm in names]))
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    for rgb in range(3):
        rec[f"f_dc_{rgb}"] = sh[:, 0, rgb]
    for i in range(n_per_color):
        for rgb in range(3):
            rec[f"f_rest_{rgb * n_per_color + i}"] = sh[:, 1 + i, rgb]
    rec["opacity"] = opacity
    for i in range(3):
        rec[f"scale_{i}"] = log_scale[:, i]
    # (x,y,z,w) → (w,x,y,z)
    q_wxyz = q[:, [3, 0, 1, 2]]
    for i in range(4):
        rec[f"rot_{i}"] = q_wxyz[:, i]

    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {nm}" for nm in names]
    header += ["end_header", ""]
    blob = "\n".join(header).encode("ascii") + rec.tobytes()

    if isinstance(path_or_file, (str, os.PathLike)):
        with open(path_or_file, "wb") as f:
            f.write(blob)
    else:
        path_or_file.write(blob)
