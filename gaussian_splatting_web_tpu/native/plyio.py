"""ctypes bindings for native/plyio.cpp (threaded PLY record unpack).

Loads native/libplyio.so, building it on first use if g++ is available.
`unpack_fields` returns a dict of dense float32 columns — the same output
contract as the NumPy structured-dtype path in io.ply, but one threaded
pass over the record blob.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libplyio.so"))

_PROP_TYPE_CODE = {
    "float": 0, "float32": 0,
    "double": 1, "float64": 1,
    "uchar": 2, "uint8": 2,
    "char": 3, "int8": 3,
    "ushort": 4, "uint16": 4,
    "short": 5, "int16": 5,
    "uint": 6, "uint32": 6,
    "int": 7, "int32": 7,
}
_PROP_SIZE = {0: 4, 1: 8, 2: 1, 3: 1, 4: 2, 5: 2, 6: 4, 7: 4}

_lock = threading.Lock()
_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ply_unpack.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.ply_unpack.restype = None
        _lib = lib
        return lib


def unpack_fields(
    body: bytes, properties: List[Tuple[str, str]], n: int
) -> Dict[str, np.ndarray]:
    """Decode n interleaved vertex records into {name: float32[n]} columns."""
    lib = _load()
    names = [p[0] for p in properties]
    codes = np.asarray([_PROP_TYPE_CODE[p[1]] for p in properties], np.int32)
    sizes = np.asarray([_PROP_SIZE[c] for c in codes], np.int64)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    stride = int(sizes.sum())

    buf = np.frombuffer(body, dtype=np.uint8, count=n * stride)
    out = np.empty((len(names), n), dtype=np.float32)
    nthreads = min(os.cpu_count() or 1, 8)
    lib.ply_unpack(
        buf.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n),
        ctypes.c_int64(stride),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(len(names)),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int32(nthreads),
    )
    return {name: out[i] for i, name in enumerate(names)}
