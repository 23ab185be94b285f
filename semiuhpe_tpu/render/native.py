"""ctypes binding for the native rasterizer, built on demand with g++.

The reference ships a Cython bridge compiled via distutils
(/root/reference/Sim3DR/setup.py); here the kernel has a plain C ABI and a
~1s g++ build cached next to the source, so no build system or Python C
API is involved.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc",
                    "rasterizer.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "librasterizer.so")
_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.ver_normals.argtypes = [f32, i32, ctypes.c_int, ctypes.c_int, f32]
    lib.rasterize.argtypes = [u8, f32, i32, f32, f32, ctypes.c_int,
                              ctypes.c_int, ctypes.c_int, ctypes.c_int,
                              ctypes.c_float]
    lib.rasterize_depth.argtypes = [f32, i32, f32, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int]
    _lib = lib
    return lib


def _c(arr, dtype):
    return np.ascontiguousarray(arr, dtype=dtype)


def get_normal(vertices: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    """(nver, 3) unit vertex normals (area-weighted triangle accumulation)."""
    v = _c(vertices, np.float32)
    t = _c(triangles, np.int32)
    out = np.zeros_like(v)
    get_lib().ver_normals(v, t, len(v), len(t), out)
    return out


def rasterize(vertices: np.ndarray, triangles: np.ndarray, colors: np.ndarray,
              bg: np.ndarray, alpha: float = 1.0) -> np.ndarray:
    """Z-buffered render of colored vertices into a copy of ``bg`` (uint8)."""
    v = _c(vertices, np.float32)
    t = _c(triangles, np.int32)
    col = _c(colors, np.float32)
    img = np.ascontiguousarray(bg.copy(), dtype=np.uint8)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    depth = np.full((h, w), -1e8, np.float32)
    get_lib().rasterize(img, v, t, col, depth, len(t), h, w, c,
                        ctypes.c_float(alpha))
    return img


def rasterize_depth(vertices: np.ndarray, triangles: np.ndarray, h: int,
                    w: int) -> np.ndarray:
    v = _c(vertices, np.float32)
    t = _c(triangles, np.int32)
    depth = np.full((h, w), -1e8, np.float32)
    get_lib().rasterize_depth(v, t, depth, len(t), h, w)
    return depth
