"""ctypes binding + lazy build of the C++ rasterizer.

The shared library is compiled once per machine into this directory
(g++ -O3 -fopenmp); no pybind11 — plain C ABI. Falls back gracefully when no
compiler is available (`native_available()` -> False) so the numpy backend
can take over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from ..mesh import Mesh

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "rasterizer.cpp")
_LIB = os.path.join(_THIS_DIR, "librasterizer.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.aae_mesh_register.restype = ctypes.c_int
        lib.aae_mesh_register.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # vertices
            ctypes.POINTER(ctypes.c_double),  # normals
            ctypes.POINTER(ctypes.c_double),  # colors (nullable)
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),  # faces
            ctypes.c_int,
        ]
        lib.aae_render.restype = ctypes.c_int
        lib.aae_render.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),  # K
            ctypes.POINTER(ctypes.c_double),  # R
            ctypes.POINTER(ctypes.c_double),  # t
            ctypes.c_double, ctypes.c_double,  # near far
            ctypes.POINTER(ctypes.c_double),  # light_pos
            ctypes.c_double, ctypes.c_double, ctypes.c_double,  # phong
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),  # out px bbox (nullable)
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeRasterizer:
    """One registered mesh in the native backend."""

    def __init__(self, mesh: Mesh):
        lib = _load()
        if lib is None:
            raise RuntimeError("native rasterizer unavailable (no compiler?)")
        self._lib = lib
        v = np.ascontiguousarray(mesh.vertices, dtype=np.float64)
        n = np.ascontiguousarray(mesh.normals, dtype=np.float64)
        f = np.ascontiguousarray(mesh.faces, dtype=np.int32)
        if mesh.colors is not None:
            c = np.ascontiguousarray(mesh.colors, dtype=np.float64)
            c_ptr = _dptr(c)
        else:
            c = None
            c_ptr = None
        self._mesh_id = lib.aae_mesh_register(
            _dptr(v), _dptr(n), c_ptr, len(v),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        )

    def render(
        self,
        W: int,
        H: int,
        K: np.ndarray,
        R: np.ndarray,
        t: np.ndarray,
        near: float,
        far: float,
        light_pos: np.ndarray,
        ambient: float,
        diffuse: float,
        specular: float,
        return_px_bbox: bool = False,
    ):
        """(bgr, depth) or, with return_px_bbox, (bgr, depth, px_bbox) where
        px_bbox is [min_x, min_y, max_x, max_y] of depth>0 pixels (None when
        nothing is visible) — avoids a full-frame nonzero scan."""
        bgr = np.zeros((H, W, 3), dtype=np.uint8)
        depth = np.zeros((H, W), dtype=np.float32)
        px_bbox = np.empty(4, dtype=np.int32)
        K = np.ascontiguousarray(K, dtype=np.float64)
        R = np.ascontiguousarray(R, dtype=np.float64)
        t = np.ascontiguousarray(np.asarray(t).reshape(3), dtype=np.float64)
        lp = np.ascontiguousarray(np.asarray(light_pos).reshape(3), dtype=np.float64)
        rc = self._lib.aae_render(
            self._mesh_id, W, H, _dptr(K), _dptr(R), _dptr(t),
            float(near), float(far), _dptr(lp),
            float(ambient), float(diffuse), float(specular),
            bgr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            px_bbox.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise RuntimeError(f"native render failed (rc={rc})")
        if return_px_bbox:
            return bgr, depth, (None if px_bbox[2] < 0 else px_bbox)
        return bgr, depth
