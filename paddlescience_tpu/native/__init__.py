"""Native (C++) runtime kernels, loaded via ctypes.

The TPU compute path is jax/XLA/pallas; host-side geometry preprocessing
(mesh ray casting, SDF evaluation — SURVEY.md §2.1 geometry row) is CPU
work the reference delegates to pymesh's C++ core. Here the equivalent
lives in ``mesh_kernels.cc`` (OpenMP), built by ``build.sh`` into
``libpsci_mesh.so``. Everything degrades gracefully: if the library is
missing or fails to load, callers use the numpy implementations.

Build (one-time, optional):
    paddlescience_tpu/native/build.sh
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

__all__ = ["mesh_lib", "ray_hits_z", "unsigned_distance", "available"]

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libpsci_mesh.so")


def _try_build() -> None:
    """Best-effort one-time build when a toolchain is present (CI/fresh
    clones); failures are silent — callers fall back to numpy."""
    import subprocess

    src = os.path.join(os.path.dirname(__file__), "mesh_kernels.cc")
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC", src,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        pass


def _load() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int64)
    lib.ray_hits_z.argtypes = [dp, ctypes.c_int64, dp, ctypes.c_int64, ip]
    lib.ray_hits_z.restype = None
    lib.unsigned_distance.argtypes = [dp, ctypes.c_int64, dp, ctypes.c_int64, dp]
    lib.unsigned_distance.restype = None
    return lib


mesh_lib = _load()


def available() -> bool:
    return mesh_lib is not None


def _as_c(arr: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(arr, dtype=np.float64)


def ray_hits_z(tri9: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """tri9: (F, 9) rotated triangle vertices; pts: (P, 3) rotated points.
    Returns per-point +z ray hit counts."""
    tri9 = _as_c(tri9)
    pts = _as_c(pts)
    out = np.empty(len(pts), np.int64)
    mesh_lib.ray_hits_z(
        tri9.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(tri9),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def unsigned_distance(tri9: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Exact min point-triangle distances: tri9 (F, 9), pts (P, 3) -> (P,)."""
    tri9 = _as_c(tri9)
    pts = _as_c(pts)
    out = np.empty(len(pts), np.float64)
    mesh_lib.unsigned_distance(
        tri9.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(tri9),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
