"""Native (C++) host data path: threaded PNG decode + .npy batch loading.

Compiled on first use with g++ (mirroring the reference's JIT CUDA-extension
fallback, dist_chamfer_3D.py:6-24); falls back cleanly to the pure-Python
loaders when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_LIB_PATH = os.path.join(_HERE, "libfenet_loader.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-lpng", "-lz", "-pthread", "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(
                _SRC
            ) > os.path.getmtime(_LIB_PATH):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.fenet_load_images.restype = ctypes.c_int
            lib.fenet_load_clouds.restype = ctypes.c_int
            assert lib.fenet_loader_version() == 1
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def _pack_paths(paths: List[str]) -> bytes:
    return b"".join(p.encode() + b"\0" for p in paths)


def load_images(paths: List[str], n_threads: int = 4) -> np.ndarray:
    """Decode + preprocess a batch of ShapeNet renders -> (N, 128, 128, 3)
    float32 (crop [4:-5, 4:-5], RGB, raw 0..255)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((len(paths), 128, 128, 3), np.float32)
    failures = lib.fenet_load_images(
        _pack_paths(paths), len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    if failures:
        raise IOError(f"native loader: {failures} image(s) failed to decode")
    return out


def load_clouds(paths: List[str], points: int, n_threads: int = 4) -> np.ndarray:
    """Load a batch of (points, 3) .npy clouds -> (N, points, 3) float32."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((len(paths), points, 3), np.float32)
    failures = lib.fenet_load_clouds(
        _pack_paths(paths), len(paths), points,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    if failures:
        raise IOError(f"native loader: {failures} cloud(s) failed to load")
    return out
