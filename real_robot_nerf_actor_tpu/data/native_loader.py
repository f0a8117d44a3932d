"""ctypes bindings for the native C++ PLY loader / prefetcher.

Builds real_robot_nerf_actor_tpu/native/ply_loader.cpp with g++ on first
use (cached as libply_loader.so next to the source); falls back to the
pure-Python reader (data/ply.py) if the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "ply_loader.cpp")
_SO = os.path.join(_NATIVE_DIR, "libply_loader.so")
_lock = threading.Lock()
_lib = None


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _SO], check=True, capture_output=True)
        return _SO
    except Exception:
        return None


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.ply_load.restype = ctypes.c_long
        lib.ply_load.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.POINTER(ctypes.c_float)]
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [ctypes.c_int, ctypes.c_long,
                                      ctypes.c_long]
        lib.loader_submit.restype = None
        lib.loader_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_double)]
        lib.loader_next.restype = ctypes.c_long
        lib.loader_next.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.POINTER(ctypes.c_uint8)]
        lib.loader_destroy.restype = None
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def read_ply_native(path: str, max_pts: int = 1 << 20
                    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Drop-in for data.ply.read_ply via the native parser."""
    lib = get_lib()
    if lib is None:
        from real_robot_nerf_actor_tpu.data.ply import read_ply
        return read_ply(path)
    xyz = np.empty((max_pts, 3), np.float32)
    rgb = np.empty((max_pts, 3), np.float32)
    n = lib.ply_load(path.encode(), max_pts,
                     xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if n < 0:
        raise IOError(f"native PLY parse failed: {path}")
    return xyz[:n].copy(), rgb[:n].copy()


class NativePrefetcher:
    """Asynchronous point-cloud loader: submit paths ahead, pop padded
    (points, colors, valid) batches in FIFO order off the training loop's
    critical path. Applies range filtering, cam2base transform, and the
    reference RGB normalization in native code."""

    def __init__(self, max_num_coords: int, n_workers: int = 2,
                 capacity: int = 8):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable (g++ missing?)")
        self._lib = lib
        self.max_pts = max_num_coords
        self._handle = lib.loader_create(n_workers, max_num_coords, capacity)

    def submit(self, path: str, cam2base: Optional[np.ndarray] = None):
        if cam2base is not None:
            tf = np.ascontiguousarray(cam2base, np.float64).reshape(16)
            ptr = tf.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        else:
            ptr = None
        self._lib.loader_submit(self._handle, path.encode(), ptr)

    def next(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        xyz = np.empty((self.max_pts, 3), np.float32)
        rgb = np.empty((self.max_pts, 3), np.float32)
        valid = np.empty((self.max_pts,), np.uint8)
        self._lib.loader_next(
            self._handle,
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return xyz, rgb, valid.astype(bool)

    def close(self):
        if self._handle is not None:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
