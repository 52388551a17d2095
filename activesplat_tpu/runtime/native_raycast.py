"""ctypes bridge to the native C++ raycaster (native/raycast.cpp).

Builds the shared library on first use with g++ (cached next to the source);
falls back to the numpy raycaster if the toolchain is unavailable. Semantics
are validated against BoxWorld.render in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir, os.pardir, "native")
)
_SRC = os.path.join(_NATIVE_DIR, "raycast.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libraycast.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-o",
                _LIB,
                _SRC,
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SRC):
        return None
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.raycast_rgbd.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),  # c2w
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,  # fx fy cx cy
        ctypes.c_int,
        ctypes.c_int,  # width height
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),  # size
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),  # obstacles
        ctypes.c_int,  # n_obstacles
        ctypes.c_double,
        ctypes.c_double,  # depth_min depth_max
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # rgb out
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # depth out
    ]
    lib.raycast_rgbd.restype = None
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def raycast(
    c2w: np.ndarray,
    intrinsics: np.ndarray,
    width: int,
    height: int,
    size,
    obstacles: np.ndarray,
    depth_min: float,
    depth_max: float,
) -> Tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    assert lib is not None, "native raycaster not available"
    rgb = np.empty((height, width, 3), np.float32)
    depth = np.empty((height, width), np.float32)
    obstacles = np.ascontiguousarray(
        np.asarray(obstacles, np.float64).reshape(-1, 6)
    )
    lib.raycast_rgbd(
        np.ascontiguousarray(c2w, np.float64).reshape(16),
        float(intrinsics[0, 0]),
        float(intrinsics[1, 1]),
        float(intrinsics[0, 2]),
        float(intrinsics[1, 2]),
        int(width),
        int(height),
        np.ascontiguousarray(size, np.float64),
        obstacles,
        len(obstacles),
        float(depth_min),
        float(depth_max),
        rgb,
        depth,
    )
    return rgb, depth
