"""ctypes bridge to the native host A* (`native/astar.cpp`).

Mirrors the reference's drop-in backend pattern
(`pathfinding/__init__.py:3-13`): import with graceful fallback — callers
check `available()` and fall back to the on-device field router.  The
shared library is compiled with g++ on first use and cached next to this
file (no pybind11 in the image; ctypes + C ABI instead).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..config import Config

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libastar.so")
_SRC = os.path.join(_HERE, "astar.cpp")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO], check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        lib.astar_grid.restype = ctypes.c_int
        lib.astar_grid.argtypes = (
            [ctypes.c_int] * 6 + [u8p] * 5 + [f32p]
            + [ctypes.c_int] * 3 + [ctypes.c_float] * 8
            + [ctypes.c_int, i32p, ctypes.c_int])
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def astar(cfg: Config, start_xy, goal_xy, occupancy, stop_map, is_road,
          road_type, allowed_dirs, density=None, soft_obstacles=False,
          ignore_flow=False, max_steps=0):
    """Plan one path.  Maps are [H, W] numpy arrays (u8/bool); returns a
    list of (x, y) from the first step to the goal (empty = no path)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native A* unavailable (g++ build failed)")
    H, W = occupancy.shape
    if density is None:
        density = np.zeros((H, W), np.float32)
    out = np.zeros((2 * H * W,), np.int32)
    n = lib.astar_grid(
        W, H, int(start_xy[0]), int(start_xy[1]),
        int(goal_xy[0]), int(goal_xy[1]),
        np.ascontiguousarray(occupancy, np.uint8),
        np.ascontiguousarray(stop_map, np.uint8),
        np.ascontiguousarray(is_road, np.uint8),
        np.ascontiguousarray(road_type, np.uint8),
        np.ascontiguousarray(allowed_dirs, np.uint8),
        np.ascontiguousarray(density, np.float32),
        int(soft_obstacles), int(ignore_flow), int(max_steps),
        float(cfg.VEHICLE_TURN_PENALTY
              if cfg.VEHICLE_TURN_PENALTY_ENABLED else 0.0),
        float(cfg.VEHICLE_ROAD_TYPES_PENALTY_R1
              if cfg.VEHICLE_ROAD_TYPES_PENALTIES_ENABLED else 0.0),
        float(cfg.VEHICLE_ROAD_TYPES_PENALTY_R2
              if cfg.VEHICLE_ROAD_TYPES_PENALTIES_ENABLED else 0.0),
        float(cfg.VEHICLE_ROAD_TYPES_PENALTY_R3
              if cfg.VEHICLE_ROAD_TYPES_PENALTIES_ENABLED else 0.0),
        float(cfg.VEHICLE_OBSTACLE_PENALTY_VEHICLE),
        float(cfg.VEHICLE_OBSTACLE_PENALTY_STOP),
        float(cfg.VEHICLE_CONTRAFLOW_PENALTY),
        float(cfg.VEHICLE_DYNAMIC_PENALTY_SCALE),
        int(cfg.VEHICLE_DYNAMIC_PENALTIES_ENABLED),
        out, H * W)
    if n <= 0:
        return []
    return [(int(out[2 * k]), int(out[2 * k + 1])) for k in range(n)]
