"""ctypes bindings for the native C++ data pipeline (csrc/pointcloud.cpp).

Builds the shared library on first use (g++ -O3 -shared) into
<repo>/build/; callers fall back to the numpy pipeline when no compiler is
available (`native_available()`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "pointcloud.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")
_SO = os.path.join(_BUILD_DIR, "libpointcloud.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
               _SRC, "-o", _SO]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            _build_failed = True
            return None
    lib = ctypes.CDLL(_SO)
    lib.rpc_load_points.restype = ctypes.c_int
    lib.rpc_prepare_sample.restype = ctypes.c_int
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None and not _build_failed:
            _lib = _build()
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def load_points(path: str, max_points: int = 200000, stride: int = 4) -> np.ndarray:
    """Native velodyne .bin reader."""
    lib = get_lib()
    out = np.empty((max_points, stride), np.float32)
    n = lib.rpc_load_points(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_points, stride,
    )
    if n < 0:
        raise IOError(f"cannot read {path}")
    return out[:n]


def load_sweeps(
    paths: Sequence[str],
    rts: Sequence[Optional[np.ndarray]],
    lags: Sequence[float],
    max_points: int = 40000,
    stride: int = 5,
    ts_ch: int = 4,
) -> list:
    """Threaded native multi-sweep load (NuScenes LoadPointsFromMultiSweeps).

    rts[s]: [3, 4] row-major [R|T] sensor->keyframe transform or None.
    Returns a list of [n_s, stride] arrays (sweeps with IO errors dropped).
    """
    lib = get_lib()
    S = len(paths)
    out = np.zeros((S, max_points, stride), np.float32)
    counts = np.zeros(S, np.int32)
    rt_arr = np.zeros((S, 12), np.float32)
    rt_valid = np.zeros(S, np.uint8)
    for s, rt in enumerate(rts):
        if rt is not None:
            rt_arr[s] = np.asarray(rt, np.float32).reshape(12)
            rt_valid[s] = 1
    lag_arr = np.asarray(lags, np.float32)
    path_bufs = [p.encode() for p in paths]
    path_arr = (ctypes.c_char_p * S)(*path_bufs)
    lib.rpc_load_sweeps(
        path_arr, S, stride,
        rt_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rt_valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lag_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ts_ch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_points,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return [out[s, : counts[s]] for s in range(S) if counts[s] >= 0]


def prepare_batch(
    paths: Sequence[str],
    boxes: np.ndarray,        # [B, G, 7] float32 (mutated in place: augmented)
    n_boxes: np.ndarray,      # [B] int32
    pcr: Sequence[float],
    max_points: int,
    seed: int,
    augment: bool = True,
    stride: int = 4,
    rot_range: float = 0.78539816,
    scale_range: Tuple[float, float] = (0.95, 1.05),
    scratch_cap: int = 200000,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Threaded native batch prep.

    Returns (points [B, P, stride], mask [B, P], box_keep [B, G], counts [B]).
    """
    lib = get_lib()
    B = len(paths)
    G = boxes.shape[1]
    boxes = np.ascontiguousarray(boxes, np.float32)
    out_points = np.zeros((B, max_points, stride), np.float32)
    out_mask = np.zeros((B, max_points), np.uint8)
    box_keep = np.zeros((B, G), np.uint8)
    counts = np.zeros(B, np.int32)
    pcr_arr = np.asarray(pcr, np.float32)
    n_boxes = np.ascontiguousarray(n_boxes, np.int32)

    path_bufs = [p.encode() for p in paths]
    path_arr = (ctypes.c_char_p * B)(*path_bufs)

    lib.rpc_prepare_batch(
        path_arr, B, stride,
        pcr_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_uint(seed & 0xFFFFFFFF), int(augment),
        ctypes.c_float(rot_range),
        ctypes.c_float(scale_range[0]), ctypes.c_float(scale_range[1]),
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), G,
        box_keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_points,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        scratch_cap,
    )
    return out_points, out_mask.astype(bool), box_keep.astype(bool), counts
