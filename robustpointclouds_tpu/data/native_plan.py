"""ctypes binding for the native sparse-plan builder (csrc/plan.cpp).

The C++ builder is the fast path of models/voxelnet.sparse_plan_core: it
produces the SAME dict-of-arrays plan (bit-equal — tests/test_native_plan.py)
in ~20x less host time than the XLA-CPU jit on a single core, so one
prefetch thread hides the whole plan build behind the device step. The
anchor assignment (float IoU) stays on the jax CPU path; this module covers
the integer index machinery plus voxelization.

Falls back cleanly: `native_plan_available()` is False when no compiler is
present, and HostPlanBuilder then uses the jax builder.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "plan.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")
_SO = os.path.join(_BUILD_DIR, "libplan.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

# default SparseEncoder layout constants the C++ traversal is fixed to
# (asserted against the encoder statics by the caller)
_STAGE_FACTORS = (1.0, 1.0, 0.75, 0.5)
_OUT_FACTOR = 0.5


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        os.makedirs(_BUILD_DIR, exist_ok=True)
        have_so = os.path.isfile(_SO)
        have_src = os.path.isfile(_SRC)
        stale = (
            have_so and have_src
            and os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        )
        if (not have_so or stale) and have_src:
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
            subprocess.run(cmd, check=True, capture_output=True)
        elif not have_so:  # no prebuilt .so and no source to build it from
            _build_failed = True
            return None
        lib = ctypes.CDLL(_SO)
        lib.rpc_build_plan.restype = ctypes.c_int
        lib.rpc_build_pillar_plan.restype = ctypes.c_int
        return lib
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        # no compiler / unreadable paths: callers fall back to the jax builder
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None and not _build_failed:
            _lib = _build()
        return _lib


def native_plan_available() -> bool:
    return get_lib() is not None


def build_pillar_plan_native(points: np.ndarray, points_mask: np.ndarray,
                             voxelizer, num_features: int = 4) -> dict:
    """Native twin of models/pointpillars.build_pillar_plan.

    Requires a single-z pillar grid (nz == 1): per-sample voxel order then
    equals ascending 2D flat order, which the merge relies on.
    """
    lib = get_lib()
    assert lib is not None, "native plan builder unavailable"
    nx, ny, nz = voxelizer.grid_size
    assert nz == 1, "native pillar plan requires a single-z pillar grid"
    B, P = points.shape[:2]
    F = num_features
    V, T = voxelizer.max_voxels, voxelizer.max_points_per_voxel
    N = B * V
    pts = np.ascontiguousarray(points[..., :F], np.float32)
    msk = np.ascontiguousarray(points_mask, np.uint8)
    pcr = np.asarray(voxelizer.point_cloud_range, np.float32)
    vs = np.asarray(voxelizer.voxel_size, np.float32)
    a = {
        "voxels": np.empty((B, V, T, F), np.float32),
        "vox_coords": np.empty((B, V, 3), np.int32),
        "num_points": np.empty((B, V), np.int32),
        "voxel_mask": np.empty((B, V), bool),
        "point_mask": np.empty((B, V, T), bool),
        "order": np.empty((N,), np.int32),
        "grid_ids": np.empty((N,), np.int32),
        "grid_coords": np.empty((N, 3), np.int32),
        "grid_mask": np.empty((N,), bool),
        "dense": np.empty((B * ny * nx,), np.int32),
        "slot_point": np.empty((B, V, T), np.int32),
        "point_slot": np.empty((B, P), np.int32),
    }
    outs = (ctypes.c_void_p * len(a))(
        *[v.ctypes.data_as(ctypes.c_void_p).value for v in a.values()]
    )
    rc = lib.rpc_build_pillar_plan(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        msk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(B), ctypes.c_int64(P), ctypes.c_int64(F),
        pcr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(V), ctypes.c_int64(T),
        ctypes.c_int64(nx), ctypes.c_int64(ny), ctypes.c_int64(nz),
        outs,
    )
    assert rc == 0, f"rpc_build_pillar_plan failed: {rc}"
    return dict(a)


def build_plan_native(points: np.ndarray, points_mask: np.ndarray, voxelizer,
                      num_features: int) -> dict:
    """Native twin of models/voxelnet.sparse_plan_core (no "assign" group).

    Args:
        points: [B, P, F>=num_features] float32.
        points_mask: [B, P] bool.
        voxelizer: ops/voxelize.VoxelizerConfig.
        num_features: features per point fed to the encoder (4 KITTI,
            5 NuScenes).
    """
    lib = get_lib()
    assert lib is not None, "native plan builder unavailable"
    B, P = points.shape[:2]
    F = num_features
    nx_, ny_, nz_ = voxelizer.grid_size
    id_space = B * (nz_ + 1) * ny_ * nx_
    assert id_space < 2 ** 31, (
        f"merged flat id space {id_space} exceeds int32 (B={B} too large "
        "for this grid) — matches the jax builder's _strides_of assert"
    )
    V, T = voxelizer.max_voxels, voxelizer.max_points_per_voxel
    nx, ny, nz = voxelizer.grid_size
    N = B * V
    n1 = max(int(N * _STAGE_FACTORS[1]), 1)
    n2 = max(int(N * _STAGE_FACTORS[2]), 1)
    n3 = max(int(N * _STAGE_FACTORS[3]), 1)
    n4 = max(int(N * _OUT_FACTOR), 1)

    pts = np.ascontiguousarray(points[..., :F], np.float32)
    msk = np.ascontiguousarray(points_mask, np.uint8)
    pcr = np.asarray(voxelizer.point_cloud_range, np.float32)
    vs = np.asarray(voxelizer.voxel_size, np.float32)
    factors = np.asarray(
        [_STAGE_FACTORS[1], _STAGE_FACTORS[2], _STAGE_FACTORS[3], _OUT_FACTOR],
        np.float64,
    )

    a = {
        "voxels": np.empty((B, V, T, F), np.float32),
        "vox_coords": np.empty((B, V, 3), np.int32),
        "num_points": np.empty((B, V), np.int32),
        "voxel_mask": np.empty((B, V), bool),
        "point_mask": np.empty((B, V, T), bool),
        "order": np.empty((N,), np.int32),
        "grid_ids": np.empty((N,), np.int32),
        "grid_coords": np.empty((N, 4), np.int32),
        "grid_mask": np.empty((N,), bool),
        "rel0_rows": np.empty((N, 9), np.int32),
        "rel0_xv": np.empty((N, 3), bool),
        "d1_ids": np.empty((n1,), np.int32),
        "d1_coords": np.empty((n1, 4), np.int32),
        "d1_mask": np.empty((n1,), bool),
        "d1_inv": np.empty((N, 27), np.int32),
        "d1_rows": np.empty((n1, 9), np.int32),
        "d1_xv": np.empty((n1, 3), bool),
        "rel1_rows": np.empty((n1, 9), np.int32),
        "rel1_xv": np.empty((n1, 3), bool),
        "d2_ids": np.empty((n2,), np.int32),
        "d2_coords": np.empty((n2, 4), np.int32),
        "d2_mask": np.empty((n2,), bool),
        "d2_inv": np.empty((n1, 27), np.int32),
        "d2_rows": np.empty((n2, 9), np.int32),
        "d2_xv": np.empty((n2, 3), bool),
        "rel2_idx": np.empty((n2, 27), np.int32),
        "d3_ids": np.empty((n3,), np.int32),
        "d3_coords": np.empty((n3, 4), np.int32),
        "d3_mask": np.empty((n3,), bool),
        "d3_inv": np.empty((n2, 27), np.int32),
        "d3_idx": np.empty((n3, 27), np.int32),
        "rel3_idx": np.empty((n3, 27), np.int32),
        "o_ids": np.empty((n4,), np.int32),
        "o_coords": np.empty((n4, 4), np.int32),
        "o_mask": np.empty((n4,), bool),
        "o_inv": np.empty((n3, 3), np.int32),
        "o_idx": np.empty((n4, 3), np.int32),
        "slot_point": np.empty((B, V, T), np.int32),
        "point_slot": np.empty((B, P), np.int32),
    }
    order = list(a.keys())
    outs = (ctypes.c_void_p * len(order))(
        *[a[k].ctypes.data_as(ctypes.c_void_p).value for k in order]
    )
    rc = lib.rpc_build_plan(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        msk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(B), ctypes.c_int64(P), ctypes.c_int64(F),
        pcr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(V), ctypes.c_int64(T),
        ctypes.c_int64(nx), ctypes.c_int64(ny), ctypes.c_int64(nz),
        factors.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        outs,
    )
    assert rc == 0, f"rpc_build_plan failed: {rc}"

    return {
        "voxels": a["voxels"],
        "vox_coords": a["vox_coords"],
        "num_points": a["num_points"],
        "voxel_mask": a["voxel_mask"],
        "point_mask": a["point_mask"],
        "slot_point": a["slot_point"],
        "point_slot": a["point_slot"],
        "order": a["order"],
        "grid_ids": a["grid_ids"],
        "grid_coords": a["grid_coords"],
        "grid_mask": a["grid_mask"],
        "enc": {
            "rel0": {"rows": a["rel0_rows"], "xvalid": a["rel0_xv"]},
            "down1": {"ids": a["d1_ids"], "coords": a["d1_coords"],
                      "mask": a["d1_mask"], "inv": a["d1_inv"],
                      "rows": a["d1_rows"], "xvalid": a["d1_xv"]},
            "rel1": {"rows": a["rel1_rows"], "xvalid": a["rel1_xv"]},
            "down2": {"ids": a["d2_ids"], "coords": a["d2_coords"],
                      "mask": a["d2_mask"], "inv": a["d2_inv"],
                      "rows": a["d2_rows"], "xvalid": a["d2_xv"]},
            "rel2": {"idx": a["rel2_idx"]},
            "down3": {"ids": a["d3_ids"], "coords": a["d3_coords"],
                      "mask": a["d3_mask"], "inv": a["d3_inv"],
                      "idx": a["d3_idx"]},
            "rel3": {"idx": a["rel3_idx"]},
            "out": {"ids": a["o_ids"], "coords": a["o_coords"],
                    "mask": a["o_mask"], "inv": a["o_inv"],
                    "idx": a["o_idx"]},
        },
    }
