"""Hard voxelization with static shapes: points -> padded voxels + coords + counts.

TPU-native replacement for the CUDA `Det3DDataPreprocessor` voxel layer
(reference configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-car.py:46-53:
max_num_points=5, point_cloud_range [0,-40,-3,70.4,40,1], voxel_size
[0.05,0.05,0.1], max_voxels (16000, 40000)).

Design: sort-based grouping. Points are keyed by their flat voxel id, sorted,
and segmented; all outputs are fixed-size with validity carried by
`num_points > 0`. Runs under jit on device — the voxelizer is part of the
compiled train step, not a host-side preprocessing stage, so there is no
host<->device transfer between augmentation and the encoder.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class VoxelizerConfig(NamedTuple):
    point_cloud_range: Tuple[float, float, float, float, float, float]
    voxel_size: Tuple[float, float, float]
    max_points_per_voxel: int
    max_voxels: int

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        """(nx, ny, nz) number of voxels per axis."""
        pcr = np.asarray(self.point_cloud_range, np.float64)
        vs = np.asarray(self.voxel_size, np.float64)
        g = np.round((pcr[3:] - pcr[:3]) / vs).astype(np.int64)
        return int(g[0]), int(g[1]), int(g[2])

    @property
    def sparse_shape(self) -> Tuple[int, int, int]:
        """(nz+1, ny, nx) — the middle-encoder grid (z padded by 1, matching
        the SECOND convention: sparse_shape [41, 1600, 1408] for KITTI)."""
        nx, ny, nz = self.grid_size
        return nz + 1, ny, nx


class VoxelizationResult(NamedTuple):
    voxels: jnp.ndarray      # [V, T, F] padded point features per voxel
    coords: jnp.ndarray      # [V, 3] (z, y, x) int32; -1 rows are padding
    num_points: jnp.ndarray  # [V] int32; 0 marks padding voxels
    voxel_mask: jnp.ndarray  # [V] bool
    point_mask: jnp.ndarray  # [V, T] bool per-slot validity
    # point <-> slot bijection over the surviving points (the compact-point
    # adversary consumes these: perturb [P] rows, gather deltas into slots —
    # ~75-96% of the padded [V, T] rows are padding at KITTI/pillar scale)
    slot_point: jnp.ndarray = None  # [V, T] int32 original point index; P = miss
    point_slot: jnp.ndarray = None  # [P] int32 flat slot v*T + t; V*T = dropped


def voxelize(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    cfg: VoxelizerConfig,
) -> VoxelizationResult:
    """Voxelize one padded point cloud.

    Args:
        points: [P, F] with xyz in the first 3 features.
        points_mask: [P] bool, False for padding rows.
        cfg: static voxelizer config.

    Returns:
        VoxelizationResult with static shapes [V, T, ...], V = cfg.max_voxels.
    """
    P, F = points.shape
    V, T = cfg.max_voxels, cfg.max_points_per_voxel
    nx, ny, nz = cfg.grid_size
    pcr = jnp.asarray(cfg.point_cloud_range, points.dtype)
    vs = jnp.asarray(cfg.voxel_size, points.dtype)

    ijk = jnp.floor((points[:, :3] - pcr[:3]) / vs).astype(jnp.int32)
    in_range = (
        (ijk[:, 0] >= 0) & (ijk[:, 0] < nx)
        & (ijk[:, 1] >= 0) & (ijk[:, 1] < ny)
        & (ijk[:, 2] >= 0) & (ijk[:, 2] < nz)
        & points_mask
    )
    # flat voxel id; invalid points get a sentinel that sorts last
    flat = ijk[:, 2] * (ny * nx) + ijk[:, 1] * nx + ijk[:, 0]
    SENTINEL = jnp.int32(nz * ny * nx)
    flat = jnp.where(in_range, flat, SENTINEL)

    order = jnp.argsort(flat)  # stable
    flat_s = flat[order]
    pts_s = points[order]
    valid_s = in_range[order]

    pos = jnp.arange(P, dtype=jnp.int32)
    is_new = jnp.concatenate(
        [jnp.array([True]), flat_s[1:] != flat_s[:-1]]
    ) & valid_s
    voxel_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # [P], per point
    # position of each point within its voxel: pos - position of voxel start
    start_pos = jax.lax.cummax(jnp.where(is_new, pos, jnp.int32(0)))
    slot = pos - start_pos

    keep = valid_s & (voxel_rank >= 0) & (voxel_rank < V) & (slot < T)
    scatter_v = jnp.where(keep, voxel_rank, V)  # out-of-bounds drop
    scatter_t = jnp.where(keep, slot, 0)

    voxels = jnp.zeros((V + 1, T, F), points.dtype).at[scatter_v, scatter_t].set(
        jnp.where(keep[:, None], pts_s, 0.0)
    )[:V]
    point_mask = jnp.zeros((V + 1, T), bool).at[scatter_v, scatter_t].set(keep)[:V]
    num_points = jnp.sum(point_mask, axis=1).astype(jnp.int32)

    # coords (z, y, x) from the voxel's flat id
    first_keep = keep & is_new
    flat_of_voxel = jnp.full((V + 1,), SENTINEL, jnp.int32).at[
        jnp.where(first_keep, voxel_rank, V)
    ].set(jnp.where(first_keep, flat_s, SENTINEL))[:V]
    voxel_mask = num_points > 0
    cz = flat_of_voxel // (ny * nx)
    cy = (flat_of_voxel % (ny * nx)) // nx
    cx = flat_of_voxel % nx
    coords = jnp.where(
        voxel_mask[:, None],
        jnp.stack([cz, cy, cx], axis=1),
        jnp.int32(-1),
    )
    # point <-> slot maps (order[s] = original index of sorted row s)
    slot_point = (
        jnp.full((V + 1, T), P, jnp.int32)
        .at[scatter_v, scatter_t]
        .set(jnp.where(keep, order.astype(jnp.int32), P))[:V]
    )
    point_slot = (
        jnp.full((P,), V * T, jnp.int32)
        .at[order]
        .set(jnp.where(keep, scatter_v * T + scatter_t, V * T).astype(jnp.int32))
    )
    return VoxelizationResult(voxels, coords, num_points, voxel_mask, point_mask,
                              slot_point, point_slot)


def voxelize_batch(
    points: jnp.ndarray, points_mask: jnp.ndarray, cfg: VoxelizerConfig
) -> VoxelizationResult:
    """Voxelize a batch [B, P, F] -> per-sample [B, V, ...] results (vmapped)."""
    return jax.vmap(voxelize, in_axes=(0, 0, None))(points, points_mask, cfg)
