"""The C++ plan builder must match the jax builder BIT-FOR-BIT.

Every leaf of the plan is integer index machinery or a verbatim point copy,
so exact equality is the contract (float enters only in voxel binning, where
the C++ uses the same IEEE f32 ops XLA emits).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.data import synthetic_kitti_batch
from robustpointclouds_tpu.data.native_plan import (
    build_plan_native,
    native_plan_available,
)
from robustpointclouds_tpu.models.voxelnet import sparse_plan_core
from robustpointclouds_tpu.ops.voxelize import VoxelizerConfig

pytestmark = pytest.mark.skipif(
    not native_plan_available(), reason="no C++ toolchain"
)


def _compare(ref, got, path=""):
    assert sorted(ref.keys()) == sorted(got.keys()), (path, ref.keys(), got.keys())
    for k in ref:
        r, g = ref[k], got[k]
        p = f"{path}/{k}"
        if isinstance(r, dict):
            _compare(r, g, p)
            continue
        r = np.asarray(r)
        g = np.asarray(g)
        assert r.shape == g.shape, (p, r.shape, g.shape)
        assert r.dtype == g.dtype, (p, r.dtype, g.dtype)
        if not np.array_equal(r, g):
            bad = np.argwhere(r != g)
            raise AssertionError(
                f"{p}: {bad.shape[0]} mismatches, first at {bad[0]}: "
                f"ref={r[tuple(bad[0])]} got={g[tuple(bad[0])]}"
            )


def _run_case(vz, batch_size, num_points, seed, num_features=4):
    rng = np.random.RandomState(seed)
    pcr = vz.point_cloud_range
    b = synthetic_kitti_batch(
        rng, batch_size=batch_size, num_points=num_points, max_gt=8,
        num_objects=3, point_range=pcr,
    )
    ref = jax.jit(
        lambda p, m: sparse_plan_core(p, m, vz, num_features, num_features)
    )(jnp.asarray(b.points), jnp.asarray(b.points_mask))
    ref = jax.tree_util.tree_map(np.asarray, ref)
    got = build_plan_native(
        np.asarray(b.points), np.asarray(b.points_mask), vz, num_features
    )
    _compare(ref, got)


def test_tiny_grid_bitwise():
    vz = VoxelizerConfig(
        point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
        voxel_size=(0.5, 0.5, 0.125),
        max_points_per_voxel=3,
        max_voxels=512,
    )
    _run_case(vz, batch_size=2, num_points=512, seed=0)


def test_tiny_grid_bitwise_more_seeds():
    vz = VoxelizerConfig(
        point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
        voxel_size=(0.5, 0.5, 0.125),
        max_points_per_voxel=3,
        max_voxels=512,
    )
    for seed in (1, 2, 3):
        _run_case(vz, batch_size=3, num_points=700, seed=seed)


def test_voxel_truncation_bitwise():
    # tiny caps force voxel-count and points-per-voxel truncation paths
    vz = VoxelizerConfig(
        point_cloud_range=(0.0, -4.0, -3.0, 8.0, 4.0, 1.0),
        voxel_size=(0.5, 0.5, 0.25),
        max_points_per_voxel=2,
        max_voxels=64,
    )
    _run_case(vz, batch_size=2, num_points=2000, seed=4)


def test_downsample_cap_truncation_bitwise():
    # stage caps below the active-site count exercise the rank-truncation
    # ordering (spatial-order drop) in both builders identically
    vz = VoxelizerConfig(
        point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
        voxel_size=(0.25, 0.25, 0.125),
        max_points_per_voxel=2,
        max_voxels=128,  # far fewer than occupied 0.25 m cells
    )
    _run_case(vz, batch_size=2, num_points=4000, seed=5)


def test_five_feature_points_bitwise():
    # NuScenes-style 5-feature points (x, y, z, intensity, timestamp)
    vz = VoxelizerConfig(
        point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
        voxel_size=(0.5, 0.5, 0.125),
        max_points_per_voxel=3,
        max_voxels=256,
    )
    rng = np.random.RandomState(6)
    b = synthetic_kitti_batch(
        rng, batch_size=2, num_points=512, max_gt=8, num_objects=3,
        point_range=vz.point_cloud_range,
    )
    pts5 = np.concatenate(
        [np.asarray(b.points), rng.rand(*b.points.shape[:2], 1).astype(np.float32)],
        axis=2,
    )
    ref = jax.jit(lambda p, m: sparse_plan_core(p, m, vz, 5, 5))(
        jnp.asarray(pts5), jnp.asarray(b.points_mask)
    )
    ref = jax.tree_util.tree_map(np.asarray, ref)
    got = build_plan_native(pts5, np.asarray(b.points_mask), vz, 5)
    _compare(ref, got)


@pytest.mark.heavy
def test_full_kitti_grid_bitwise():
    """Real KITTI geometry ([41,1600,1408], 0.05 m voxels, 16k cap): the
    native and jax builders must agree bitwise at production scale too."""
    from robustpointclouds_tpu.models import VoxelNetConfig

    vz = VoxelNetConfig().voxelizer
    _run_case(vz, batch_size=2, num_points=20000, seed=7)


def test_large_id_space_bitwise():
    """Merged id space past the 2^30 pack cap (B=12 on the KITTI grid,
    tiny voxel caps so it stays fast): the jax builder rides the WIDE
    two-key rank sort and must still match the native builder bitwise —
    including the x-window layout choice (review finding: the gate used to
    fall back to dense idx here while the native builder kept xwin)."""
    vz = VoxelizerConfig(
        point_cloud_range=(0.0, -40.0, -3.0, 70.4, 40.0, 1.0),
        voxel_size=(0.05, 0.05, 0.1),
        max_points_per_voxel=2,
        max_voxels=96,
    )
    assert 12 * (vz.grid_size[2] + 1) * vz.grid_size[1] * vz.grid_size[0] > 2 ** 30
    _run_case(vz, batch_size=12, num_points=600, seed=8)
    # and the layout really is x-window form on the 16/32ch grids
    rng = np.random.RandomState(8)
    b = synthetic_kitti_batch(rng, batch_size=12, num_points=600, max_gt=8,
                              num_objects=3, point_range=vz.point_cloud_range)
    got = build_plan_native(np.asarray(b.points), np.asarray(b.points_mask), vz, 4)
    assert "rows" in got["enc"]["rel0"] and "rows" in got["enc"]["rel1"]


def test_pillar_plan_bitwise():
    """rpc_build_pillar_plan == models/pointpillars.build_pillar_plan."""
    from robustpointclouds_tpu.data.native_plan import build_pillar_plan_native
    from robustpointclouds_tpu.models import PointPillarsConfig
    from robustpointclouds_tpu.models.pointpillars import build_pillar_plan

    cfg = PointPillarsConfig(
        voxelizer=VoxelizerConfig(
            point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
            voxel_size=(0.5, 0.5, 4.0),
            max_points_per_voxel=8,
            max_voxels=128,
        ),
    )
    for seed in (0, 1):
        rng = np.random.RandomState(seed)
        b = synthetic_kitti_batch(
            rng, batch_size=3, num_points=700, max_gt=8, num_objects=3,
            point_range=cfg.voxelizer.point_cloud_range,
        )
        ref = jax.jit(lambda p, m: build_pillar_plan(p, m, cfg))(
            jnp.asarray(b.points), jnp.asarray(b.points_mask)
        )
        ref = jax.tree_util.tree_map(np.asarray, ref)
        got = build_pillar_plan_native(
            np.asarray(b.points), np.asarray(b.points_mask), cfg.voxelizer
        )
        _compare(ref, got)
