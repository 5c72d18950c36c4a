import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.ops.voxelize import VoxelizerConfig, voxelize, voxelize_batch

CFG = VoxelizerConfig(
    point_cloud_range=(0.0, -2.0, -1.0, 4.0, 2.0, 1.0),
    voxel_size=(1.0, 1.0, 1.0),
    max_points_per_voxel=3,
    max_voxels=8,
)


def test_grid_size():
    assert CFG.grid_size == (4, 4, 2)
    assert CFG.sparse_shape == (3, 4, 4)


def test_basic_grouping():
    pts = jnp.array(
        [
            [0.5, -1.5, -0.5, 1.0],  # voxel (z0, y0, x0)
            [0.6, -1.4, -0.4, 2.0],  # same voxel
            [3.5, 1.5, 0.5, 3.0],    # voxel (z1, y3, x3)
        ],
        jnp.float32,
    )
    mask = jnp.ones(3, bool)
    res = voxelize(pts, mask, CFG)
    assert int(res.voxel_mask.sum()) == 2
    counts = np.asarray(res.num_points)
    assert sorted(counts[counts > 0].tolist()) == [1, 2]
    # coords: first voxel by flat id is (0,0,0)
    coords = np.asarray(res.coords)
    assert coords[0].tolist() == [0, 0, 0]
    assert coords[1].tolist() == [1, 3, 3]
    # features of the 2-point voxel preserved
    v0 = np.asarray(res.voxels[0])
    assert set(v0[:, 3].tolist()) == {1.0, 2.0, 0.0}


def test_out_of_range_dropped():
    pts = jnp.array([[100.0, 0.0, 0.0, 1.0], [0.5, 0.5, 0.5, 1.0]], jnp.float32)
    res = voxelize(pts, jnp.ones(2, bool), CFG)
    assert int(res.voxel_mask.sum()) == 1


def test_mask_respected():
    pts = jnp.array([[0.5, 0.5, 0.5, 1.0], [0.5, 0.5, 0.5, 2.0]], jnp.float32)
    res = voxelize(pts, jnp.array([True, False]), CFG)
    assert int(res.num_points.sum()) == 1


def test_max_points_per_voxel_cap():
    pts = jnp.tile(jnp.array([[0.5, 0.5, 0.5, 1.0]], jnp.float32), (10, 1))
    res = voxelize(pts, jnp.ones(10, bool), CFG)
    assert int(res.num_points.max()) == CFG.max_points_per_voxel


def test_max_voxels_cap():
    # 10 distinct voxels along x/y but cap is 8
    xs = np.linspace(0.2, 3.8, 10)
    pts = jnp.array([[x, -1.5 + 0.4 * i, 0.5, 1.0] for i, x in enumerate(xs)], jnp.float32)
    res = voxelize(pts, jnp.ones(10, bool), CFG)
    assert int(res.voxel_mask.sum()) <= CFG.max_voxels


def test_coords_sorted_by_flat_id():
    rng = np.random.RandomState(0)
    pts = jnp.array(
        np.concatenate(
            [rng.uniform([0, -2, -1], [4, 2, 1], size=(50, 3)), rng.rand(50, 1)], axis=1
        ),
        jnp.float32,
    )
    res = voxelize(pts, jnp.ones(50, bool), CFG)
    coords = np.asarray(res.coords)
    mask = np.asarray(res.voxel_mask)
    nz, ny, nx = 2, 4, 4
    flat = coords[:, 0] * (ny * nx) + coords[:, 1] * nx + coords[:, 2]
    flat = flat[mask]
    assert np.all(np.diff(flat) > 0), "voxels must be sorted by flat id"


def test_batch_vmap():
    rng = np.random.RandomState(1)
    pts = jnp.array(
        np.concatenate(
            [rng.uniform([0, -2, -1], [4, 2, 1], size=(2, 30, 3)), rng.rand(2, 30, 1)], axis=2
        ),
        jnp.float32,
    )
    res = voxelize_batch(pts, jnp.ones((2, 30), bool), CFG)
    assert res.voxels.shape == (2, 8, 3, 4)
    assert res.coords.shape == (2, 8, 3)


def test_jit_compiles():
    fn = jax.jit(lambda p, m: voxelize(p, m, CFG))
    pts = jnp.ones((16, 4), jnp.float32) * 0.5
    res = fn(pts, jnp.ones(16, bool))
    assert int(res.voxel_mask.sum()) == 1


def test_gradients_flow_through_features():
    # d(sum of voxel features)/d(points) must be 1 for kept points
    pts = jnp.array([[0.5, 0.5, 0.5, 2.0], [1.5, 0.5, 0.5, 3.0]], jnp.float32)

    def f(p):
        res = voxelize(p, jnp.ones(2, bool), CFG)
        return jnp.sum(res.voxels[..., 3])

    g = jax.grad(f)(pts)
    np.testing.assert_allclose(np.asarray(g[:, 3]), [1.0, 1.0], atol=1e-6)
