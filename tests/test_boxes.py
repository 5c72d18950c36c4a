import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.ops import boxes as box_ops


def box(x, y, dx, dy, yaw):
    return jnp.array([[x, y, dx, dy, yaw]], dtype=jnp.float32)


class TestBevCorners:
    def test_axis_aligned(self):
        c = box_ops.box_bev_corners(box(0, 0, 2, 4, 0.0))[0]
        np.testing.assert_allclose(
            np.sort(np.asarray(c), axis=0),
            np.sort(np.array([[1, 2], [-1, 2], [-1, -2], [1, -2]]), axis=0),
            atol=1e-6,
        )

    def test_rotation_90(self):
        c = box_ops.box_bev_corners(box(0, 0, 2, 4, np.pi / 2))[0]
        # rotating 90deg swaps extents
        assert np.asarray(jnp.max(jnp.abs(c[:, 0]))) == pytest.approx(2.0, abs=1e-5)
        assert np.asarray(jnp.max(jnp.abs(c[:, 1]))) == pytest.approx(1.0, abs=1e-5)


class TestRotatedIoU:
    def test_identical(self):
        b = box(1.0, 2.0, 3.0, 4.0, 0.3)
        iou = box_ops.rotated_bev_iou(b, b)
        assert np.asarray(iou)[0, 0] == pytest.approx(1.0, abs=1e-4)

    def test_disjoint(self):
        a = box(0, 0, 2, 2, 0.0)
        b = box(10, 10, 2, 2, 0.7)
        assert np.asarray(box_ops.rotated_bev_iou(a, b))[0, 0] == pytest.approx(0.0, abs=1e-6)

    def test_half_overlap_axis_aligned(self):
        a = box(0, 0, 2, 2, 0.0)
        b = box(1, 0, 2, 2, 0.0)  # intersection 1x2=2, union 4+4-2=6
        assert np.asarray(box_ops.rotated_bev_iou(a, b))[0, 0] == pytest.approx(1 / 3, abs=1e-4)

    def test_rotated_45_inside(self):
        # unit square vs same square rotated 45deg: intersection is a regular
        # octagon with area 2*(sqrt(2)-1) for unit squares
        a = box(0, 0, 1, 1, 0.0)
        b = box(0, 0, 1, 1, np.pi / 4)
        inter = 2 * (np.sqrt(2) - 1)
        expected = inter / (2 - inter)
        assert np.asarray(box_ops.rotated_bev_iou(a, b))[0, 0] == pytest.approx(expected, abs=1e-3)

    def test_containment(self):
        a = box(0, 0, 4, 4, 0.2)
        b = box(0, 0, 2, 2, 0.2)
        assert np.asarray(box_ops.rotated_bev_iou(a, b))[0, 0] == pytest.approx(4 / 16, abs=1e-3)

    def test_rotation_invariance(self):
        # IoU of a fixed pair must be invariant under joint rotation
        rng = np.random.RandomState(0)
        a = np.array([1.0, 2.0, 3.0, 1.5, 0.2], np.float32)
        b = np.array([2.0, 2.5, 2.0, 2.0, -0.4], np.float32)
        base = np.asarray(box_ops.rotated_bev_iou(jnp.array([a]), jnp.array([b])))[0, 0]
        for theta in rng.uniform(-np.pi, np.pi, size=5):
            c, s = np.cos(theta), np.sin(theta)
            rot = np.array([[c, -s], [s, c]], np.float32)

            def rotated(bx):
                out = bx.copy()
                out[:2] = rot @ bx[:2]
                out[4] = bx[4] + theta
                return out

            got = np.asarray(
                box_ops.rotated_bev_iou(jnp.array([rotated(a)]), jnp.array([rotated(b)]))
            )[0, 0]
            assert got == pytest.approx(base, abs=2e-3)

    def test_pairwise_shape(self):
        a = jnp.array(np.random.RandomState(1).randn(5, 5), jnp.float32)
        a = a.at[:, 2:4].set(jnp.abs(a[:, 2:4]) + 0.5)
        b = a[:3]
        iou = box_ops.rotated_bev_iou(a, b)
        assert iou.shape == (5, 3)
        np.testing.assert_allclose(np.diag(np.asarray(iou))[:3], 1.0, atol=1e-3)


class TestIoU3D:
    def test_identical(self):
        b = jnp.array([[0, 0, 0, 2, 3, 1.5, 0.3]], jnp.float32)
        assert np.asarray(box_ops.rotated_iou_3d(b, b))[0, 0] == pytest.approx(1.0, abs=1e-4)

    def test_z_disjoint(self):
        a = jnp.array([[0, 0, 0.0, 2, 2, 1.0, 0.0]], jnp.float32)
        b = jnp.array([[0, 0, 5.0, 2, 2, 1.0, 0.0]], jnp.float32)
        assert np.asarray(box_ops.rotated_iou_3d(a, b))[0, 0] == pytest.approx(0.0, abs=1e-6)

    def test_half_z(self):
        a = jnp.array([[0, 0, 0.0, 2, 2, 2.0, 0.0]], jnp.float32)
        b = jnp.array([[0, 0, 1.0, 2, 2, 2.0, 0.0]], jnp.float32)
        # bev identical (4), z overlap 1 of 2 -> inter 4, union 8+8-4=12
        assert np.asarray(box_ops.rotated_iou_3d(a, b))[0, 0] == pytest.approx(1 / 3, abs=1e-4)


class TestNearestBev:
    def test_snap_swaps_extents(self):
        b = jnp.array([[0, 0, 0, 4, 2, 1, np.pi / 2]], jnp.float32)
        ab = np.asarray(box_ops.nearest_bev_boxes(b))[0]
        np.testing.assert_allclose(ab, [-1, -2, 1, 2], atol=1e-5)

    def test_no_swap_small_angle(self):
        b = jnp.array([[0, 0, 0, 4, 2, 1, 0.1]], jnp.float32)
        ab = np.asarray(box_ops.nearest_bev_boxes(b))[0]
        np.testing.assert_allclose(ab, [-2, -1, 2, 1], atol=1e-5)

    def test_iou(self):
        a = jnp.array([[0, 0, 0, 2, 2, 1, 0.0]], jnp.float32)
        b = jnp.array([[1, 0, 0, 2, 2, 1, 0.0]], jnp.float32)
        assert np.asarray(box_ops.nearest_bev_iou(a, b))[0, 0] == pytest.approx(1 / 3, abs=1e-5)


def test_limit_period():
    v = jnp.array([3.5, -3.5, 0.0, np.pi])
    out = np.asarray(box_ops.limit_period(v))
    assert np.all(out >= -np.pi / 2 - 1e-6) and np.all(out < np.pi / 2 + 1e-6)
