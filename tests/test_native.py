import os

import numpy as np
import pytest

from robustpointclouds_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


@pytest.fixture
def bin_file(tmp_path):
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform([0, -30, -2], [60, 30, 1], (5000, 3)), rng.rand(5000, 1)], 1
    ).astype(np.float32)
    path = tmp_path / "000000.bin"
    pts.tofile(path)
    return str(path), pts


def test_load_points(bin_file):
    path, pts = bin_file
    got = native.load_points(path)
    np.testing.assert_allclose(got, pts)


def test_prepare_batch_no_augment(bin_file):
    path, pts = bin_file
    pcr = [0, -40, -3, 70.4, 40, 1]
    boxes = np.zeros((2, 4, 7), np.float32)
    boxes[:, 0] = [10, 0, -1, 3.9, 1.6, 1.56, 0.2]
    out, mask, keep, counts = native.prepare_batch(
        [path, path], boxes, np.array([1, 1], np.int32), pcr,
        max_points=6000, seed=7, augment=False,
    )
    assert out.shape == (2, 6000, 4)
    assert counts[0] == 5000 and mask[0].sum() == 5000
    assert keep[0, 0]  # box center in range
    # all real points inside the range
    real = out[0][mask[0]]
    assert real[:, 0].min() >= 0 and real[:, 0].max() < 70.4
    # same seed, same path -> deterministic
    out2, mask2, _, _ = native.prepare_batch(
        [path, path], boxes.copy(), np.array([1, 1], np.int32), pcr,
        max_points=6000, seed=7, augment=False,
    )
    np.testing.assert_allclose(out, out2)


def test_prepare_batch_augment_transforms_boxes(bin_file):
    path, _ = bin_file
    pcr = [0, -40, -3, 70.4, 40, 1]
    boxes = np.zeros((1, 2, 7), np.float32)
    boxes[0, 0] = [10, 5, -1, 3.9, 1.6, 1.56, 0.2]
    before = boxes.copy()
    out, mask, keep, counts = native.prepare_batch(
        [path], boxes, np.array([1], np.int32), pcr,
        max_points=6000, seed=3, augment=True,
    )
    assert counts[0] > 0
    # augmentation must have moved the box (rot/scale/flip)
    assert not np.allclose(boxes[0, 0], before[0, 0])
    # box extents stay positive and finite
    assert np.all(boxes[0, 0, 3:6] > 0)


def test_subsample_cap(bin_file):
    path, _ = bin_file
    pcr = [0, -40, -3, 70.4, 40, 1]
    boxes = np.zeros((1, 1, 7), np.float32)
    out, mask, _, counts = native.prepare_batch(
        [path], boxes, np.array([0], np.int32), pcr,
        max_points=1000, seed=1, augment=False,
    )
    assert counts[0] == 1000 and mask[0].sum() == 1000


def test_missing_file_reports_error(tmp_path):
    pcr = [0, -40, -3, 70.4, 40, 1]
    boxes = np.zeros((1, 1, 7), np.float32)
    out, mask, _, counts = native.prepare_batch(
        [str(tmp_path / "nope.bin")], boxes, np.array([0], np.int32), pcr,
        max_points=100, seed=1,
    )
    assert counts[0] == -1 and mask[0].sum() == 0
