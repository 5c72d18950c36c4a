"""Synthetic KITTI-like scenes for tests, benchmarks and smoke training.

Generates ground boxes with plausible class-dependent sizes and point clusters
inside them plus background clutter — enough structure for the detection loss
to be meaningful (positive anchors exist) without any dataset on disk. The
reference has no equivalent (it requires the real KITTI pickles); this is part
of the rebuilt test strategy (SURVEY.md §4).
"""
from __future__ import annotations

import numpy as np

from .structures import PointCloudBatch

_CLASS_SIZES = np.array(
    [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]], np.float32
)
_CLASS_Z = np.array([-0.6, -0.6, -0.6], np.float32)


def synthetic_kitti_batch(
    rng: np.random.RandomState,
    batch_size: int = 2,
    num_points: int = 20000,
    max_gt: int = 20,
    num_objects: int = 8,
    num_classes: int = 3,
    point_range=(0.0, -40.0, -3.0, 70.4, 40.0, 1.0),
) -> PointCloudBatch:
    B, P, G = batch_size, num_points, max_gt
    lo = np.asarray(point_range[:3], np.float32)
    hi = np.asarray(point_range[3:], np.float32)

    points = np.zeros((B, P, 4), np.float32)
    gt_boxes = np.zeros((B, G, 7), np.float32)
    gt_labels = np.zeros((B, G), np.int32)
    gt_mask = np.zeros((B, G), bool)

    for b in range(B):
        n_obj = min(num_objects, G)
        labels = rng.randint(0, num_classes, n_obj)
        sizes = _CLASS_SIZES[labels] * rng.uniform(0.9, 1.1, (n_obj, 3)).astype(np.float32)
        centers = np.stack(
            [
                rng.uniform(lo[0] + 5, hi[0] - 5, n_obj),
                rng.uniform(lo[1] + 5, hi[1] - 5, n_obj),
                _CLASS_Z[labels] + rng.uniform(-0.1, 0.1, n_obj),
            ],
            axis=1,
        ).astype(np.float32)
        yaws = rng.uniform(-np.pi, np.pi, n_obj).astype(np.float32)
        gt_boxes[b, :n_obj, :3] = centers
        gt_boxes[b, :n_obj, 3:6] = sizes
        gt_boxes[b, :n_obj, 6] = yaws
        gt_labels[b, :n_obj] = labels
        gt_mask[b, :n_obj] = True

        # points: ~60% on objects, rest background "ground"
        n_fg = int(P * 0.6)
        per_obj = n_fg // n_obj
        idx = 0
        for i in range(n_obj):
            local = rng.uniform(-0.5, 0.5, (per_obj, 3)).astype(np.float32) * sizes[i]
            c, s = np.cos(yaws[i]), np.sin(yaws[i])
            world = local.copy()
            world[:, 0] = local[:, 0] * c - local[:, 1] * s
            world[:, 1] = local[:, 0] * s + local[:, 1] * c
            world += centers[i]
            points[b, idx : idx + per_obj, :3] = world
            idx += per_obj
        n_bg = P - idx
        bg = np.stack(
            [
                rng.uniform(lo[0], hi[0], n_bg),
                rng.uniform(lo[1], hi[1], n_bg),
                rng.normal(-1.7, 0.05, n_bg),  # ground plane
            ],
            axis=1,
        ).astype(np.float32)
        points[b, idx:, :3] = bg
        points[b, :, 3] = rng.rand(P).astype(np.float32)

    return PointCloudBatch(
        points=points,
        points_mask=np.ones((B, P), bool),
        gt_boxes=gt_boxes,
        gt_labels=gt_labels,
        gt_mask=gt_mask,
    )
