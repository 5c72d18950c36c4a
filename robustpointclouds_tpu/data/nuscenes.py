"""NuScenes data: reader (info-pkl based) + synthetic scenes for tests/bench.

The reference consumes NuScenes through mmdet3d's info pickles and fixes the
path-duplication bugs of its storage backend at runtime
(train_nuscenes_adversarial.py:41-77 `fixed_local_get`). Here the reader takes
the standard `nuscenes_infos_*.pkl` directly (10 classes, 5D points with
timestamp, multi-sweep aggregation left to the info file's sweep list) and
normalizes paths itself — the equivalent of that patch, done once at load.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict

import numpy as np

from .structures import PointCloudBatch
from ..nn.center_head import NUSCENES_TASKS

NUSCENES_CLASSES = tuple(c for t in NUSCENES_TASKS for c in t)
_CLS_TO_ID = {c: i for i, c in enumerate(NUSCENES_CLASSES)}

_CLASS_SIZES = {
    "car": (4.6, 1.95, 1.7), "truck": (6.9, 2.5, 2.8),
    "construction_vehicle": (6.4, 2.7, 3.2), "bus": (11.0, 2.9, 3.5),
    "trailer": (12.3, 2.9, 3.9), "barrier": (0.5, 2.5, 1.0),
    "motorcycle": (2.1, 0.8, 1.5), "bicycle": (1.7, 0.6, 1.3),
    "pedestrian": (0.7, 0.7, 1.8), "traffic_cone": (0.4, 0.4, 1.1),
}


def nuscenes_available(data_root: str) -> bool:
    return any(
        os.path.isfile(os.path.join(data_root, f))
        for f in ("nuscenes_infos_train.pkl", "nuscenes_infos_val.pkl")
    )


def _normalize_path(data_root: str, lidar_path: str) -> str:
    """Fix the path duplication patterns the reference patches at runtime
    (data/nuscenes/data/nuscenes nesting, doubled samples/LIDAR_TOP,
    backslashes — train_nuscenes_adversarial.py:41-77)."""
    p = lidar_path.replace("\\", "/")
    dup = "data/nuscenes/data/nuscenes"
    while dup in p:
        p = p.replace(dup, "data/nuscenes")
    p = p.replace("samples/LIDAR_TOP/samples/LIDAR_TOP", "samples/LIDAR_TOP")
    if not os.path.isabs(p):
        if p.startswith("data/nuscenes/"):
            p = os.path.join(data_root, p[len("data/nuscenes/"):])
        else:
            p = os.path.join(data_root, p)
    return p


class NuScenesDataset:
    """Info-pkl backed dataset yielding 5D points + 9D boxes (with velocity)."""

    def __init__(self, data_root: str, split: str = "train"):
        self.data_root = data_root
        info_path = os.path.join(data_root, f"nuscenes_infos_{split}.pkl")
        with open(info_path, "rb") as f:
            data = pickle.load(f)
        self.infos = data["data_list"] if isinstance(data, dict) and "data_list" in data else (
            data["infos"] if isinstance(data, dict) else data
        )

    def __len__(self):
        return len(self.infos)

    def get(self, idx: int) -> Dict:
        info = self.infos[idx]
        lidar = info.get("lidar_points", info)
        lidar_path = lidar.get("lidar_path", info.get("lidar_path"))
        path = _normalize_path(self.data_root, lidar_path)
        pts = np.fromfile(path, dtype=np.float32).reshape(-1, 5)
        # annotations (mmdet3d info schema: instances with bbox_3d 9-dim)
        boxes, labels, vel = [], [], []
        for inst in info.get("instances", []):
            b = np.asarray(inst["bbox_3d"], np.float32)
            name_id = inst.get("bbox_label_3d", -1)
            if name_id < 0 or name_id >= len(NUSCENES_CLASSES):
                continue
            # mmdet3d nus boxes: (x, y, z_bottom, dx, dy, dz, yaw[, vx, vy])
            center_z = b[2] + b[5] / 2.0
            boxes.append([b[0], b[1], center_z, b[3], b[4], b[5], b[6]])
            vel.append(b[7:9] if len(b) >= 9 else np.zeros(2, np.float32))
            labels.append(name_id)
        return {
            "points": pts,
            "gt_boxes": np.asarray(boxes, np.float32).reshape(-1, 7),
            "gt_labels": np.asarray(labels, np.int32),
            "gt_vel": np.asarray(vel, np.float32).reshape(-1, 2),
        }


def synthetic_nuscenes_batch(
    rng: np.random.RandomState,
    batch_size: int = 1,
    num_points: int = 30000,
    max_gt: int = 32,
    num_objects: int = 12,
    point_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
):
    """Synthetic NuScenes-like scenes: 5D points, 10 classes, velocities."""
    B, P, G = batch_size, num_points, max_gt
    lo = np.asarray(point_range[:3], np.float32)
    hi = np.asarray(point_range[3:], np.float32)
    points = np.zeros((B, P, 5), np.float32)
    gt_boxes = np.zeros((B, G, 7), np.float32)
    gt_labels = np.zeros((B, G), np.int32)
    gt_vel = np.zeros((B, G, 2), np.float32)
    gt_mask = np.zeros((B, G), bool)
    names = list(NUSCENES_CLASSES)
    for b in range(B):
        n_obj = min(num_objects, G)
        labels = rng.randint(0, len(names), n_obj)
        for i, li in enumerate(labels):
            size = np.asarray(_CLASS_SIZES[names[li]], np.float32)
            size = size * rng.uniform(0.9, 1.1, 3).astype(np.float32)
            c = np.array([
                rng.uniform(lo[0] + 8, hi[0] - 8),
                rng.uniform(lo[1] + 8, hi[1] - 8),
                rng.uniform(-1.5, 0.0),
            ], np.float32)
            yaw = rng.uniform(-np.pi, np.pi)
            gt_boxes[b, i] = [c[0], c[1], c[2], size[0], size[1], size[2], yaw]
            gt_labels[b, i] = li
            gt_vel[b, i] = rng.uniform(-5, 5, 2)
            gt_mask[b, i] = True
        n_fg = int(P * 0.5)
        per = max(n_fg // n_obj, 1)
        idx = 0
        for i in range(n_obj):
            box = gt_boxes[b, i]
            local = rng.uniform(-0.5, 0.5, (per, 3)).astype(np.float32) * box[3:6]
            cth, sth = np.cos(box[6]), np.sin(box[6])
            world = local.copy()
            world[:, 0] = local[:, 0] * cth - local[:, 1] * sth
            world[:, 1] = local[:, 0] * sth + local[:, 1] * cth
            world += box[:3]
            points[b, idx:idx + per, :3] = world
            idx += per
        n_bg = P - idx
        points[b, idx:, 0] = rng.uniform(lo[0], hi[0], n_bg)
        points[b, idx:, 1] = rng.uniform(lo[1], hi[1], n_bg)
        points[b, idx:, 2] = rng.normal(-1.8, 0.1, n_bg)
        points[b, :, 3] = rng.rand(P)
        points[b, :, 4] = 0.0  # timestamp channel
    batch = PointCloudBatch(points, np.ones((B, P), bool), gt_boxes, gt_labels, gt_mask)
    return batch, gt_vel
