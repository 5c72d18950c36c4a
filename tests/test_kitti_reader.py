"""KITTI raw-layout reader tests against a fabricated dataset directory."""
import os

import numpy as np
import pytest

from robustpointclouds_tpu.data import kitti
from robustpointclouds_tpu.data import transforms as T


@pytest.fixture
def kitti_root(tmp_path):
    root = tmp_path / "kitti"
    for sub in ("training/velodyne", "training/label_2", "training/calib", "ImageSets"):
        os.makedirs(root / sub)

    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform([0, -20, -2], [50, 20, 1], (3000, 3)), rng.rand(3000, 1)], 1
    ).astype(np.float32)
    pts.tofile(root / "training/velodyne/000001.bin")

    # identity-ish calib: R0 = I, Tr_velo_to_cam = the standard axis swap
    # cam x = -velo y, cam y = -velo z, cam z = velo x
    tr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float64)
    with open(root / "training/calib/000001.txt", "w") as f:
        f.write("P2: " + " ".join(map(str, np.eye(3, 4).ravel())) + "\n")
        f.write("R0_rect: " + " ".join(map(str, np.eye(3).ravel())) + "\n")
        f.write("Tr_velo_to_cam: " + " ".join(map(str, tr.ravel())) + "\n")

    # one car at velo (10, 5, -1) with l=4, w=1.6, h=1.5, rot_y=0.2
    # cam location = (-5, 1, 10) (bottom center)
    with open(root / "training/label_2/000001.txt", "w") as f:
        f.write("Car 0.00 0 0.2 300 150 350 200 1.5 1.6 4.0 -5.0 1.0 10.0 0.2\n")
        f.write("Pedestrian 0.4 2 0.0 300 180 310 206 1.8 0.6 0.8 -2.0 1.0 20.0 0.0\n")
        f.write("DontCare -1 -1 -10 0 0 10 10 -1 -1 -1 -1000 -1000 -1000 -10\n")

    with open(root / "ImageSets/train.txt", "w") as f:
        f.write("000001\n")
    return str(root)


class TestCalibAndLabels:
    def test_camera_to_lidar_conversion(self, kitti_root):
        ds = kitti.KittiDataset(kitti_root, split="train")
        assert len(ds) == 1
        s = ds.get(0)
        assert s["points"].shape == (3000, 4)
        assert len(s["gt_boxes"]) == 2  # DontCare dropped
        car = s["gt_boxes"][0]
        # velo location: x = cam z = 10, y = -cam x = 5, z_bottom = -cam y = -1
        # center z = -1 + h/2 = -0.25
        np.testing.assert_allclose(car[:3], [10.0, 5.0, -0.25], atol=1e-5)
        # dims (dx=l, dy=w, dz=h)
        np.testing.assert_allclose(car[3:6], [4.0, 1.6, 1.5], atol=1e-6)
        # yaw = -rot_y - pi/2
        np.testing.assert_allclose(car[6], -0.2 - np.pi / 2, atol=1e-6)
        assert s["gt_labels"].tolist() == [0, 1]

    def test_difficulty_rules(self, kitti_root):
        ds = kitti.KittiDataset(kitti_root, split="train")
        s = ds.get(0)
        # car: bbox h=50px, occ 0, trunc 0 -> easy (0)
        assert s["gt_difficulty"][0] == 0
        # ped: bbox h=26px, occ 2, trunc 0.4 -> hard (2)
        assert s["gt_difficulty"][1] == 2

    def test_epoch_loader_native_path(self, kitti_root):
        from robustpointclouds_tpu.data.native import native_available
        from robustpointclouds_tpu.models import VoxelNetConfig

        cfg = VoxelNetConfig()
        loader = kitti.kitti_epoch_loader(
            kitti_root, batch_size=2, model_cfg=cfg, steps_per_epoch=1,
            num_points=4000,
        )
        batch = next(iter(loader(0)))
        assert batch.points.shape == (2, 4000, 4)
        assert bool(batch.points_mask.any())
        assert bool(batch.gt_mask.any())
        # augmented boxes keep positive extents
        import numpy as np_
        gm = np_.asarray(batch.gt_mask)
        assert (np_.asarray(batch.gt_boxes)[gm][:, 3:6] > 0).all()

    def test_val_loader(self, kitti_root):
        from robustpointclouds_tpu.models import VoxelNetConfig

        # no val split file -> falls back to all frames
        batches = list(kitti.kitti_val_loader(kitti_root, 1, VoxelNetConfig(),
                                              num_points=4000))
        assert len(batches) == 1
        assert batches[0].points.shape == (1, 4000, 4)


class TestTransformsRoundtrip:
    def test_points_follow_objects(self, kitti_root):
        ds = kitti.KittiDataset(kitti_root, split="train")
        s = ds.get(0)
        rng = np.random.RandomState(0)
        # place points inside the car box, then object_noise must move them with it
        box = s["gt_boxes"][0]
        inside = box[:3] + np.array([[0.5, 0.2, 0.1], [-0.5, -0.2, -0.1]], np.float32)
        s2 = dict(s)
        s2["points"] = np.concatenate(
            [np.concatenate([inside, np.ones((2, 1), np.float32)], 1), s["points"]]
        )
        out = T.object_noise(s2, rng)
        new_box = out["gt_boxes"][0]
        moved = out["points"][:2, :3]
        d_before = np.linalg.norm(inside - box[:3], axis=1)
        d_after = np.linalg.norm(moved - new_box[:3], axis=1)
        np.testing.assert_allclose(d_before, d_after, atol=1e-4)
