"""NuScenes real-data path: fabricated info-pkl fixture through reader,
multi-sweep aggregation, augmentation, loaders, and the full-NDS metric."""
import os
import pickle

import numpy as np
import pytest

from robustpointclouds_tpu.data import nuscenes as nus
from robustpointclouds_tpu.eval.nuscenes_metric import eval_nuscenes_map

CLASSES = nus.NUSCENES_CLASSES


def _write_bin(path, pts):
    np.asarray(pts, np.float32).tofile(path)


@pytest.fixture()
def nus_root(tmp_path):
    root = tmp_path / "nuscenes"
    (root / "samples" / "LIDAR_TOP").mkdir(parents=True)
    (root / "sweeps" / "LIDAR_TOP").mkdir(parents=True)
    rng = np.random.RandomState(0)

    def scene_points(n, intensity=0.5):
        pts = np.zeros((n, 5), np.float32)
        pts[:, 0] = rng.uniform(-20, 20, n)
        pts[:, 1] = rng.uniform(-20, 20, n)
        pts[:, 2] = rng.uniform(-2, 0.5, n)
        pts[:, 3] = intensity
        pts[:, 4] = 7.0  # ring index; reader must overwrite with time lag
        return pts

    infos = []
    for i in range(3):
        key = f"samples/LIDAR_TOP/key{i}.bin"
        _write_bin(root / key, scene_points(400))
        sweep = f"sweeps/LIDAR_TOP/sweep{i}.bin"
        _write_bin(root / sweep, scene_points(100, intensity=0.2))
        infos.append({
            "lidar_points": {"lidar_path": key},
            "timestamp": 1_000_000 * (i + 10),  # microseconds
            "sweeps": [{
                "lidar_points": {"lidar_path": sweep},
                "timestamp": 1_000_000 * (i + 10) - 100_000,  # 0.1 s earlier
                "sensor2lidar_rotation": np.eye(3),
                "sensor2lidar_translation": np.array([1.0, 0.0, 0.0]),
            }],
            "instances": [
                {"bbox_3d": [5.0, 2.0, -1.5, 4.6, 1.9, 1.7, 0.3, 2.0, -1.0],
                 "bbox_label_3d": 0},
                {"bbox_3d": [-6.0, 1.0, -1.2, 0.7, 0.7, 1.8, 0.0, 0.0, 0.0],
                 "bbox_label_3d": CLASSES.index("pedestrian")},
            ],
        })
    for split in ("train", "val"):
        with open(root / f"nuscenes_infos_{split}.pkl", "wb") as f:
            pickle.dump({"data_list": infos}, f)
    return str(root)


class TestReader:
    def test_available(self, nus_root):
        assert nus.nuscenes_available(nus_root)
        assert not nus.nuscenes_available(nus_root + "_missing")

    def test_get_multisweep(self, nus_root):
        ds = nus.NuScenesDataset(nus_root, split="train")
        s = ds.get(0)
        # key frame 400 pts + 1 sweep 100 pts
        assert s["points"].shape == (500, 5)
        # key-frame lag 0, sweep lag 0.1 s
        lags = np.unique(np.round(s["points"][:, 4].astype(np.float64), 3))
        np.testing.assert_allclose(sorted(lags), [0.0, 0.1], atol=1e-3)
        # sweep points translated by sensor2lidar_translation (+1 in x)
        # (weak check: sweep x range shifted)
        assert s["points"][400:, 0].max() <= 21.0 + 1e-5

    def test_boxes_center_z_and_velocity(self, nus_root):
        ds = nus.NuScenesDataset(nus_root, split="train")
        s = ds.get(0)
        assert s["gt_boxes"].shape == (2, 7)
        # bottom z -1.5 + h/2 (1.7/2) = -0.65
        assert s["gt_boxes"][0, 2] == pytest.approx(-1.5 + 0.85)
        np.testing.assert_allclose(s["gt_vel"][0], [2.0, -1.0])

    def test_max_sweeps_zero(self, nus_root):
        ds = nus.NuScenesDataset(nus_root, split="train", max_sweeps=0)
        assert ds.get(0)["points"].shape == (400, 5)


class TestAugment:
    def test_velocity_transforms_with_boxes(self, nus_root):
        ds = nus.NuScenesDataset(nus_root, split="train")
        s = ds.get(0)
        pcr = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
        for seed in range(5):
            out = nus.augment_nuscenes_sample(s, np.random.RandomState(seed), pcr)
            # velocity magnitude scales with the global scale only
            keep = out["gt_labels"] == 0
            if keep.any():
                v = out["gt_vel"][keep][0]
                mag = np.linalg.norm(v) / np.linalg.norm(s["gt_vel"][0])
                assert 0.94 < mag < 1.06


class TestLoaders:
    def test_epoch_loader(self, nus_root):
        from robustpointclouds_tpu.models.centerpoint import CenterPointConfig

        loader = nus.nuscenes_epoch_loader(
            nus_root, 2, CenterPointConfig(), steps_per_epoch=2,
            num_points=600, max_gt=8, max_sweeps=9,
        )
        items = list(loader(0))
        assert len(items) == 2
        batch, vel = items[0]
        assert batch.points.shape == (2, 600, 5)
        assert vel.shape == (2, 8, 2)
        assert bool(batch.gt_mask.any())

    def test_val_loader_pad_rows(self, nus_root):
        from robustpointclouds_tpu.models.centerpoint import CenterPointConfig

        items = list(nus.nuscenes_val_loader(
            nus_root, 2, CenterPointConfig(), num_points=600, max_gt=8,
        ))
        # 3 frames @ batch 2 -> 2 batches, last row padded
        assert len(items) == 2
        _, _, metas = items[1]
        assert metas[0]["valid"] and not metas[1]["valid"]


class TestFullNDS:
    def _frame(self, dt_offset=0.0, size_scale=1.0, yaw_off=0.0, vel_off=0.0,
               gt_attr=5):
        # class 0 = car, vel (1, 0) -> speed > 0.2 -> the mmdet3d detection
        # rule assigns 'vehicle.moving' (ATTRIBUTES[5]); gt_attr 5 matches
        gt = [{
            "boxes_3d": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32),
            "labels": np.array([0]),
            "vel": np.array([[1.0, 0.0]], np.float32),
            "attrs": np.array([gt_attr], np.int32),
        }]
        dt = [{
            "boxes_3d": np.array(
                [[dt_offset, 0, 0, 4 * size_scale, 2 * size_scale,
                  1.5 * size_scale, yaw_off, 1.0 + vel_off, 0.0]], np.float32),
            "labels": np.array([0]),
            "score": np.array([0.9], np.float32),
        }]
        return gt, dt

    def test_perfect_gets_full_nds(self):
        gt, dt = self._frame()
        res = eval_nuscenes_map(gt, dt, CLASSES)
        assert res["mAP"] > 99.0
        assert res["NDS"] > 99.0
        assert res["mATE"] == pytest.approx(0.0, abs=1e-6)
        assert res["mASE"] == pytest.approx(0.0, abs=1e-6)
        assert res["mAOE"] == pytest.approx(0.0, abs=1e-6)
        assert res["mAVE"] == pytest.approx(0.0, abs=1e-6)

    def test_scale_error(self):
        gt, dt = self._frame(size_scale=0.8)
        res = eval_nuscenes_map(gt, dt, CLASSES)
        # aligned IoU = 0.8^3 -> ASE = 1 - 0.512
        assert res["mASE"] == pytest.approx(1 - 0.8**3, abs=1e-4)
        assert res["NDS"] < 99.0

    def test_orientation_error(self):
        gt, dt = self._frame(yaw_off=0.5)
        res = eval_nuscenes_map(gt, dt, CLASSES)
        assert res["mAOE"] == pytest.approx(0.5, abs=1e-5)

    def test_velocity_error(self):
        gt, dt = self._frame(vel_off=2.0)
        res = eval_nuscenes_map(gt, dt, CLASSES)
        assert res["mAVE"] == pytest.approx(2.0, abs=1e-5)

    def test_translation_error(self):
        gt, dt = self._frame(dt_offset=1.0)
        res = eval_nuscenes_map(gt, dt, CLASSES)
        assert res["mATE"] == pytest.approx(1.0, abs=1e-5)

    def test_attribute_error_zero_when_matching(self):
        gt, dt = self._frame()  # gt 'vehicle.moving' == derived dt attr
        res = eval_nuscenes_map(gt, dt, CLASSES)
        assert res["mAAE"] == pytest.approx(0.0, abs=1e-6)

    def test_attribute_error_counts_mismatch(self):
        gt, dt = self._frame(gt_attr=6)  # gt 'vehicle.parked' vs dt 'moving'
        res = eval_nuscenes_map(gt, dt, CLASSES)
        assert res["mAAE"] == pytest.approx(1.0, abs=1e-6)

    def test_nds_is_devkit_formula_with_five_tp_metrics(self):
        gt, dt = self._frame(size_scale=0.8, gt_attr=6)
        res = eval_nuscenes_map(gt, dt, CLASSES)
        tp_score = sum(
            max(1.0 - min(res[k], 1.0), 0.0)
            for k in ("mATE", "mASE", "mAOE", "mAVE", "mAAE")
        )
        want = (5 * res["mAP"] / 100.0 + tp_score) / 10.0 * 100.0
        assert res["NDS"] == pytest.approx(want, abs=1e-9)

    def test_missing_attrs_score_worst_case(self):
        # no gt attrs anywhere: mAAE = devkit worst case 1.0, NOT renormalized
        gt, dt = self._frame()
        gt[0].pop("attrs")
        res = eval_nuscenes_map(gt, dt, CLASSES)
        assert res["mAAE"] == 1.0
        assert res["NDS"] == pytest.approx(
            (5 * res["mAP"] / 100.0 + 4.0) / 10.0 * 100.0, abs=1e-6)

    def test_detection_attr_rule(self):
        from robustpointclouds_tpu.eval.nuscenes_metric import (
            ATTRIBUTES, default_detection_attrs)

        moving = np.array([[1.0, 0.0]])
        still = np.array([[0.0, 0.0]])
        a = default_detection_attrs("car", moving, 1)
        assert ATTRIBUTES[a[0]] == "vehicle.moving"
        a = default_detection_attrs("car", still, 1)
        assert ATTRIBUTES[a[0]] == "vehicle.parked"
        a = default_detection_attrs("bicycle", moving, 1)
        assert ATTRIBUTES[a[0]] == "cycle.with_rider"
        a = default_detection_attrs("pedestrian", still, 1)
        assert ATTRIBUTES[a[0]] == "pedestrian.standing"
        a = default_detection_attrs("bus", still, 1)
        assert ATTRIBUTES[a[0]] == "vehicle.stopped"
        a = default_detection_attrs("barrier", still, 1)
        assert ATTRIBUTES[a[0]] == "None"


def test_native_sweep_load_matches_numpy(nus_root):
    """The threaded native multi-sweep path (csrc rpc_load_sweeps) must
    produce the same aggregated cloud as the numpy fallback."""
    from robustpointclouds_tpu.data import native

    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    ds = nus.NuScenesDataset(nus_root, split="train", max_sweeps=9)
    info = ds.infos[0]
    key_ts = float(info.get("timestamp", 0.0))
    specs = ds._sweep_specs(info, key_ts)
    assert specs, "fixture should have sweeps"
    got = native.load_sweeps(
        [s[0] for s in specs], [s[1] for s in specs], [s[2] for s in specs]
    )
    # numpy reference
    ref = []
    for path, rt, lag in specs:
        pts = np.fromfile(path, np.float32).reshape(-1, 5).copy()
        if rt is not None:
            pts[:, :3] = pts[:, :3] @ rt[:, :3].T + rt[:, 3]
        pts[:, 4] = lag
        ref.append(pts)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-5)
