import numpy as np
import pytest

from robustpointclouds_tpu.eval import KittiMetric, eval_kitti_ap


def anno_gt(boxes, names, difficulty=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 7)
    return {
        "name": np.asarray(names),
        "boxes_3d": boxes,
        "difficulty": np.asarray(
            difficulty if difficulty is not None else [0] * len(boxes), np.int32
        ),
    }


def anno_dt(boxes, names, scores):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 7)
    return {
        "name": np.asarray(names),
        "boxes_3d": boxes,
        "score": np.asarray(scores, np.float32),
    }


CAR = [10.0, 5.0, -1.0, 3.9, 1.6, 1.56, 0.3]
CAR2 = [30.0, -5.0, -1.0, 3.9, 1.6, 1.56, -0.5]
FAR = [60.0, 20.0, -1.0, 3.9, 1.6, 1.56, 0.0]


class TestPerfectDetection:
    def test_ap_100(self):
        gt = [anno_gt([CAR, CAR2], ["Car", "Car"])]
        dt = [anno_dt([CAR, CAR2], ["Car", "Car"], [0.9, 0.8])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(100.0, abs=0.5)

    def test_missing_detection_lowers_ap(self):
        gt = [anno_gt([CAR, CAR2], ["Car", "Car"])]
        dt = [anno_dt([CAR], ["Car"], [0.9])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert 30.0 < res["Car_3d_easy"] < 70.0

    def test_false_positive_lowers_ap(self):
        gt = [anno_gt([CAR], ["Car"])]
        # high-scoring FP above the TP degrades precision at all recalls
        dt = [anno_dt([FAR, CAR], ["Car", "Car"], [0.95, 0.9])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] < 100.0

    def test_low_scoring_fp_harmless(self):
        gt = [anno_gt([CAR], ["Car"])]
        dt = [anno_dt([CAR, FAR], ["Car", "Car"], [0.9, 0.01])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(100.0, abs=0.5)


class TestIgnoreSemantics:
    def test_harder_difficulty_ignored(self):
        # a hard GT must not count as FN at easy difficulty
        gt = [anno_gt([CAR, CAR2], ["Car", "Car"], difficulty=[0, 2])]
        dt = [anno_dt([CAR], ["Car"], [0.9])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(100.0, abs=0.5)
        assert res["Car_3d_hard"] < 100.0

    def test_van_not_fp_for_car(self):
        van_box = CAR2
        gt = [anno_gt([CAR, van_box], ["Car", "Van"])]
        # detector fires on the Van too; that must not be an FP
        dt = [anno_dt([CAR, van_box], ["Car", "Car"], [0.9, 0.85])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(100.0, abs=0.5)

    def test_unmatched_high_scoring_detection_is_fp(self):
        # FP scored above the TP threshold must degrade precision
        gt = [anno_gt([CAR], ["Car"])]
        dt = [anno_dt([CAR, CAR2], ["Car", "Car"], [0.85, 0.9])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(50.0, abs=1.0)


class TestLocalizationThreshold:
    def test_loose_box_fails_07_iou(self):
        shifted = list(CAR)
        shifted[0] += 1.2  # ~30% IoU: below Car's 0.7 threshold
        gt = [anno_gt([CAR], ["Car"])]
        dt = [anno_dt([shifted], ["Car"], [0.9])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(0.0, abs=0.5)

    def test_bev_looser_than_3d(self):
        lifted = list(CAR)
        lifted[2] += 0.8  # z shift hurts 3d IoU, not BEV
        gt = [anno_gt([CAR], ["Car"])]
        dt = [anno_dt([lifted], ["Car"], [0.9])]
        res3d = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        resbev = eval_kitti_ap(gt, dt, classes=("Car",), metric="bev")
        assert resbev["Car_bev_easy"] >= res3d["Car_3d_easy"]


class TestMetricAccumulator:
    def test_update_from_arrays_and_map(self):
        m = KittiMetric(classes=("Car", "Pedestrian", "Cyclist"), metrics=("3d",))
        gt_boxes = np.asarray([CAR, CAR2], np.float32)
        m.update_from_arrays(
            gt_boxes=gt_boxes,
            gt_labels=np.array([0, 0]),
            gt_mask=np.array([True, True]),
            dt_boxes=np.asarray([CAR, CAR2, FAR], np.float32),
            dt_scores=np.array([0.9, 0.8, 0.0]),
            dt_labels=np.array([0, 0, 0]),
            dt_mask=np.array([True, True, False]),  # padding row excluded
        )
        res = m.compute()
        assert res["Car_3d_easy"] == pytest.approx(100.0, abs=0.5)
        assert "mAP_3d_moderate" in res
        m.reset()
        assert m.compute() == {} or all(v == 0 for v in m.compute().values())
