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


class TestImagePlaneProtocol:
    """2D/AOS metrics, DontCare regions, min-height detection filter."""

    CALIB = {
        "P2": np.array(
            [[700.0, 0.0, 600.0, 0.0], [0.0, 700.0, 180.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
        ),
        "R0": np.eye(3),
        # lidar (x fwd, y left, z up) -> cam (x right, y down, z fwd)
        "Tr_velo_to_cam": np.array(
            [[0.0, -1.0, 0.0, 0.0], [0.0, 0.0, -1.0, 0.0], [1.0, 0.0, 0.0, 0.0]]
        ),
    }

    def _gt_with_image(self, boxes, names, bbox2d, alpha, dontcare=None,
                       difficulty=None):
        anno = anno_gt(boxes, names, difficulty=difficulty)
        anno["bbox2d"] = np.asarray(bbox2d, np.float32).reshape(-1, 4)
        anno["alpha"] = np.asarray(alpha, np.float32)
        anno["dontcare"] = np.asarray(
            dontcare if dontcare is not None else np.zeros((0, 4)), np.float32
        ).reshape(-1, 4)
        return anno

    def _dt_with_image(self, boxes, names, scores):
        from robustpointclouds_tpu.eval.kitti_metric import (
            detection_alphas,
            project_boxes_to_image,
        )

        anno = anno_dt(boxes, names, scores)
        anno["bbox2d"] = project_boxes_to_image(anno["boxes_3d"], self.CALIB)
        anno["alpha"] = detection_alphas(anno["boxes_3d"], self.CALIB)
        return anno

    def test_projection_sane(self):
        from robustpointclouds_tpu.eval.kitti_metric import project_boxes_to_image

        bb = project_boxes_to_image(np.asarray([CAR], np.float32), self.CALIB)
        # box at lidar (10, 5, -1): cam x=-5 (left of center), z=10 -> u < 600
        assert bb.shape == (1, 4)
        x1, y1, x2, y2 = bb[0]
        assert x2 > x1 and y2 > y1
        assert x2 < 600.0
        # projected height ~ f * h / z = 700 * 1.56 / 10 ~ 109 px at the
        # center; near corners (z ~ 8) project taller
        assert 80.0 < (y2 - y1) < 180.0

    def test_2d_ap_perfect(self):
        from robustpointclouds_tpu.eval.kitti_metric import project_boxes_to_image

        boxes = [CAR, CAR2]
        bb2 = project_boxes_to_image(np.asarray(boxes, np.float32), self.CALIB)
        gt = [self._gt_with_image(boxes, ["Car", "Car"], bb2, [0.1, 0.2],
                                  difficulty=[0, 1])]
        dt = [self._dt_with_image(boxes, ["Car", "Car"], [0.9, 0.8])]
        res = eval_kitti_ap(gt, dt, metric="2d")
        # easy: the far (36 px) GT is harder-difficulty -> ignored, its
        # matching detection is ignored by min height -> absorbed, AP 100
        assert res["Car_2d_easy"] == pytest.approx(100.0)
        assert res["Car_2d_moderate"] == pytest.approx(100.0)

    def test_aos_penalizes_flipped_orientation(self):
        from robustpointclouds_tpu.eval.kitti_metric import (
            detection_alphas,
            project_boxes_to_image,
        )

        boxes = np.asarray([CAR, CAR2], np.float32)
        bb2 = project_boxes_to_image(boxes, self.CALIB)
        true_alpha = detection_alphas(boxes, self.CALIB)
        gt = [self._gt_with_image(boxes, ["Car", "Car"], bb2, true_alpha,
                                  difficulty=[0, 1])]
        dt_good = [self._dt_with_image(boxes, ["Car", "Car"], [0.9, 0.8])]
        res_good = eval_kitti_ap(gt, dt_good, metric="aos")
        assert res_good["Car_aos_moderate"] == pytest.approx(100.0, abs=1e-3)

        flipped = boxes.copy()
        flipped[:, 6] += np.pi  # 180-degree heading error
        dt_bad = [self._dt_with_image(flipped, ["Car", "Car"], [0.9, 0.8])]
        res_bad = eval_kitti_ap(gt, dt_bad, metric="aos")
        # flipped orientation: similarity (1+cos(pi))/2 = 0 while 2D box is
        # identical -> AOS collapses, 2D AP stays 100
        assert res_bad["Car_aos_moderate"] == pytest.approx(0.0, abs=1e-3)
        assert eval_kitti_ap(gt, dt_bad, metric="2d")["Car_2d_moderate"] == pytest.approx(100.0)

    def test_dontcare_suppresses_fp(self):
        from robustpointclouds_tpu.eval.kitti_metric import project_boxes_to_image

        boxes = [CAR]
        bb2 = project_boxes_to_image(np.asarray(boxes, np.float32), self.CALIB)
        # a spurious detection inside a DontCare region (close enough that
        # its ~73 px projected height clears the easy min-height filter)
        stray = [15.0, -4.0, -1.0, 3.9, 1.6, 1.56, 0.0]
        stray_bb = project_boxes_to_image(np.asarray([stray], np.float32), self.CALIB)[0]
        dc = [stray_bb + np.asarray([-5, -5, 5, 5])]
        gt_with_dc = [self._gt_with_image(boxes, ["Car"], bb2, [0.0], dontcare=dc)]
        gt_without = [self._gt_with_image(boxes, ["Car"], bb2, [0.0])]
        # the stray must outscore the TP: R40 samples thresholds at matched
        # scores only, so a below-TP FP would never surface
        dt = [self._dt_with_image([CAR, stray], ["Car", "Car"], [0.9, 0.95])]
        with_dc = eval_kitti_ap(gt_with_dc, dt, metric="2d")["Car_2d_easy"]
        without = eval_kitti_ap(gt_without, dt, metric="2d")["Car_2d_easy"]
        assert with_dc == pytest.approx(100.0)
        assert without < 100.0
        # mmdet3d applies DontCare to the image-plane metric only: the stray
        # detection stays an FP for the 3d metric
        assert eval_kitti_ap(gt_with_dc, dt, metric="3d")["Car_3d_easy"] < 100.0

    def test_min_height_detection_ignored(self):
        from robustpointclouds_tpu.eval.kitti_metric import project_boxes_to_image

        boxes = [CAR]
        bb2 = project_boxes_to_image(np.asarray(boxes, np.float32), self.CALIB)
        # a far detection whose projected height is < 40 px (z=60 -> ~18 px)
        tiny = [60.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0]
        gt = [self._gt_with_image(boxes, ["Car"], bb2, [0.0])]
        dt = [self._dt_with_image([CAR, tiny], ["Car", "Car"], [0.9, 0.85])]
        res = eval_kitti_ap(gt, dt, metric="2d")
        # easy (min height 40): tiny det ignored, not an FP -> AP 100
        assert res["Car_2d_easy"] == pytest.approx(100.0)

    def test_update_from_arrays_with_meta(self):
        from robustpointclouds_tpu.eval.kitti_metric import project_boxes_to_image

        m = KittiMetric()
        boxes = np.zeros((4, 7), np.float32)
        boxes[0] = CAR
        bb2 = np.zeros((4, 4), np.float32)
        bb2[0] = project_boxes_to_image(boxes[:1], self.CALIB)[0]
        meta = {
            "gt_bbox2d": bb2,
            "gt_alpha": np.zeros(4, np.float32),
            "dontcare": np.zeros((0, 4), np.float32),
            "calib": self.CALIB,
        }
        gmask = np.asarray([True, False, False, False])
        m.update_from_arrays(
            gt_boxes=boxes, gt_labels=np.zeros(4, np.int32), gt_mask=gmask,
            dt_boxes=boxes, dt_scores=np.asarray([0.9, 0, 0, 0], np.float32),
            dt_labels=np.zeros(4, np.int32), dt_mask=gmask,
            gt_difficulty=np.zeros(4, np.int32), meta=meta,
        )
        res = m.compute()
        assert res["Car_3d_easy"] == pytest.approx(100.0)
        assert res["Car_2d_easy"] == pytest.approx(100.0)
        assert res["Car_aos_easy"] > 0.0
