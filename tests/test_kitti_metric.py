"""KITTI AP metric: devkit-EXACT semantics, pinned values.

All expected values are hand-derived from the devkit protocol (getThresholds
recall-cursor walk + per-threshold precision slots + right-max smoothing +
sum(slots 1..40)/40). Small scenes deliberately pin the devkit's small-sample
behavior (k matched GTs at full precision -> AP = (k-1)/40*100, because only
k of the 41 precision slots fill); tests/test_kitti_ap_golden.py covers rich
multi-frame scenes against an independent transcription oracle.
"""
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
CAR3 = [50.0, 10.0, -1.0, 3.9, 1.6, 1.56, 0.8]
FAR = [60.0, 20.0, -1.0, 3.9, 1.6, 1.56, 0.0]

# devkit small-sample values: k matched GTs, no FPs -> thresholds at all k
# scores, slots 0..k-1 at precision 1, AP = (k-1)/40*100
AP_PERFECT_2 = 2.5
AP_PERFECT_3 = 5.0
AP_PERFECT_5 = 10.0
# 2 counted GTs + one FP scored between/above them: prec(t_hi)=1 or 1/2,
# prec(t_lo)=2/3, right-max -> slot1 = 2/3 -> AP = 2/3/40*100
AP_2GT_1FP = 100.0 * (2.0 / 3.0) / 40.0


class TestDevkitSmallSampleProtocol:
    """Pins the getThresholds cursor walk itself."""

    def test_two_perfect(self):
        gt = [anno_gt([CAR, CAR2], ["Car"] * 2)]
        dt = [anno_dt([CAR, CAR2], ["Car"] * 2, [0.9, 0.8])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(AP_PERFECT_2, abs=1e-9)

    def test_five_perfect(self):
        c5 = [[10.0 + 8 * i, 5.0, -1.0, 3.9, 1.6, 1.56, 0.3] for i in range(5)]
        gt = [anno_gt(c5, ["Car"] * 5)]
        dt = [anno_dt(c5, ["Car"] * 5, [0.9, 0.8, 0.7, 0.6, 0.5])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(AP_PERFECT_5, abs=1e-9)

    def test_41_perfect_is_exactly_100(self):
        # 41 matched GTs with distinct scores fill every slot: the cursor
        # walk accepts every score ((80-i)/1640 >= (i-40)/1640 for i <= 40)
        gts, dts = [], []
        for i in range(41):
            gts.append(anno_gt([CAR], ["Car"]))
            dts.append(anno_dt([CAR], ["Car"], [1.0 - i * 0.01]))
        res = eval_kitti_ap(gts, dts, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(100.0, abs=1e-9)

    def test_single_gt_always_zero(self):
        # recall 1/1 fills only slot 0, which R40 excludes
        gt = [anno_gt([CAR], ["Car"])]
        dt = [anno_dt([CAR], ["Car"], [0.9])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == 0.0

    def test_missing_detection(self):
        # 2 GTs, 1 matched: one threshold -> slot 0 only -> AP 0
        gt = [anno_gt([CAR, CAR2], ["Car"] * 2)]
        dt = [anno_dt([CAR], ["Car"], [0.9])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == 0.0

    def test_40_of_41_detected(self):
        # 40 matched of 41 GTs: 40 thresholds at precision 1 -> 39 counted
        # slots -> 97.5
        gts, dts = [], []
        for i in range(41):
            gts.append(anno_gt([CAR], ["Car"]))
            dts.append(
                anno_dt([CAR], ["Car"], [1.0 - i * 0.01]) if i < 40
                else anno_dt([], [], [])
            )
        res = eval_kitti_ap(gts, dts, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(97.5, abs=1e-9)


class TestFalsePositives:
    def test_high_scoring_fp_lowers_ap(self):
        gt = [anno_gt([CAR, CAR2], ["Car"] * 2)]
        # FP above both TPs: prec(0.9) = 1/2, prec(0.8) = 2/3, smoothed 2/3
        dt = [anno_dt([FAR, CAR, CAR2], ["Car"] * 3, [0.95, 0.9, 0.8])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(AP_2GT_1FP, abs=1e-9)

    def test_mid_scoring_fp(self):
        gt = [anno_gt([CAR, CAR3], ["Car"] * 2)]
        # FP between the TPs: prec(0.85) = 1/1... the FP (0.9 >= 0.85)
        # counts: 1/2? No: at t=0.85 the TP 0.85 and FP 0.9 pass -> tp=1,
        # fp=1 -> 1/2; at t=0.8 -> tp=2, fp=1 -> 2/3; smoothed slot1 = 2/3
        dt = [anno_dt([CAR, CAR3, CAR2], ["Car"] * 3, [0.85, 0.8, 0.9])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(AP_2GT_1FP, abs=1e-9)

    def test_low_scoring_fp_harmless(self):
        # FP below every sampled threshold never surfaces in R40
        gt = [anno_gt([CAR, CAR2], ["Car"] * 2)]
        dt = [anno_dt([CAR, CAR2, FAR], ["Car"] * 3, [0.9, 0.8, 0.01])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(AP_PERFECT_2, abs=1e-9)


class TestIgnoreSemantics:
    def test_harder_difficulty_ignored(self):
        # hard GT neither FN at easy nor its det an FP
        gt = [anno_gt([CAR, CAR2, CAR3], ["Car"] * 3, difficulty=[0, 0, 2])]
        dt2 = [anno_dt([CAR, CAR2], ["Car"] * 2, [0.9, 0.8])]
        res = eval_kitti_ap(gt, dt2, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(AP_PERFECT_2, abs=1e-9)
        # at hard the third GT counts: 2 of 3 matched still yields 2 full-
        # precision thresholds (missing recall only empties later slots)
        assert res["Car_3d_hard"] == pytest.approx(AP_PERFECT_2, abs=1e-9)
        dt3 = [anno_dt([CAR, CAR2, CAR3], ["Car"] * 3, [0.9, 0.8, 0.7])]
        res3 = eval_kitti_ap(gt, dt3, classes=("Car",), metric="3d")
        assert res3["Car_3d_hard"] == pytest.approx(AP_PERFECT_3, abs=1e-9)

    def test_van_not_fp_for_car(self):
        gt_with_van = [anno_gt([CAR, CAR3, CAR2], ["Car", "Car", "Van"])]
        gt_without = [anno_gt([CAR, CAR3], ["Car", "Car"])]
        # detector fires on the Van too (as 'Car', score between the TPs)
        dt = [anno_dt([CAR, CAR3, CAR2], ["Car"] * 3, [0.9, 0.8, 0.85])]
        res = eval_kitti_ap(gt_with_van, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(AP_PERFECT_2, abs=1e-9)
        res_no = eval_kitti_ap(gt_without, dt, classes=("Car",), metric="3d")
        assert res_no["Car_3d_easy"] == pytest.approx(AP_2GT_1FP, abs=1e-9)

    def test_person_sitting_not_fp_for_pedestrian(self):
        ped = [8.0, 2.0, -1.0, 0.8, 0.6, 1.7, 0.0]
        ped2 = [12.0, -3.0, -1.0, 0.8, 0.6, 1.7, 0.4]
        sitting = [15.0, 4.0, -1.0, 0.8, 0.6, 1.3, 0.0]
        gt = [anno_gt([ped, ped2, sitting],
                      ["Pedestrian", "Pedestrian", "Person_sitting"])]
        dt = [anno_dt([ped, ped2, sitting], ["Pedestrian"] * 3, [0.9, 0.8, 0.85])]
        res = eval_kitti_ap(gt, dt, classes=("Pedestrian",), metric="3d")
        assert res["Pedestrian_3d_easy"] == pytest.approx(AP_PERFECT_2, abs=1e-9)


class TestLocalizationThreshold:
    def test_loose_box_fails_07_iou(self):
        shifted = list(CAR)
        shifted[0] += 1.2  # ~30% IoU: below Car's 0.7 threshold
        gt = [anno_gt([CAR], ["Car"])]
        dt = [anno_dt([shifted], ["Car"], [0.9])]
        res = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] == pytest.approx(0.0, abs=1e-9)

    def test_bev_looser_than_3d(self):
        lifted = list(CAR)
        lifted[2] += 0.8  # z shift hurts 3d IoU, not BEV
        gt = [anno_gt([CAR, CAR2], ["Car"] * 2)]
        dt = [anno_dt([lifted, CAR2], ["Car"] * 2, [0.9, 0.8])]
        res3d = eval_kitti_ap(gt, dt, classes=("Car",), metric="3d")
        resbev = eval_kitti_ap(gt, dt, classes=("Car",), metric="bev")
        assert resbev["Car_bev_easy"] == pytest.approx(AP_PERFECT_2, abs=1e-9)
        assert res3d["Car_3d_easy"] < resbev["Car_bev_easy"]


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
        assert res["Car_3d_easy"] == pytest.approx(AP_PERFECT_2, abs=1e-9)
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

    def test_2d_min_height_interacts_with_difficulty(self):
        from robustpointclouds_tpu.eval.kitti_metric import project_boxes_to_image

        boxes = [CAR, CAR2]
        bb2 = project_boxes_to_image(np.asarray(boxes, np.float32), self.CALIB)
        gt = [self._gt_with_image(boxes, ["Car", "Car"], bb2, [0.1, 0.2],
                                  difficulty=[0, 1])]
        dt = [self._dt_with_image(boxes, ["Car", "Car"], [0.9, 0.8])]
        res = eval_kitti_ap(gt, dt, metric="2d")
        # easy: only CAR counted (CAR2 is harder difficulty); its single
        # matched threshold fills slot 0 only
        assert res["Car_2d_easy"] == 0.0
        # moderate: both counted and matched (the 36 px CAR2 detection
        # clears the 25 px moderate min height)
        assert res["Car_2d_moderate"] == pytest.approx(AP_PERFECT_2, abs=1e-9)

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
        assert res_good["Car_aos_moderate"] == pytest.approx(AP_PERFECT_2, abs=1e-6)

        flipped = boxes.copy()
        flipped[:, 6] += np.pi  # 180-degree heading error
        dt_bad = [self._dt_with_image(flipped, ["Car", "Car"], [0.9, 0.8])]
        res_bad = eval_kitti_ap(gt, dt_bad, metric="aos")
        # flipped orientation: similarity (1+cos(pi))/2 = 0 while 2D box is
        # identical -> AOS collapses, 2D AP unchanged
        assert res_bad["Car_aos_moderate"] == pytest.approx(0.0, abs=1e-6)
        assert eval_kitti_ap(gt, dt_bad, metric="2d")["Car_2d_moderate"] == (
            pytest.approx(AP_PERFECT_2, abs=1e-9)
        )

    def test_dontcare_suppresses_fp(self):
        from robustpointclouds_tpu.eval.kitti_metric import project_boxes_to_image

        # both GTs near enough that their detections clear the 40 px easy
        # min height (a far GT's det would be min-height-ignored -> absorbed
        # -> no threshold)
        boxes = [CAR, [10.0, -5.0, -1.0, 3.9, 1.6, 1.56, -0.3]]
        bb2 = project_boxes_to_image(np.asarray(boxes, np.float32), self.CALIB)
        # a spurious detection inside a DontCare region (close enough that
        # its ~73 px projected height clears the easy min-height filter)
        stray = [15.0, -4.0, -1.0, 3.9, 1.6, 1.56, 0.0]
        stray_bb = project_boxes_to_image(np.asarray([stray], np.float32), self.CALIB)[0]
        dc = [stray_bb + np.asarray([-5, -5, 5, 5])]
        gt_with_dc = [self._gt_with_image(boxes, ["Car"] * 2, bb2, [0.0, 0.0],
                                          dontcare=dc)]
        gt_without = [self._gt_with_image(boxes, ["Car"] * 2, bb2, [0.0, 0.0])]
        # the stray outscores both TPs so it lands above every sampled
        # threshold
        dt = [self._dt_with_image(boxes + [stray], ["Car"] * 3,
                                  [0.9, 0.8, 0.95])]
        with_dc = eval_kitti_ap(gt_with_dc, dt, metric="2d")["Car_2d_easy"]
        without = eval_kitti_ap(gt_without, dt, metric="2d")["Car_2d_easy"]
        assert with_dc == pytest.approx(AP_PERFECT_2, abs=1e-9)
        assert without == pytest.approx(AP_2GT_1FP, abs=1e-9)
        # mmdet3d applies DontCare to the image-plane metric only: the stray
        # detection stays an FP for the 3d metric
        assert eval_kitti_ap(gt_with_dc, dt, metric="3d")["Car_3d_easy"] == (
            pytest.approx(AP_2GT_1FP, abs=1e-9)
        )

    def test_min_height_detection_ignored(self):
        from robustpointclouds_tpu.eval.kitti_metric import project_boxes_to_image

        near_a = [10.0, 5.0, -1.0, 3.9, 1.6, 1.56, 0.3]
        near_b = [10.0, -5.0, -1.0, 3.9, 1.6, 1.56, -0.3]
        boxes = [near_a, near_b]
        bb2 = project_boxes_to_image(np.asarray(boxes, np.float32), self.CALIB)
        # a far detection whose projected height is < 40 px (z=60 -> ~18 px)
        tiny = [60.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0]
        gt = [self._gt_with_image(boxes, ["Car"] * 2, bb2, [0.0, 0.0])]
        dt = [self._dt_with_image([near_a, near_b, tiny], ["Car"] * 3,
                                  [0.9, 0.8, 0.95])]
        res = eval_kitti_ap(gt, dt, metric="2d")
        # easy (min height 40): the tiny det is ignored, never an FP
        assert res["Car_2d_easy"] == pytest.approx(AP_PERFECT_2, abs=1e-9)

    def test_update_from_arrays_with_meta(self):
        from robustpointclouds_tpu.eval.kitti_metric import project_boxes_to_image

        m = KittiMetric()
        boxes = np.zeros((4, 7), np.float32)
        boxes[0] = CAR
        boxes[1] = [10.0, -5.0, -1.0, 3.9, 1.6, 1.56, -0.3]  # near: >40 px
        bb2 = np.zeros((4, 4), np.float32)
        bb2[:2] = project_boxes_to_image(boxes[:2], self.CALIB)
        meta = {
            "gt_bbox2d": bb2,
            "gt_alpha": np.zeros(4, np.float32),
            "dontcare": np.zeros((0, 4), np.float32),
            "calib": self.CALIB,
        }
        gmask = np.asarray([True, True, False, False])
        m.update_from_arrays(
            gt_boxes=boxes, gt_labels=np.zeros(4, np.int32), gt_mask=gmask,
            dt_boxes=boxes, dt_scores=np.asarray([0.9, 0.8, 0, 0], np.float32),
            dt_labels=np.zeros(4, np.int32), dt_mask=gmask,
            gt_difficulty=np.zeros(4, np.int32), meta=meta,
        )
        res = m.compute()
        assert res["Car_3d_easy"] == pytest.approx(AP_PERFECT_2, abs=1e-9)
        assert res["Car_2d_easy"] == pytest.approx(AP_PERFECT_2, abs=1e-9)
        assert res["Car_aos_easy"] > 0.0
