"""Golden KITTI-AP fixtures: rich multi-frame scenes vs an independent
devkit transcription, plus frozen literal values (VERDICT r2 missing #2).

The oracle below is a second, independently-written port of the official
KITTI devkit / mmdet3d `eval_class` state machine (GT-major overlap matrix,
explicit NO_DETECTION sentinel, devkit loop structure), sharing only the
rotated-IoU geometry (ops/boxes, pinned separately by test_boxes.py). The
scene set exercises: the 40-point threshold walk with interleaved FPs,
mixed difficulties, Van/Person_sitting ignore absorption, DontCare
absorption, min-height-ignored detections, AOS orientation similarity,
empty frames, and borderline IoUs.

Frozen literals pin a subset of values so a correlated drift of both
implementations cannot pass silently; sensitivity tests flip each protocol
rule and assert the number moves.
"""
import numpy as np
import pytest

from robustpointclouds_tpu.eval import eval_kitti_ap
from robustpointclouds_tpu.eval.kitti_metric import (
    _MIN_HEIGHT,
    _N_SAMPLE_PTS,
    box2d_ioa,
    box2d_iou,
    detection_alphas,
    project_boxes_to_image,
    _rotated_iou,
)

CALIB = {
    "P2": np.array(
        [[700.0, 0.0, 600.0, 0.0], [0.0, 700.0, 180.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    ),
    "R0": np.eye(3),
    "Tr_velo_to_cam": np.array(
        [[0.0, -1.0, 0.0, 0.0], [0.0, 0.0, -1.0, 0.0], [1.0, 0.0, 0.0, 0.0]]
    ),
}

_NEIGHBORS = {"Car": ("Van",), "Pedestrian": ("Person_sitting",), "Cyclist": ()}


# ---------------------------------------------------------------------------
# independent oracle: devkit eval_class transcription, GT-major layout
# ---------------------------------------------------------------------------

_NO_DETECTION = -10_000.0


def _oracle_clean(gt, cls, difficulty):
    care = []
    for name, d in zip(gt["name"], gt.get("difficulty", [0] * len(gt["name"]))):
        if name == cls:
            care.append(0 if d <= difficulty else 1)
        elif name in _NEIGHBORS.get(cls, ()):
            care.append(1)
        else:
            care.append(-1)
    return np.asarray(care, np.int32)


def _oracle_stats(ov_gt_dt, gt_care, dt_ign, scores, min_ov, thresh,
                  compute_fp, sim_gt_dt=None, dc_ioa=None):
    n_gt, n_dt = ov_gt_dt.shape
    assigned = [False] * n_dt
    ignored_threshold = [s < thresh for s in scores]
    tp = fp = fn = 0
    sim_total = 0.0
    thr_out = []
    for gi in range(n_gt):
        if gt_care[gi] == -1:
            continue
        det_idx = -1
        valid_detection = _NO_DETECTION
        max_overlap = 0.0
        assigned_ignored_det = False
        for di in range(n_dt):
            if dt_ign[di] == -1 or assigned[di] or ignored_threshold[di]:
                continue
            overlap = ov_gt_dt[gi, di]
            if overlap <= min_ov:
                continue
            if not compute_fp and scores[di] > valid_detection:
                det_idx = di
                valid_detection = scores[di]
            elif (compute_fp and dt_ign[di] == 0
                  and (overlap > max_overlap or assigned_ignored_det)):
                max_overlap = overlap
                det_idx = di
                valid_detection = 1.0
                assigned_ignored_det = False
            elif (compute_fp and dt_ign[di] == 1
                  and valid_detection == _NO_DETECTION):
                det_idx = di
                valid_detection = 1.0
                assigned_ignored_det = True
        if valid_detection == _NO_DETECTION:
            if gt_care[gi] == 0:
                fn += 1
        elif gt_care[gi] == 1 or dt_ign[det_idx] == 1:
            assigned[det_idx] = True
        else:
            tp += 1
            thr_out.append(scores[det_idx])
            assigned[det_idx] = True
            if sim_gt_dt is not None:
                sim_total += (1.0 + np.cos(sim_gt_dt[gi, det_idx])) / 2.0
    if compute_fp:
        for di in range(n_dt):
            if not (assigned[di] or dt_ign[di] != 0 or ignored_threshold[di]):
                fp += 1
        if dc_ioa is not None:
            for di in range(n_dt):
                if (dt_ign[di] == 0 and not assigned[di]
                        and not ignored_threshold[di]
                        and dc_ioa[di] > min_ov):
                    assigned[di] = True
                    fp -= 1
    return tp, fp, fn, thr_out, sim_total


def _oracle_thresholds(scores, num_gt):
    scores = sorted(scores, reverse=True)
    out = []
    current = 0.0
    for i, s in enumerate(scores):
        l_r = (i + 1) / num_gt
        r_r = (i + 2) / num_gt if i < len(scores) - 1 else l_r
        if (r_r - current) < (current - l_r) and i < len(scores) - 1:
            continue
        out.append(s)
        current += 1.0 / (_N_SAMPLE_PTS - 1)
    return out


def _oracle_eval(gt_annos, dt_annos, cls, difficulty, metric, min_ov):
    image_plane = metric in ("2d", "aos")
    prepped = []
    total_gt = 0
    for gt, dt in zip(gt_annos, dt_annos):
        if image_plane and ("bbox2d" not in gt or "bbox2d" not in dt):
            continue  # frame carries no image-plane data (main impl: None)
        care = _oracle_clean(gt, cls, difficulty)
        total_gt += int(np.sum(care == 0))
        sel = np.asarray(dt["name"]) == cls if len(dt["name"]) else np.zeros(0, bool)
        scores = np.asarray(dt["score"], np.float32)[sel]
        if image_plane:
            dt_bb = np.asarray(dt["bbox2d"], np.float32).reshape(-1, 4)[sel]
            gt_bb = np.asarray(gt["bbox2d"], np.float32).reshape(-1, 4)
            ov = box2d_iou(gt_bb, dt_bb)
            heights = dt_bb[:, 3] - dt_bb[:, 1]
            dt_ign = np.where(heights >= _MIN_HEIGHT[difficulty], 0, 1)
            dc = np.asarray(gt.get("dontcare", np.zeros((0, 4))), np.float32)
            dc = dc.reshape(-1, 4)
            dc_ioa = (np.max(box2d_ioa(dt_bb, dc), axis=1) if len(dc) and len(dt_bb)
                      else np.zeros(len(dt_bb)))
            sim = None
            if metric == "aos":
                sim = (np.asarray(gt["alpha"], np.float32)[:, None]
                       - np.asarray(dt["alpha"], np.float32)[sel][None, :])
        else:
            dtb = np.asarray(dt["boxes_3d"], np.float32).reshape(-1, 7)[sel]
            gtb = np.asarray(gt["boxes_3d"], np.float32).reshape(-1, 7)
            ov = _rotated_iou(gtb, dtb, metric)
            # mmdet3d computes ignored_dets from the projected 2D heights
            # ONCE (clean_data) and reuses them for bbox/bev/3d alike
            if "bbox2d" in dt:
                dt_bb = np.asarray(dt["bbox2d"], np.float32).reshape(-1, 4)[sel]
                heights = dt_bb[:, 3] - dt_bb[:, 1]
                dt_ign = np.where(heights >= _MIN_HEIGHT[difficulty], 0, 1)
            else:
                dt_ign = np.zeros(len(dtb), np.int32)
            dc_ioa = None
            sim = None
        prepped.append((ov, care, dt_ign, scores, dc_ioa, sim))
    if total_gt == 0:
        return 0.0
    all_thr = []
    for ov, care, dt_ign, scores, _, _ in prepped:
        _, _, _, t, _ = _oracle_stats(ov, care, dt_ign, scores, min_ov,
                                      -np.inf, False)
        all_thr.extend(t)
    thresholds = _oracle_thresholds(all_thr, total_gt)
    prec = np.zeros(_N_SAMPLE_PTS)
    for ti, t in enumerate(thresholds):
        tp = fp = 0
        sim_total = 0.0
        for ov, care, dt_ign, scores, dc_ioa, sim in prepped:
            tpi, fpi, _, _, simi = _oracle_stats(
                ov, care, dt_ign, scores, min_ov, t, True,
                sim_gt_dt=sim, dc_ioa=dc_ioa)
            tp += tpi
            fp += fpi
            sim_total += simi
        num = sim_total if metric == "aos" else float(tp)
        prec[ti] = num / max(tp + fp, 1)
    for i in range(_N_SAMPLE_PTS - 2, -1, -1):
        prec[i] = max(prec[i], prec[i + 1])
    return float(np.sum(prec[1:]) / 40.0 * 100.0)


# ---------------------------------------------------------------------------
# golden scenes
# ---------------------------------------------------------------------------


def _box(x, y, yaw=0.0, dims=(3.9, 1.6, 1.56), z=-1.0):
    return [x, y, z, *dims, yaw]


def _ped(x, y, yaw=0.0):
    return [x, y, -1.0, 0.8, 0.6, 1.73, yaw]


def make_golden_scenes():
    gts, dts = [], []

    def with_image(anno, boxes, dontcare=None):
        boxes = np.asarray(boxes, np.float32).reshape(-1, 7)
        anno["bbox2d"] = project_boxes_to_image(boxes, CALIB)
        anno["alpha"] = detection_alphas(boxes, CALIB)
        if dontcare is not None:
            anno["dontcare"] = np.asarray(dontcare, np.float32).reshape(-1, 4)
        return anno

    # frame 1: difficulties + Van absorption + open-space FP above the TPs
    g1 = [_box(8, 4, 0.2), _box(14, -5, -0.4), _box(20, 6, 0.9), _box(11, -2, 0.1)]
    gts.append({
        "name": np.array(["Car", "Car", "Car", "Van"]),
        "boxes_3d": np.asarray(g1, np.float32),
        "difficulty": np.array([0, 1, 2, 0], np.int32),
    })
    d1 = g1[:3] + [g1[3], _box(35, 15)]
    dts.append({
        "name": np.array(["Car"] * 5),
        "boxes_3d": np.asarray(d1, np.float32),
        "score": np.array([0.95, 0.82, 0.58, 0.88, 0.97], np.float32),
    })

    # frame 2: pedestrians + Person_sitting absorption + a cyclist
    g2 = [_ped(6, 1), _ped(9, -2, 0.5), _ped(12, 3), [7, -4, -1.0, 1.76, 0.6, 1.73, 0.3]]
    gts.append({
        "name": np.array(["Pedestrian", "Pedestrian", "Person_sitting",
                          "Cyclist"]),
        "boxes_3d": np.asarray(g2, np.float32),
        "difficulty": np.array([0, 0, 0, 1], np.int32),
    })
    d2 = [g2[0], g2[1], g2[2], g2[3], _ped(20, 8)]
    dts.append({
        "name": np.array(["Pedestrian", "Pedestrian", "Pedestrian", "Cyclist",
                          "Pedestrian"]),
        "boxes_3d": np.asarray(d2, np.float32),
        "score": np.array([0.9, 0.6, 0.75, 0.8, 0.7], np.float32),
    })

    # frame 3 (image-plane): DontCare + min-height + AOS flip
    g3 = [_box(10, 5, 0.3), _box(10, -5, -0.3)]
    stray = _box(15, -1)
    stray_bb = project_boxes_to_image(np.asarray([stray], np.float32), CALIB)[0]
    gt3 = {
        "name": np.array(["Car", "Car"]),
        "boxes_3d": np.asarray(g3, np.float32),
        "difficulty": np.array([0, 0], np.int32),
    }
    gts.append(with_image(gt3, g3, dontcare=[stray_bb + np.array([-4, -4, 4, 4])]))
    flipped = list(g3[1])
    flipped[6] += np.pi  # heading flipped: 2D box identical, AOS sim 0
    tiny = _box(62, 2)   # ~18 px: below every min height
    d3 = [g3[0], flipped, stray, tiny]
    dt3 = {
        "name": np.array(["Car"] * 4),
        "boxes_3d": np.asarray(d3, np.float32),
        "score": np.array([0.85, 0.65, 0.99, 0.93], np.float32),
    }
    dt3 = with_image(dt3, d3)
    dts.append(dt3)

    # frame 4: borderline IoU + z-lifted det (3d vs bev) + rotated boxes
    g4 = [_box(9, 0, 0.6), _box(16, 4, -1.1)]
    near_miss = list(g4[0])
    near_miss[0] += 0.55  # IoU ~0.66: below Car 0.7, above 0.5
    lifted = list(g4[1])
    lifted[2] += 0.65     # 3d IoU drops below 0.7, BEV unchanged
    gts.append({
        "name": np.array(["Car", "Car"]),
        "boxes_3d": np.asarray(g4, np.float32),
        "difficulty": np.array([0, 0], np.int32),
    })
    dts.append({
        "name": np.array(["Car", "Car"]),
        "boxes_3d": np.asarray([near_miss, lifted], np.float32),
        "score": np.array([0.9, 0.7], np.float32),
    })

    # frame 5: 12 cars, interleaved FPs (threshold-walk pressure)
    g5 = [_box(6 + 5 * i, 7 if i % 2 else -7, 0.1 * i) for i in range(12)]
    gts.append({
        "name": np.array(["Car"] * 12),
        "boxes_3d": np.asarray(g5, np.float32),
        "difficulty": np.array([i % 3 for i in range(12)], np.int32),
    })
    d5 = g5[:10] + [_box(30, 20), _box(40, -20), _box(55, 18)]
    s5 = [0.98 - 0.07 * i for i in range(10)] + [0.93, 0.62, 0.33]
    dts.append({
        "name": np.array(["Car"] * 13),
        "boxes_3d": np.asarray(d5, np.float32),
        "score": np.array(s5, np.float32),
    })

    # frame 6: no GTs (pure FPs) and frame 7: GTs with no detections
    gts.append({
        "name": np.array([], dtype="<U10"),
        "boxes_3d": np.zeros((0, 7), np.float32),
        "difficulty": np.zeros(0, np.int32),
    })
    dts.append({
        "name": np.array(["Car", "Pedestrian"]),
        "boxes_3d": np.asarray([_box(10, 0), _ped(8, 2)], np.float32),
        "score": np.array([0.91, 0.55], np.float32),
    })
    gts.append({
        "name": np.array(["Car", "Cyclist"]),
        "boxes_3d": np.asarray([_box(12, 2), [9, -3, -1.0, 1.76, 0.6, 1.73, 0]],
                               np.float32),
        "difficulty": np.array([0, 0], np.int32),
    })
    dts.append({
        "name": np.array([], dtype="<U10"),
        "boxes_3d": np.zeros((0, 7), np.float32),
        "score": np.zeros(0, np.float32),
    })
    return gts, dts


_THR = {"Car": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}

# frozen literals (generated once from the oracle; regression tripwire for
# correlated drift of both implementations). Values in percent.
GOLDEN = {
    ("Car", "3d", 0): 7.5,
    ("Car", "3d", 1): 15.277777777777779,
    ("Car", "3d", 2): 23.863636363636363,
    ("Car", "bev", 0): 10.0,
    ("Car", "bev", 1): 18.33333333333333,
    ("Car", "bev", 2): 27.272727272727277,
    ("Car", "2d", 0): 2.5,
    ("Car", "aos", 0): 1.25,
    ("Pedestrian", "3d", 0): 1.6666666666666667,
    ("Pedestrian", "3d", 2): 1.6666666666666667,
}


@pytest.mark.parametrize("cls", ["Car", "Pedestrian", "Cyclist"])
@pytest.mark.parametrize("metric", ["3d", "bev", "2d", "aos"])
def test_matches_oracle(cls, metric):
    gts, dts = make_golden_scenes()
    res = eval_kitti_ap(gts, dts, classes=(cls,), metric=metric,
                        iou_thresholds=_THR)
    for diff, dname in enumerate(("easy", "moderate", "hard")):
        key = f"{cls}_{metric}_{dname}"
        if key not in res:
            continue
        want = _oracle_eval(gts, dts, cls, diff, metric, _THR[cls])
        assert res[key] == pytest.approx(want, abs=1e-9), (key, res[key], want)


def test_frozen_literals():
    gts, dts = make_golden_scenes()
    for (cls, metric, diff), want in GOLDEN.items():
        res = eval_kitti_ap(gts, dts, classes=(cls,), metric=metric,
                            iou_thresholds=_THR)
        key = f"{cls}_{metric}_{('easy', 'moderate', 'hard')[diff]}"
        assert res[key] == pytest.approx(want, abs=1e-6), (key, res[key])


class TestRuleSensitivity:
    """Each protocol rule, when broken, must move the golden number."""

    def _base(self):
        return make_golden_scenes()

    def test_van_ignore_matters(self):
        gts, dts = self._base()
        base = eval_kitti_ap(gts, dts, classes=("Car",), metric="3d")["Car_3d_easy"]
        gts[0]["name"] = np.array(["Car", "Car", "Car", "Truck"])  # Van -> no ignore
        broken = eval_kitti_ap(gts, dts, classes=("Car",), metric="3d")["Car_3d_easy"]
        assert broken != pytest.approx(base, abs=1e-9)

    def test_person_sitting_ignore_matters(self):
        gts, dts = self._base()
        key = "Pedestrian_3d_easy"
        base = eval_kitti_ap(gts, dts, classes=("Pedestrian",), metric="3d")[key]
        gts[1]["name"] = np.array(
            ["Pedestrian", "Pedestrian", "Truck", "Cyclist"])
        broken = eval_kitti_ap(gts, dts, classes=("Pedestrian",), metric="3d")[key]
        assert broken != pytest.approx(base, abs=1e-9)

    def test_dontcare_matters(self):
        gts, dts = self._base()
        key = "Car_2d_easy"
        base = eval_kitti_ap(gts, dts, classes=("Car",), metric="2d")[key]
        gts[2].pop("dontcare")
        broken = eval_kitti_ap(gts, dts, classes=("Car",), metric="2d")[key]
        assert broken != pytest.approx(base, abs=1e-9)

    def test_alpha_matters_for_aos(self):
        gts, dts = self._base()
        key = "Car_aos_easy"
        base = eval_kitti_ap(gts, dts, classes=("Car",), metric="aos")[key]
        dts[2]["alpha"] = np.asarray(gts[2]["alpha"], np.float32)[
            [0, 1, 0, 0]]  # pretend perfect-ish orientations
        broken = eval_kitti_ap(gts, dts, classes=("Car",), metric="aos")[key]
        assert broken != pytest.approx(base, abs=1e-9)

    def test_difficulty_filter_matters(self):
        gts, dts = self._base()
        res = eval_kitti_ap(gts, dts, classes=("Car",), metric="3d")
        assert res["Car_3d_easy"] != pytest.approx(res["Car_3d_hard"], abs=1e-9)
