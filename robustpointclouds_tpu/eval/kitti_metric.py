"""KITTI 3D detection AP metric (R40 protocol), numpy implementation.

Replaces mmdet3d's `KittiMetric`, whose rotated-IoU core is numba-CUDA in the
reference stack (requirements.txt:17; the eval scripts actively re-enable CUDA
for it, evaluate_kitti_3class.py:52-54). Scoring runs on host numpy — it is
not a training-path op — with the rotated BEV/3D IoU evaluated through the
framework's own jitted geometry (ops/boxes.py) on CPU.

Protocol (official KITTI object devkit, 40 recall points):
  * per class & difficulty: GTs filtered by difficulty; harder GTs and
    same-class "ignored" neighbors (Van for Car, Person_sitting for
    Pedestrian) neither count as FN nor penalize matched detections
  * score thresholds sampled from matched-detection scores at 40 recall
    positions; precision = max precision at recall >= r, averaged.

Current deviations from the full devkit (tracked for parity work): DontCare
regions and the image-plane 2D/AOS metrics are not implemented (the rebuild is
LiDAR-only end to end); difficulty comes from the annotation's difficulty
field (the readers compute it from truncation/occlusion/bbox height when
available).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

# classes whose GTs are "ignored" (not FN, matches not FP) when evaluating the key class
_IGNORED_NEIGHBORS = {
    "Car": ("Van",),
    "Pedestrian": ("Person_sitting",),
    "Cyclist": (),
}

_DEFAULT_IOU_THR = {"Car": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}
_N_SAMPLE_PTS = 41


def _rotated_iou(dt_boxes: np.ndarray, gt_boxes: np.ndarray, metric: str) -> np.ndarray:
    """IoU matrix [n_dt, n_gt] via the framework's jitted geometry on CPU."""
    if len(dt_boxes) == 0 or len(gt_boxes) == 0:
        return np.zeros((len(dt_boxes), len(gt_boxes)), np.float32)
    import jax
    import jax.numpy as jnp

    from ..ops import boxes as box_ops

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        a = jnp.asarray(dt_boxes, jnp.float32)
        b = jnp.asarray(gt_boxes, jnp.float32)
        if metric == "bev":
            iou = box_ops.rotated_bev_iou(
                box_ops.boxes3d_to_bev(a), box_ops.boxes3d_to_bev(b)
            )
        else:
            iou = box_ops.rotated_iou_3d(a, b)
        return np.asarray(iou)


def _clean_gt(anno: Dict, class_name: str, difficulty: int):
    """Split GTs into counted (0), ignored (1), and excluded (-1)."""
    names = anno["name"]
    diffs = anno.get("difficulty", np.zeros(len(names), np.int32))
    care = np.full(len(names), -1, np.int32)
    for i, (n, d) in enumerate(zip(names, diffs)):
        if n == class_name:
            if 0 <= d <= difficulty:
                care[i] = 0
            else:
                care[i] = 1  # same class, harder difficulty: ignore
        elif n in _IGNORED_NEIGHBORS.get(class_name, ()):
            care[i] = 1
    return care


def _compute_statistics(
    iou: np.ndarray,
    dt_scores: np.ndarray,
    gt_care: np.ndarray,
    dt_valid: np.ndarray,
    min_overlap: float,
    thresh: float,
    compute_fp: bool,
):
    """One image, one threshold: greedy max-IoU matching per the devkit."""
    n_dt, n_gt = iou.shape
    assigned = np.zeros(n_dt, bool)
    ignored_det = np.zeros(n_dt, bool)
    tp = fp = fn = 0
    thresholds = []
    for j in range(n_gt):
        if gt_care[j] != 0:
            continue
        det_idx = -1
        max_iou = min_overlap
        for i in range(n_dt):
            if not dt_valid[i] or assigned[i] or dt_scores[i] < thresh:
                continue
            if iou[i, j] > max_iou:
                max_iou = iou[i, j]
                det_idx = i
        if det_idx >= 0:
            tp += 1
            assigned[det_idx] = True
            thresholds.append(dt_scores[det_idx])
        else:
            fn += 1
    if compute_fp:
        # detections matching ignored GTs are not FPs
        for i in range(n_dt):
            if not dt_valid[i] or assigned[i] or dt_scores[i] < thresh:
                continue
            for j in range(n_gt):
                if gt_care[j] == 1 and iou[i, j] > min_overlap:
                    ignored_det[i] = True
                    break
        fp = int(np.sum(dt_valid & ~assigned & ~ignored_det & (dt_scores >= thresh)))
    return tp, fp, fn, thresholds


def eval_kitti_ap(
    gt_annos: Sequence[Dict],
    dt_annos: Sequence[Dict],
    classes: Sequence[str] = ("Car", "Pedestrian", "Cyclist"),
    difficulties: Sequence[int] = (0, 1, 2),
    metric: str = "3d",
    iou_thresholds: Optional[Dict[str, float]] = None,
) -> Dict[str, float]:
    """AP_R40 per (class, difficulty).

    Args:
        gt_annos/dt_annos: per-image dicts with keys
            'name' [N] str, 'boxes_3d' [N, 7] (center-z convention),
            'difficulty' [N] int (gt only), 'score' [N] (dt only).
        metric: '3d' or 'bev'.
    Returns:
        {'Car_3d_easy': AP, ...} in percent.
    """
    assert len(gt_annos) == len(dt_annos)
    iou_thresholds = iou_thresholds or _DEFAULT_IOU_THR
    results: Dict[str, float] = {}

    # cache IoU matrices (shared across difficulties/thresholds)
    for cls in classes:
        min_overlap = iou_thresholds.get(cls, 0.5)
        per_image = []
        for gt, dt in zip(gt_annos, dt_annos):
            dt_sel = np.asarray(dt["name"]) == cls if len(dt["name"]) else np.zeros(0, bool)
            dt_boxes = np.asarray(dt["boxes_3d"], np.float32).reshape(-1, 7)[dt_sel]
            dt_scores = np.asarray(dt["score"], np.float32)[dt_sel]
            gt_boxes = np.asarray(gt["boxes_3d"], np.float32).reshape(-1, 7)
            iou = _rotated_iou(dt_boxes, gt_boxes, metric)
            per_image.append((iou, dt_scores, gt, np.ones(len(dt_scores), bool)))

        for diff in difficulties:
            gt_cares = [_clean_gt(gt, cls, diff) for (_, _, gt, _) in per_image]
            total_gt = sum(int(np.sum(c == 0)) for c in gt_cares)
            diff_name = ("easy", "moderate", "hard")[diff]
            key = f"{cls}_{metric}_{diff_name}"
            if total_gt == 0:
                results[key] = 0.0
                continue

            # pass 1: matched scores at threshold -inf -> recall thresholds.
            # For each of the 40 recall sample points r_i, the score threshold
            # is the score of the ceil(r_i * total_gt)-th best matched
            # detection. (The devkit walks matched scores and advances a
            # recall cursor — identical in the large-sample limit, but exact
            # here for small fixture sets too.)
            all_scores: List[float] = []
            for (iou, scores, _, valid), care in zip(per_image, gt_cares):
                _, _, _, ts = _compute_statistics(
                    iou, scores, care, valid, min_overlap, -np.inf, False
                )
                all_scores.extend(ts)
            all_scores = np.sort(np.asarray(all_scores))[::-1]

            sample_thresholds = np.full(_N_SAMPLE_PTS, np.nan)
            for i in range(1, _N_SAMPLE_PTS):
                r = i / (_N_SAMPLE_PTS - 1)
                needed = int(np.ceil(r * total_gt - 1e-9))
                if 0 < needed <= len(all_scores):
                    sample_thresholds[i] = all_scores[needed - 1]

            # pass 2: pr curve at the unique sampled thresholds
            precisions = np.zeros(_N_SAMPLE_PTS)
            prec_cache: Dict[float, float] = {}
            for i in range(1, _N_SAMPLE_PTS):
                t = sample_thresholds[i]
                if np.isnan(t):
                    continue
                if t not in prec_cache:
                    tp = fp = fn = 0
                    for (iou, scores, _, valid), care in zip(per_image, gt_cares):
                        tpi, fpi, fni, _ = _compute_statistics(
                            iou, scores, care, valid, min_overlap, t, True
                        )
                        tp += tpi
                        fp += fpi
                        fn += fni
                    prec_cache[t] = tp / max(tp + fp, 1)
                precisions[i] = prec_cache[t]
            # right-max smoothing
            for i in range(_N_SAMPLE_PTS - 2, -1, -1):
                precisions[i] = max(precisions[i], precisions[i + 1])
            # R40: average over sample points 1..40 (skip recall 0)
            results[key] = float(np.mean(precisions[1:]) * 100.0)
    return results


class KittiMetric:
    """Accumulating evaluator mirroring the reference's val_evaluator surface
    (configs/_base_/kitti-3d-car.py:159-165)."""

    def __init__(
        self,
        classes: Sequence[str] = ("Car", "Pedestrian", "Cyclist"),
        metrics: Sequence[str] = ("3d", "bev"),
    ):
        self.classes = list(classes)
        self.metrics = list(metrics)
        self._gt: List[Dict] = []
        self._dt: List[Dict] = []

    def update(self, gt_anno: Dict, dt_anno: Dict):
        self._gt.append(gt_anno)
        self._dt.append(dt_anno)

    def update_from_arrays(
        self,
        gt_boxes: np.ndarray,
        gt_labels: np.ndarray,
        gt_mask: np.ndarray,
        dt_boxes: np.ndarray,
        dt_scores: np.ndarray,
        dt_labels: np.ndarray,
        dt_mask: np.ndarray,
        gt_difficulty: Optional[np.ndarray] = None,
    ):
        """Convenience adapter from the framework's padded batch arrays."""
        gm = np.asarray(gt_mask, bool)
        dm = np.asarray(dt_mask, bool)
        names = np.asarray(self.classes)
        self.update(
            {
                "name": names[np.asarray(gt_labels)[gm]],
                "boxes_3d": np.asarray(gt_boxes)[gm],
                "difficulty": (
                    np.asarray(gt_difficulty)[gm]
                    if gt_difficulty is not None
                    else np.zeros(int(gm.sum()), np.int32)
                ),
            },
            {
                "name": names[np.asarray(dt_labels)[dm]],
                "boxes_3d": np.asarray(dt_boxes)[dm],
                "score": np.asarray(dt_scores)[dm],
            },
        )

    def compute(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for m in self.metrics:
            out.update(eval_kitti_ap(self._gt, self._dt, self.classes, metric=m))
        # headline mAP: mean over classes at moderate difficulty, 3d
        mods = [v for k, v in out.items() if k.endswith("_3d_moderate")]
        if mods:
            out["mAP_3d_moderate"] = float(np.mean(mods))
        return out

    def reset(self):
        self._gt.clear()
        self._dt.clear()
