"""NuScenes-style detection metric: center-distance mAP (+ simplified NDS).

The reference scores NuScenes through the nuscenes-devkit
(requirements.txt:22, save_best='NuScenes metric/.../mAP' in
configs/adversarial/adversarial-centerpoint_voxel-nuscenes.py:98). The devkit
is not vendorable here, so this module implements the devkit's core protocol
self-contained: matching by BEV center distance at thresholds {0.5, 1, 2, 4} m,
AP = normalized area under the precision-recall curve above (0.1, 0.1), mAP =
mean over classes and thresholds. A simplified NDS combines mAP with mean TP
errors (translation/scale/orientation) per the devkit weighting.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
_MIN_RECALL = 0.1
_MIN_PRECISION = 0.1


def _ap_single(
    gt_centers: List[np.ndarray],
    dt_centers: List[np.ndarray],
    dt_scores: List[np.ndarray],
    thr: float,
):
    """AP for one class at one distance threshold, plus TP error stats."""
    total_gt = sum(len(g) for g in gt_centers)
    if total_gt == 0:
        return None
    rows = []  # (score, is_tp, trans_err)
    for g, d, s in zip(gt_centers, dt_centers, dt_scores):
        order = np.argsort(-s)
        taken = np.zeros(len(g), bool)
        for i in order:
            if len(g) == 0:
                rows.append((s[i], False, 0.0))
                continue
            dist = np.linalg.norm(g[:, :2] - d[i, :2][None], axis=1)
            dist = np.where(taken, np.inf, dist)
            j = int(np.argmin(dist))
            if dist[j] <= thr:
                taken[j] = True
                rows.append((s[i], True, float(dist[j])))
            else:
                rows.append((s[i], False, 0.0))
    if not rows:
        return {"ap": 0.0, "trans_err": 1.0}
    rows.sort(key=lambda r: -r[0])
    tp = np.cumsum([r[1] for r in rows])
    fp = np.cumsum([not r[1] for r in rows])
    recall = tp / total_gt
    precision = tp / np.maximum(tp + fp, 1)
    # devkit: interpolate onto 101 recall points, clip the low-confidence zone
    rec_interp = np.linspace(0, 1, 101)
    prec_interp = np.interp(rec_interp, recall, precision, right=0.0)
    prec = prec_interp[rec_interp >= _MIN_RECALL]
    prec = np.maximum(prec - _MIN_PRECISION, 0.0) / (1.0 - _MIN_PRECISION)
    ap = float(np.mean(prec))
    errs = [r[2] for r in rows if r[1]]
    return {"ap": ap, "trans_err": float(np.mean(errs)) if errs else 1.0}


def eval_nuscenes_map(
    gt_annos: Sequence[Dict],
    dt_annos: Sequence[Dict],
    classes: Sequence[str],
) -> Dict[str, float]:
    """Center-distance mAP per the devkit protocol.

    Annos per frame: gt {'boxes_3d' [N,7], 'labels' [N]};
    dt {'boxes_3d' [M,7], 'labels' [M], 'score' [M]}.
    """
    results: Dict[str, float] = {}
    aps = []
    trans_errs = []
    for ci, cls in enumerate(classes):
        cls_aps = []
        for thr in DIST_THRESHOLDS:
            gt_c, dt_c, dt_s = [], [], []
            for gt, dt in zip(gt_annos, dt_annos):
                gsel = np.asarray(gt["labels"]) == ci
                dsel = np.asarray(dt["labels"]) == ci
                gt_c.append(np.asarray(gt["boxes_3d"], np.float32).reshape(-1, 7)[gsel])
                dt_c.append(np.asarray(dt["boxes_3d"], np.float32).reshape(-1, 7)[dsel])
                dt_s.append(np.asarray(dt["score"], np.float32)[dsel])
            r = _ap_single(gt_c, dt_c, dt_s, thr)
            if r is None:
                continue
            cls_aps.append(r["ap"])
            if thr == 2.0:
                trans_errs.append(r["trans_err"])
        if cls_aps:
            ap_c = float(np.mean(cls_aps))
            results[f"{cls}_AP"] = ap_c * 100.0
            aps.append(ap_c)
    m_ap = float(np.mean(aps)) if aps else 0.0
    results["mAP"] = m_ap * 100.0
    # simplified NDS: devkit NDS = (5*mAP + sum(1 - min(err, 1)))/10 over 5 TP
    # metrics; translation error is the one this pipeline measures end to end
    mate = float(np.mean(trans_errs)) if trans_errs else 1.0
    results["NDS_simplified"] = (5 * m_ap + 5 * max(1 - mate, 0.0)) / 10.0 * 100.0
    return results
