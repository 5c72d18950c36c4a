"""Rotated and circle NMS under jit (static shapes).

Replaces the mmcv CUDA rotated-NMS op the reference's test_cfg invokes
(use_rotate_nms=True, nms_thr=0.01, score_thr=0.1, nms_pre=100, max_num=50 —
reference configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:113-120)
and the circle NMS CenterPoint uses (checkpoint `...circlenms...`, reference
configs/adversarial/adversarial-centerpoint_voxel-nuscenes.py:88).

Strategy: top-k pre-selection, one dense pairwise matrix, then a sequential
suppression sweep in `lax.fori_loop` — O(nms_pre^2) work, tiny at nms_pre=100.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import boxes as box_ops


def _suppression_sweep(affinity: jnp.ndarray, valid: jnp.ndarray, thr: float) -> jnp.ndarray:
    """Greedy NMS keep-mask given a pairwise affinity matrix.

    Boxes must already be sorted by descending score. affinity [N, N]; a later
    box is suppressed when affinity with an earlier *kept* box exceeds thr.
    """
    n = affinity.shape[0]
    idx = jnp.arange(n)

    def body(i, keep):
        earlier = (idx < i) & keep
        suppressed = jnp.any(earlier & (affinity[:, i] > thr))
        return keep.at[i].set(valid[i] & ~suppressed)

    return jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))


def rotated_nms(
    bev_boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Rotated-BEV NMS. bev_boxes [N,5] sorted by descending score -> keep [N]."""
    iou = box_ops.rotated_bev_iou(bev_boxes, bev_boxes)
    return _suppression_sweep(iou, valid, iou_threshold)


def circle_nms(
    centers: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
) -> jnp.ndarray:
    """Circle NMS (CenterPoint): suppress when center distance^2 < radius^2.

    centers [N,2] sorted by descending score -> keep [N].
    """
    d2 = jnp.sum((centers[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    # affinity = -dist^2, threshold = -radius^2  (suppress when closer)
    return _suppression_sweep(-d2, valid, -(radius**2))


def topk_nms_3d(
    boxes3d: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    score_thr: float = 0.1,
    nms_pre: int = 100,
    iou_thr: float = 0.01,
    max_num: int = 50,
    use_rotate_nms: bool = True,
    circle_radius: float = 4.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full post-processing: score filter -> top-k -> NMS -> cap at max_num.

    Args:
        boxes3d: [A, 7] decoded boxes. scores [A], labels [A], valid [A].
    Returns:
        (boxes [max_num, 7], scores [max_num], labels [max_num], mask [max_num])
        — fixed-size outputs with `mask` marking real detections.
    """
    nms_pre = min(nms_pre, boxes3d.shape[0])
    scores = jnp.where(valid & (scores > score_thr), scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(scores, nms_pre)
    top_boxes = boxes3d[top_idx]
    top_labels = labels[top_idx]
    top_valid = top_scores > 0.0

    if use_rotate_nms:
        keep = rotated_nms(box_ops.boxes3d_to_bev(top_boxes), top_scores, top_valid, iou_thr)
    else:
        keep = circle_nms(top_boxes[:, :2], top_valid, circle_radius)

    kept_scores = jnp.where(keep, top_scores, -1.0)
    final_scores, sel = jax.lax.top_k(kept_scores, min(max_num, nms_pre))
    final_mask = final_scores > 0.0
    return top_boxes[sel], final_scores, top_labels[sel], final_mask
