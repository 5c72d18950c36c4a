"""Max-IoU anchor-to-GT assignment (vectorized, static shapes).

Equivalent of mmdet3d's `Max3DIoUAssigner` + `BboxOverlapsNearest3D` with the
per-class thresholds the reference configures (Car 0.6/0.45, Ped/Cyc 0.35/0.2
— reference configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:87-109).

Assignment output per anchor:
  * label in [0, num_classes): positive, matched to that class's GT
  * label == -1: negative (background)
  * label == -2: ignore (IoU between neg_thr and pos_thr)
GT boxes arrive padded to a static max count with a validity mask.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp

from . import boxes as box_ops


class AssignResult(NamedTuple):
    labels: jnp.ndarray        # [A] int32: class id, -1 neg, -2 ignore
    matched_gt: jnp.ndarray    # [A] int32 index into the GT array (valid where pos)
    max_iou: jnp.ndarray       # [A] float
    pos_mask: jnp.ndarray      # [A] bool
    neg_mask: jnp.ndarray      # [A] bool


def assign(
    anchors: jnp.ndarray,
    anchor_classes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    pos_iou_thr: Sequence[float],
    neg_iou_thr: Sequence[float],
    min_pos_iou: Sequence[float],
) -> AssignResult:
    """Assign anchors to GTs with class-matched nearest-BEV IoU.

    Args:
        anchors: [A, 7]; anchor_classes [A] int32.
        gt_boxes: [G, 7] padded; gt_labels [G] int32; gt_mask [G] bool.
        *_iou_thr: per-class thresholds, length = num_classes.
    """
    num_classes = len(pos_iou_thr)
    iou = box_ops.nearest_bev_iou(anchors, gt_boxes)  # [A, G]
    class_match = anchor_classes[:, None] == gt_labels[None, :]
    iou = jnp.where(class_match & gt_mask[None, :], iou, -1.0)

    max_iou = jnp.max(iou, axis=1)
    argmax_gt = jnp.argmax(iou, axis=1).astype(jnp.int32)

    pos_thr = jnp.asarray(pos_iou_thr)[anchor_classes]
    neg_thr = jnp.asarray(neg_iou_thr)[anchor_classes]

    pos = max_iou >= pos_thr
    neg = (max_iou < neg_thr)  # includes anchors with no same-class GT (iou -1)

    # GT-wise forcing: each GT claims its best same-class anchor when that
    # best IoU >= the class's min_pos_iou (keeps hard GTs represented).
    gt_best_iou = jnp.max(iou, axis=0)  # [G]
    gt_best_anchor = jnp.argmax(iou, axis=0)  # [G]
    min_thr = jnp.where(
        gt_mask, jnp.asarray(min_pos_iou)[jnp.clip(gt_labels, 0, num_classes - 1)], jnp.inf
    )
    force = gt_mask & (gt_best_iou >= min_thr)
    forced_pos = jnp.zeros_like(pos).at[jnp.where(force, gt_best_anchor, 0)].max(force)
    forced_gt_idx = (
        jnp.full(pos.shape, -1, jnp.int32)
        .at[jnp.where(force, gt_best_anchor, 0)]
        .max(jnp.where(force, jnp.arange(gt_boxes.shape[0], dtype=jnp.int32), -1))
    )

    pos = pos | forced_pos
    neg = neg & ~pos
    matched = jnp.where(forced_pos & (forced_gt_idx >= 0), forced_gt_idx, argmax_gt)

    labels = jnp.where(
        pos,
        gt_labels[matched],
        jnp.where(neg, -1, -2),
    ).astype(jnp.int32)
    return AssignResult(labels, matched, max_iou, pos, neg)
