"""Detection losses: sigmoid focal, smooth-L1, cross-entropy, gaussian focal.

Equivalents of the mmdet losses the reference configures
(FocalLoss gamma=2 alpha=0.25, SmoothL1Loss beta=1/9 weight=2, direction
CrossEntropyLoss weight=0.2 — reference
configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:56-69)
plus the gaussian focal loss CenterPoint's heatmap head uses. All take explicit
per-element weights and an `avg_factor` so masked/padded batches stay correct
under static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    gamma: float = 2.0,
    alpha: float = 0.25,
    avg_factor: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """Sigmoid focal loss.

    Args:
        logits: [..., C] raw scores.
        targets: [..., C] one-hot (background = all-zeros row).
        weight: [...] optional per-anchor weight.
        avg_factor: normalizer (typically num positive anchors).
    """
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    loss = alpha_t * ((1.0 - p_t) ** gamma) * ce
    loss = jnp.sum(loss, axis=-1)
    if weight is not None:
        loss = loss * weight
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def smooth_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    beta: float = 1.0 / 9.0,
    avg_factor: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """Huber/smooth-L1. pred/target [..., D], weight [...] or [..., D]."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    if weight is not None:
        if weight.ndim == loss.ndim - 1:
            weight = weight[..., None]
        loss = loss * weight
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    avg_factor: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """Softmax cross entropy with integer labels. logits [..., C], labels [...].

    The label pick is a one-hot mask-sum, not ``take_along_axis``: on TPU the
    per-row gather of a scalar from a C-wide row runs ~13 ns/row and its
    backward is a serialized scatter — together 17 ms/step for the 1.27M-anchor
    direction loss (trace attribution, PARITY.md round-5). The mask-sum is
    elementwise both ways and exact (products with the 0/1 mask are exact in
    f32; exactly one term per row is nonzero).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    c = logits.shape[-1]
    onehot = (labels[..., None].astype(jnp.int32)
              == jnp.arange(c, dtype=jnp.int32)).astype(logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    if weight is not None:
        nll = nll * weight
    return jnp.sum(nll) / jnp.maximum(avg_factor, 1.0)


def gaussian_focal_loss(
    pred: jnp.ndarray,
    gaussian_target: jnp.ndarray,
    alpha: float = 2.0,
    gamma: float = 4.0,
    avg_factor: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """CornerNet-style gaussian focal loss for CenterPoint heatmaps.

    Args:
        pred: [...] heatmap probabilities in (0, 1).
        gaussian_target: [...] gaussian-splatted targets; exactly-1.0 marks
            positive centers.
    """
    # NOTE: 1 - 1e-8 rounds to exactly 1.0 in float32, so the upper clip must
    # be wider than _EPS or log(1 - pred) still hits log(0) at saturation —
    # the first on-chip CenterPoint bench NaN'd through exactly this (v5e,
    # 2026-08-19). Prefer gaussian_focal_loss_logits for new call sites.
    pred = jnp.clip(pred, _EPS, 1.0 - 1e-6)
    pos_w = (gaussian_target == 1.0).astype(pred.dtype)
    neg_w = (1.0 - gaussian_target) ** gamma
    pos_loss = -jnp.log(pred) * ((1.0 - pred) ** alpha) * pos_w
    neg_loss = -jnp.log(1.0 - pred) * (pred**alpha) * neg_w * (1.0 - pos_w)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / jnp.maximum(avg_factor, 1.0)


def gaussian_focal_loss_logits(
    logits: jnp.ndarray,
    gaussian_target: jnp.ndarray,
    alpha: float = 2.0,
    gamma: float = 4.0,
    avg_factor: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """Logit-space gaussian focal loss — saturation-proof form.

    Mathematically identical to ``gaussian_focal_loss(sigmoid(logits), ...)``
    but computes log(pred) = log_sigmoid(x) and log(1-pred) = log_sigmoid(-x)
    directly, so neither the value nor the gradient can become non-finite at
    any logit magnitude (sigmoid saturates to exactly 0/1 in f32 around
    |x|>17 and in bf16 around |x|>6; the clipped-probability form then takes
    log(0) and its VJP produces inf*0 = NaN).
    """
    logits = logits.astype(jnp.float32)
    pred = jax.nn.sigmoid(logits)
    pos_w = (gaussian_target == 1.0).astype(jnp.float32)
    neg_w = (1.0 - gaussian_target) ** gamma
    pos_loss = -jax.nn.log_sigmoid(logits) * ((1.0 - pred) ** alpha) * pos_w
    neg_loss = -jax.nn.log_sigmoid(-logits) * (pred**alpha) * neg_w * (1.0 - pos_w)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / jnp.maximum(avg_factor, 1.0)


def l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    avg_factor: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    loss = jnp.abs(pred - target)
    if weight is not None:
        if weight.ndim == loss.ndim - 1:
            weight = weight[..., None]
        loss = loss * weight
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def add_sin_difference(pred_rot: jnp.ndarray, gt_rot: jnp.ndarray):
    """Rotation residual via the sin-difference trick (`diff_rad_by_sin`).

    Replaces (pred_r, gt_r) with (sin(pr)cos(gr), cos(pr)sin(gr)) so the L1
    residual equals sin(pr - gr) — periodic and smooth (reference config
    adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:54).
    """
    new_pred = jnp.sin(pred_rot) * jnp.cos(gt_rot)
    new_gt = jnp.cos(pred_rot) * jnp.sin(gt_rot)
    return new_pred, new_gt
