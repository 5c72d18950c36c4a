"""VoxelNet / AdversarialVoxelNet — the flagship SECOND-on-KITTI detector.

The reference's `AdversarialVoxelNet` subclasses mmdet3d's `VoxelNet` and
injects a learned adversary on raw voxels before the encoder
(models/detectors/adversarial_voxelnet.py:55-151); training couples both
through a min-max loss (:153-427). Here the whole thing is one flax module
whose forward is a single jit region: voxelize -> (perturb) -> VFE -> sparse
middle encoder -> SECOND -> FPN -> anchor head, with the adversary epoch-gated
(>= epoch 3, reference :77-78) by a traced scalar so no recompilation happens
at the gate.

The min-max objective is realized the clean JAX way (SURVEY.md §2d.1) and in
ONE backward pass: a gradient-reversal layer (ops/grad.py) wraps the
perturbation delta, so the detector's parameters see +detection-loss gradients
while the adversary — whose only route into the detection loss is the delta —
sees -detection-loss gradients; its own regularizer terms
(`adversary_direct_terms`) are added to the same scalar and touch only
adversary parameters. The train step then routes the two parameter subtrees to
two optimizers (train/loop.py).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import os as _os

from ..core.registry import MODELS

# A/B gate: run the adversary MLP over the COMPACT point list [B*P, F]
# instead of the padded voxel slots [B*V*T, F] (~75% padding at KITTI B=6,
# ~96% for the 32-point pillar family), gathering the bounded deltas into
# slots via the voxelizer's point->slot bijection. Numerically equal to the
# padded form up to f32 reduction order (same multiset of rows feeds the
# masked statistics). Measured round 5; see PARITY.md.
COMPACT_PERT = _os.environ.get("RPC_COMPACT_PERT", "0") == "1"


def apply_voxel_adversary(adversary, points, voxels, res, plan, train, attack,
                          epoch, start_epoch, adv_grad_scale):
    """Pre-encoder raw-voxel perturbation, shared by all three families.

    Reference semantics (adversarial_voxelnet.py:135-146): perturb the
    padded voxel features before the VFE, gated until epoch >= start (attack
    mode bypasses the gate), deltas through gradient reversal.

    With COMPACT_PERT the adversary MLP runs over the compact point list
    [B*P, F] instead of the padded slots [B*V*T, F] and the bounded deltas
    are gathered into slots via the voxelizer's point->slot bijection
    (ops/voxelize slot_point/point_slot). Numerically equal to the padded
    form up to f32 reduction order: the surviving points are in bijection
    with the valid slots, so the masked statistics see the same multiset.

    Returns (voxels, gate-scaled aux loss dict).
    """
    from ..ops.grad import grad_scale as _gs

    b, v, t, f = voxels.shape
    gate = jnp.asarray(
        attack or False, jnp.float32
    ) + (jnp.asarray(epoch, jnp.float32) >= start_epoch)
    gate = jnp.minimum(gate, 1.0)
    slot_point = plan.get("slot_point") if plan is not None else res.slot_point
    point_slot = plan.get("point_slot") if plan is not None else res.point_slot
    if COMPACT_PERT and slot_point is not None and point_slot is not None:
        p_cnt = points.shape[1]
        pts = points[..., :f].reshape(b * p_cnt, f)
        survived = (point_slot < v * t).reshape(b * p_cnt)
        perturbed_pts, aux = adversary(pts, survived, train, attack)
        delta_pts = _gs(perturbed_pts - pts, jnp.asarray(adv_grad_scale))
        gidx = jnp.where(
            slot_point < p_cnt,
            slot_point + (jnp.arange(b, dtype=jnp.int32) * p_cnt)[:, None, None],
            b * p_cnt,
        )
        delta_pad = jnp.concatenate(
            [delta_pts, jnp.zeros((1, f), delta_pts.dtype)], 0)
        voxels = voxels + gate * delta_pad[gidx]
    else:
        flat = voxels.reshape(b * v * t, f)
        flat_mask = res.point_mask.reshape(b * v * t)
        perturbed, aux = adversary(flat, flat_mask, train, attack)
        delta = _gs(perturbed.reshape(b, v, t, f) - voxels,
                    jnp.asarray(adv_grad_scale))
        voxels = voxels + gate * delta
    return voxels, {k: gate * v_ for k, v_ in aux.items()}
from ..nn import (
    Anchor3DHead,
    HardSimpleVFE,
    SECONDBackbone,
    SECONDFPN,
    SparseEncoder,
    VoxelPerturber,
)
from ..ops import anchors as anchor_ops
from ..ops import sparse
from ..ops.grad import grad_scale
from ..nn.sparse_encoder import encoder_plan
from ..ops.voxelize import VoxelizationResult, VoxelizerConfig, voxelize_batch
from .detection import AnchorHeadConfig


class VoxelNetConfig(NamedTuple):
    """Static architecture config for (Adversarial)VoxelNet on KITTI.

    Defaults mirror the reference 3-class config
    (configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py).
    """

    voxelizer: VoxelizerConfig = VoxelizerConfig(
        point_cloud_range=(0.0, -40.0, -3.0, 70.4, 40.0, 1.0),
        voxel_size=(0.05, 0.05, 0.1),
        max_points_per_voxel=5,
        max_voxels=16000,
    )
    num_classes: int = 3
    class_names: Sequence[str] = ("Car", "Pedestrian", "Cyclist")
    anchor_ranges: Sequence[Sequence[float]] = (
        (0, -40.0, -0.6, 70.4, 40.0, -0.6),
        (0, -40.0, -0.6, 70.4, 40.0, -0.6),
        (0, -40.0, -0.6, 70.4, 40.0, -0.6),
    )
    anchor_sizes: Sequence[Sequence[float]] = (
        (3.9, 1.6, 1.56),
        (0.8, 0.6, 1.73),
        (1.76, 0.6, 1.73),
    )
    anchor_rotations: Sequence[float] = (0.0, 1.5707963)
    head: AnchorHeadConfig = AnchorHeadConfig()
    # adversary (None disables — plain VoxelNet)
    adversary: Optional[Dict[str, Any]] = {
        "sensor_error_bound": 0.2,
        "use_spatial_attention": True,
        "hidden_channels": (64, 128, 64),
    }
    adversarial_loss_weight: float = 0.1
    regularization_weight: float = 0.02
    adversary_start_epoch: int = 3
    # compute dtype of the encoder/backbone/neck/head ("bfloat16"|"float32").
    # Params, BN statistics, losses, box decoding, and the adversary all stay
    # f32; bf16 has the f32 exponent range so no loss scaling is needed.
    compute_dtype: str = "bfloat16"

    @property
    def bev_feature_size(self) -> Tuple[int, int]:
        nx, ny, _ = self.voxelizer.grid_size
        return (ny // 8, nx // 8)

    def make_anchors(self) -> Tuple[np.ndarray, np.ndarray]:
        a = anchor_ops.generate_anchors(
            self.bev_feature_size, self.anchor_ranges, self.anchor_sizes,
            self.anchor_rotations,
        )
        cls_ids = anchor_ops.anchor_class_ids(
            self.bev_feature_size, len(self.anchor_sizes), len(self.anchor_rotations)
        )
        return anchor_ops.flatten_anchors(a), cls_ids


class ModelOutputs(NamedTuple):
    cls_scores: jnp.ndarray   # [B, H, W, A, C]
    bbox_preds: jnp.ndarray   # [B, H, W, A, 7]
    dir_preds: jnp.ndarray    # [B, H, W, A, 2]
    adv_aux: Dict[str, jnp.ndarray]  # perturbation loss terms (zeros if no adversary)


@MODELS.register_module()
@MODELS.register_module(name="VoxelNet")
class AdversarialVoxelNet(nn.Module):
    """SECOND detector with an optional pre-encoder voxel adversary."""

    cfg: VoxelNetConfig = VoxelNetConfig()

    def setup(self):
        vz = self.cfg.voxelizer
        nx, ny, nz = vz.grid_size
        dt = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        self.middle_encoder = SparseEncoder(sparse_shape=vz.sparse_shape, dtype=dt)
        self.backbone = SECONDBackbone(dtype=dt)
        self.neck = SECONDFPN(dtype=dt)
        self.bbox_head = Anchor3DHead(
            num_classes=self.cfg.num_classes,
            num_anchors_per_loc=len(self.cfg.anchor_sizes) * len(self.cfg.anchor_rotations),
            dtype=dt,
        )
        if self.cfg.adversary is not None:
            self.adversary = VoxelPerturber(
                num_features=4, **{k: tuple(v) if isinstance(v, (list, tuple)) else v
                                   for k, v in self.cfg.adversary.items()}
            )
        else:
            self.adversary = None

    def __call__(
        self,
        points: jnp.ndarray,
        points_mask: jnp.ndarray,
        train: bool,
        epoch: jnp.ndarray | int = 0,
        attack: bool = False,
        adv_grad_scale: jnp.ndarray | float = -1.0,
        plan=None,
    ) -> ModelOutputs:
        """Full forward. points [B, P, F>=4], points_mask [B, P].

        `attack=True` applies the adversary with the aggressive eval-bound
        profile regardless of `train` — the principled form of the
        forced-perturbation eval monkeypatch
        (reference evaluate_kitti_adversarial_attack.py:23-62).

        `adv_grad_scale` is the gradient-reversal factor on the perturbation
        delta (-1.0 = the reference's `loss_adversarial = -1.0 * det_total`,
        adversarial_voxelnet.py:284).

        `plan`: optional host-prepared sparse plan from :func:`build_plan`
        (voxelization + all encoder indices). It is a pure function of the
        input points, so the input pipeline computes it on CPU and the device
        step skips every structure sort; `points`/`points_mask` are then only
        consulted for their static shapes.
        """
        vz = self.cfg.voxelizer
        if plan is not None:
            res = VoxelizationResult(
                plan["voxels"], plan["vox_coords"], plan["num_points"],
                plan["voxel_mask"], plan["point_mask"],
            )
            b = plan["voxels"].shape[0]
            grid = sparse.SparseGrid(
                plan["grid_ids"], plan["grid_coords"], plan["grid_mask"],
                (b,) + tuple(vz.sparse_shape),
            )
            order = plan["order"]
        else:
            res = voxelize_batch(points[..., :4], points_mask, vz)
            grid, order = sparse.with_batch_axis(res.coords, res.voxel_mask, vz.sparse_shape)

        voxels = res.voxels
        adv_aux = {
            "l2_norm": jnp.float32(0.0),
            "l2_percentage": jnp.float32(0.0),
            "intensity_loss": jnp.float32(0.0),
            "bias_loss": jnp.float32(0.0),
            "imbalance_loss": jnp.float32(0.0),
            "max_perturbation": jnp.float32(0.0),
            "mean_perturbation": jnp.float32(0.0),
            "std_perturbation": jnp.float32(0.0),
        }
        if self.adversary is not None and (train or attack):
            voxels, adv_aux = apply_voxel_adversary(
                self.adversary, points, voxels, res, plan, train, attack,
                epoch, self.cfg.adversary_start_epoch, adv_grad_scale,
            )

        feats = HardSimpleVFE(voxels, res.point_mask)  # [B, V, F]
        feats = feats.reshape(-1, feats.shape[-1])[order]
        bev = self.middle_encoder(
            feats, grid, train, plan=None if plan is None else plan["enc"]
        )
        outs = self.backbone(bev, train)
        fused = self.neck(outs, train)
        cls_scores, bbox_preds, dir_preds = self.bbox_head(fused)
        return ModelOutputs(cls_scores, bbox_preds, dir_preds, adv_aux)


def sparse_plan_core(points, points_mask, vz: VoxelizerConfig,
                     num_features: int, encoder_in_channels: int,
                     encoder_channels=None):
    """Shared plan core: voxelize + batch merge + encoder index plan, as a
    dict of arrays. Model-family wrappers (build_plan here, CenterPoint's
    build_centerpoint_plan) add family-specific groups on top.
    `encoder_channels`: the model's stage plan when it differs from the
    SECOND default (CenterPoint's basicblock channels) — the rel/down
    sequence is layout-independent, only the xwin-vs-dense width choices
    read the channel numbers."""
    res = voxelize_batch(points[..., :num_features], points_mask, vz)
    grid, order = sparse.with_batch_axis(res.coords, res.voxel_mask, vz.sparse_shape)
    b, v = res.voxels.shape[:2]
    from ..nn.sparse_encoder import SparseEncoder as _SE

    enc_defaults = _SE(sparse_shape=vz.sparse_shape, in_channels=encoder_in_channels)
    enc = encoder_plan(
        grid, b * v, enc_defaults.in_channels, enc_defaults.base_channels,
        encoder_channels or enc_defaults.encoder_channels,
        enc_defaults.stage_cap_factors,
        enc_defaults.out_cap_factor,
    )
    return {
        "voxels": res.voxels,
        "vox_coords": res.coords,
        "num_points": res.num_points,
        "voxel_mask": res.voxel_mask,
        "point_mask": res.point_mask,
        "slot_point": res.slot_point,
        "point_slot": res.point_slot,
        "order": order,
        "grid_ids": grid.flat_ids,
        "grid_coords": grid.coords,
        "grid_mask": grid.mask,
        "enc": enc,
    }


def build_plan(points: jnp.ndarray, points_mask: jnp.ndarray, cfg: VoxelNetConfig,
               gt_boxes: jnp.ndarray = None, gt_labels: jnp.ndarray = None,
               gt_mask: jnp.ndarray = None):
    """Host-side sparse plan: voxelize + batch merge + every encoder index.

    Everything here is a pure function of the input points — parameters never
    enter — so the input pipeline runs it on the CPU backend while the device
    executes the previous step, and the train step receives the arrays as
    inputs instead of tracing the sorts inline. This is the idiomatic TPU
    split (host input pipeline feeds a sort-free device step); the reference
    instead builds these index pairs with spconv's CUDA hash tables inside
    the step (models/detectors/adversarial_voxelnet.py:141). Exactness is by
    construction: the SAME jax functions build the plan on either backend
    (ops/voxelize.py, nn/sparse_encoder.encoder_plan).

    The adversary is untouched by this split: it perturbs voxel FEATURES
    (post-voxelization), so the sparse structure — and therefore the plan —
    is independent of the perturbation.

    Returns a dict-of-arrays pytree; feed it to the model/train step as
    `plan=`. Jit it (train/loop.HostPlanBuilder does, on CPU).
    """
    plan = sparse_plan_core(points, points_mask, cfg.voxelizer, 4, 4)
    if gt_boxes is not None:
        plan["assign"] = anchor_assign_plan(gt_boxes, gt_labels, gt_mask, cfg)
    return plan


def anchor_assign_plan(gt_boxes, gt_labels, gt_mask, cfg: VoxelNetConfig):
    """Batched anchor Max-IoU assignment as a plan group.

    Parameter-free (static anchors vs GT boxes), so the O(A·G) IoU matrix
    runs on the host too; the device keeps only the elementwise target
    encoding (models/detection.anchor_head_targets with assign_res).
    """
    from ..ops import assigner as _assigner

    anchors_np, anchor_cls_np = cfg.make_anchors()
    anchors_j = jnp.asarray(anchors_np)
    anchor_cls_j = jnp.asarray(anchor_cls_np)
    head = cfg.head
    res_a = jax.vmap(
        lambda gb, gl, gm: _assigner.assign(
            anchors_j, anchor_cls_j, gb, gl, gm,
            head.pos_iou_thr, head.neg_iou_thr, head.min_pos_iou,
        )
    )(gt_boxes, gt_labels, gt_mask)
    return {
        "labels": res_a.labels,
        "matched_gt": res_a.matched_gt,
        "pos_mask": res_a.pos_mask,
        "neg_mask": res_a.neg_mask,
    }


def adversary_direct_terms(
    det_losses: Dict[str, jnp.ndarray],
    adv_aux: Dict[str, jnp.ndarray],
    epoch: jnp.ndarray | float,
    regularization_weight: float = 0.02,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Adversary-only loss terms, added to the single train scalar.

    Together with the gradient-reversal on the perturbation delta this
    reproduces the reference's effective adversary objective
    (models/detectors/adversarial_voxelnet.py:203-413):

      loss_adversarial = -1 * det_total - 10*(l2 - 0.05)        [det part via GRL]
                         + 0.01 * (3*intensity + 10*bias + 10*imbalance)
      + 3*intensity + 10*bias + 10*imbalance            (paper aux terms)
      + reg_weight * reg_scale(epoch, l2) * l2           (epoch-decayed L2 reg)

    reg_scale = max(0.1, 1 - (epoch+1)/30), further scaled x0.01/x0.1/x0.3
    when l2 < 0.001/0.005/0.01 (weakness-adaptive, reference :399-413).
    The reference's +-10 outer clamp and 0..100 per-loss clamps are a NaN
    safety rail, not a training signal; here that job is done by the NaN
    ladder (train/hooks.py), so the clamps are reported in the logs but not
    inserted into the gradient path. Everything here is a function of the
    adversary's outputs only — detector parameters receive zero gradient from
    these terms.
    """
    l2 = adv_aux["l2_norm"]
    l2_magnitude = -10.0 * (l2 - 0.05)

    aux_terms = (
        3.0 * adv_aux["intensity_loss"]
        + 10.0 * adv_aux["bias_loss"]
        + 10.0 * adv_aux["imbalance_loss"]
    )

    actual_epoch = jnp.asarray(epoch, jnp.float32) + 1.0
    reg_scale = jnp.maximum(0.1, 1.0 - actual_epoch / 30.0)
    l2s = jax.lax.stop_gradient(l2)
    weak = jnp.where(
        l2s < 0.001, 0.01, jnp.where(l2s < 0.005, 0.1, jnp.where(l2s < 0.01, 0.3, 1.0))
    )
    loss_reg = regularization_weight * reg_scale * weak * l2

    total = l2_magnitude + 1.01 * aux_terms + loss_reg

    det_total = jnp.float32(0.0)
    for k, v in det_losses.items():
        if k.startswith("loss"):
            det_total = det_total + jnp.clip(jnp.nan_to_num(v), 0.0, 100.0)
    det_total = jnp.clip(det_total, 0.0, 500.0)
    logs = {
        "loss_adversarial": jnp.clip(
            -det_total + jax.lax.stop_gradient(l2_magnitude), -10.0, 10.0
        ),
        "loss_intensity": 3.0 * adv_aux["intensity_loss"],
        "loss_bias": 10.0 * adv_aux["bias_loss"],
        "loss_imbalance": 10.0 * adv_aux["imbalance_loss"],
        "loss_l2_regularization": loss_reg,
        "perturbation_l2_norm": jax.lax.stop_gradient(l2),
        # routed to the reference-schema l2_norms.csv 'L2 Percentage' column
        # (voxel_perturber.py:411-432)
        "l2_percentage": jax.lax.stop_gradient(adv_aux.get("l2_percentage", jnp.float32(0.0))),
        "max_perturbation": jax.lax.stop_gradient(adv_aux.get("max_perturbation", jnp.float32(0.0))),
        "mean_perturbation": jax.lax.stop_gradient(adv_aux.get("mean_perturbation", jnp.float32(0.0))),
        "std_perturbation": jax.lax.stop_gradient(adv_aux.get("std_perturbation", jnp.float32(0.0))),
    }
    return total, logs
