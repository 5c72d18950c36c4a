"""White-box gradient attacks (FGSM/PGD) for robustness evaluation.

The reference's only attack is its learned VoxelPerturber forced on at eval
time (/root/reference/evaluate_kitti_adversarial_attack.py:23-62). A PGD
baseline (Madry et al., arXiv:1706.06083) under the SAME physical envelope —
the attack-profile hard clamps of nn/perturber._bound_profile (reference
voxel_perturber.py:338-350) — gives the robustness story a standard
non-amortized yardstick: PGD re-optimizes per frame with full white-box
gradients, so it approximates the worst case the amortized learned adversary
is trying to reach. FGSM is the one-step special case.

TPU-native shape: the whole K-step attack is ONE jit — a lax.fori_loop
carrying delta, gradients flowing only to the plan's raw voxel features (the
same pre-encoder surface the learned adversary perturbs, models/voxelnet.py)
— so the loop reuses the sort-free plan-fed forward K times with zero host
round trips and the voxelization/index work is paid once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def make_plan_attack(trainer, steps: int = 10, rel_step: float = 2.5,
                     jit: bool = True):
    """Build a jitted `(params, batch_stats, batch, plan) -> attacked_plan`.
    `jit=False` returns the raw traceable function — used INSIDE the train
    step for PGD adversarial training (train/loop.TrainConfig.pgd_steps).

    `trainer` must be a plan-fed anchor-head Trainer (the SECOND flagship or
    the pillar family); the attack perturbs `plan["voxels"]` within the
    per-feature attack clamp (spatial +-25*e = 5.0 m and intensity 2.0 at
    e=0.2: the reference's eval-mode double clamp, x5 overall then x5
    spatial — the same envelope the learned attack's outputs are clamped
    to) and maximizes the detection loss. Padding rows (point_mask False) stay untouched;
    features past the 4th (NuScenes timestamp) have clamp 0 by construction.

    rel_step: PGD step size as a multiple of the clamp over the whole run
    (alpha = rel_step * clamp / steps; Madry's 2.5 default). FGSM = steps 1,
    rel_step 1.0 (one signed step to the boundary).
    """
    from ..models.detection import anchor_head_loss
    from ..nn.perturber import _bound_profile

    cfg = trainer.model_cfg
    adv_cfg = cfg.adversary or {}
    bound = float(adv_cfg.get("sensor_error_bound", 0.2))

    def det_loss(delta, params, stats, batch, plan):
        m = plan["point_mask"][..., None].astype(plan["voxels"].dtype)
        pl = dict(plan, voxels=plan["voxels"] + delta * m)
        outs = trainer.model.apply(
            {"params": params, "batch_stats": stats},
            batch.points, batch.points_mask, False, 100, False, -1.0, pl,
        )
        det = anchor_head_loss(
            outs.cls_scores, outs.bbox_preds, outs.dir_preds,
            trainer.anchors, trainer.anchor_cls,
            batch.gt_boxes, batch.gt_labels, batch.gt_mask, cfg.head,
            assign=plan.get("assign"),
        )
        return det["loss_cls"] + det["loss_bbox"] + det["loss_dir"]

    grad_fn = jax.grad(det_loss)

    def attack(params, stats, batch, plan):
        voxels = plan["voxels"]
        _, clamp = _bound_profile(voxels.shape[-1], bound, attack=True)
        clamp = jnp.asarray(clamp, voxels.dtype)
        alpha = rel_step * clamp / max(steps, 1)

        def body(_, delta):
            g = grad_fn(delta, params, stats, batch, plan)
            return jnp.clip(delta + alpha * jnp.sign(g), -clamp, clamp)

        delta = jax.lax.fori_loop(0, steps, body, jnp.zeros_like(voxels))
        m = plan["point_mask"][..., None].astype(voxels.dtype)
        return dict(plan, voxels=voxels + delta * m)

    return jax.jit(attack) if jit else attack
