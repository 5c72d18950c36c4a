"""StrongAdversarialVoxelNet: post-encoder perturbations with attack dynamics.

The reference variant (models/detectors/strong_adversarial_voxelnet.py:13-324)
differs from AdversarialVoxelNet in four ways, all kept here:
  * perturbs the VFE output features (post voxel-encoder, pre middle-encoder)
    rather than raw points (:205-228),
  * StrongVoxelPerturber with momentum over the previous step's perturbations
    (:166-175) — carried as explicit state by the train loop,
  * dynamic scaling: epoch growth x effectiveness boost x curriculum
    min(1 + iter/10000, 2) (:109-139), computed host-side
    (nn/perturber.strong_dynamic_scale) and passed as a traced scalar,
  * anti-adaptation: with probability `anti_adaptation_prob` the detector's
    losses are scaled x0.1 for the step (:251-255) — implemented in the train
    loop with an on-device bernoulli draw.

The reference's `class_attack_weights` / `post_encoding_noise_scales` fields
are configured but never applied (SURVEY.md §2a) — they are accepted here for
config parity and likewise unused.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.registry import MODELS
from ..nn import (
    Anchor3DHead,
    HardSimpleVFE,
    SECONDBackbone,
    SECONDFPN,
    SparseEncoder,
    StrongVoxelPerturber,
)
from ..ops import sparse
from ..ops.grad import grad_scale
from ..ops.voxelize import voxelize_batch
from .voxelnet import VoxelNetConfig


class StrongVoxelNetConfig(NamedTuple):
    base: VoxelNetConfig = VoxelNetConfig(adversary=None)
    perturber: Dict[str, Any] = {
        "sensor_error_bound": 0.18,
        "hidden_channels": (64, 128, 256, 128),
        "dropout_rate": 0.1,
        "activation": "ReLU",
        "use_batch_norm": True,
    }
    adversarial_loss_weight: float = 0.1
    momentum_loss_weight: float = 0.1
    anti_adaptation_prob: float = 0.1
    max_scaling: float = 5.0
    # accepted-but-unused (reference parity, strong_adversarial_voxelnet.py:82-85)
    class_attack_weights: Optional[Dict[str, float]] = None
    post_encoding_noise_scales: Optional[Dict[str, float]] = None


class StrongOutputs(NamedTuple):
    cls_scores: jnp.ndarray
    bbox_preds: jnp.ndarray
    dir_preds: jnp.ndarray
    adv_aux: Dict[str, jnp.ndarray]
    perturbations: jnp.ndarray  # [N, C] for the momentum carry


@MODELS.register_module()
class StrongAdversarialVoxelNet(nn.Module):
    cfg: StrongVoxelNetConfig = StrongVoxelNetConfig()

    def setup(self):
        vz = self.cfg.base.voxelizer
        dt = (
            jnp.bfloat16
            if self.cfg.base.compute_dtype == "bfloat16"
            else jnp.float32
        )
        self.middle_encoder = SparseEncoder(sparse_shape=vz.sparse_shape, dtype=dt)
        self.backbone = SECONDBackbone(dtype=dt)
        self.neck = SECONDFPN(dtype=dt)
        self.bbox_head = Anchor3DHead(
            num_classes=self.cfg.base.num_classes,
            num_anchors_per_loc=len(self.cfg.base.anchor_sizes)
            * len(self.cfg.base.anchor_rotations),
            dtype=dt,
        )
        self.adversary = StrongVoxelPerturber(
            num_features=4,
            **{k: tuple(v) if isinstance(v, list) else v
               for k, v in self.cfg.perturber.items()},
        )

    def __call__(
        self,
        points: jnp.ndarray,
        points_mask: jnp.ndarray,
        train: bool,
        scale_factor: jnp.ndarray | float = 1.0,
        last_perturbations: jnp.ndarray | None = None,
        adv_grad_scale: jnp.ndarray | float = -1.0,
        apply_perturbations: bool = True,
        plan=None,
    ) -> StrongOutputs:
        vz = self.cfg.base.voxelizer
        if plan is not None:
            # host-prepared sparse plan (models/voxelnet.build_plan on
            # cfg.base): the strong variant perturbs post-VFE features, so
            # the structure — and the plan — is perturbation-independent too
            voxels, point_mask_v = plan["voxels"], plan["point_mask"]
            b = voxels.shape[0]
            grid = sparse.SparseGrid(
                plan["grid_ids"], plan["grid_coords"], plan["grid_mask"],
                (b,) + tuple(vz.sparse_shape),
            )
            order = plan["order"]
            enc_plan = plan["enc"]
        else:
            res = voxelize_batch(points[..., :4], points_mask, vz)
            grid, order = sparse.with_batch_axis(
                res.coords, res.voxel_mask, vz.sparse_shape
            )
            voxels, point_mask_v = res.voxels, res.point_mask
            enc_plan = None

        feats = HardSimpleVFE(voxels, point_mask_v)  # [B, V, 4]
        feats = feats.reshape(-1, feats.shape[-1])[order]
        mask = grid.mask

        adv_aux = {
            "l2_norm": jnp.float32(0.0), "l2_percentage": jnp.float32(0.0),
            "intensity_loss": jnp.float32(0.0), "bias_loss": jnp.float32(0.0),
            "imbalance_loss": jnp.float32(0.0), "max_perturbation": jnp.float32(0.0),
        }
        pert = jnp.zeros_like(feats)
        if apply_perturbations:
            pert, adv_aux = self.adversary(
                feats, mask, train, scale_factor, last_perturbations,
                deterministic=not train,
            )
            feats = feats + grad_scale(pert, jnp.asarray(adv_grad_scale))

        bev = self.middle_encoder(feats, grid, train, plan=enc_plan)
        outs = self.backbone(bev, train)
        fused = self.neck(outs, train)
        cls_scores, bbox_preds, dir_preds = self.bbox_head(fused)
        return StrongOutputs(cls_scores, bbox_preds, dir_preds, adv_aux, pert)


def strong_adversary_terms(
    adv_aux: Dict[str, jnp.ndarray],
    perturbations: jnp.ndarray,
    last_perturbations: jnp.ndarray | None,
    momentum_loss_weight: float = 0.1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Adversary-only terms: momentum-consistency bonus (the reference adds
    0.1 * momentum similarity to sustain attack direction, :263-288)."""
    if last_perturbations is None:
        momentum_term = jnp.float32(0.0)
    else:
        momentum_term = -jnp.mean(perturbations * jax.lax.stop_gradient(last_perturbations))
    total = momentum_loss_weight * momentum_term
    logs = {
        "loss_momentum": momentum_term,
        "perturbation_l2_norm": jax.lax.stop_gradient(adv_aux["l2_norm"]),
    }
    return total, logs
