"""AdversarialPointPillars — the pillar-based (all-dense) detector family.

An ADDITION beyond the reference inventory (retrieved technique papers,
PAPERS.md: PointPillars arXiv:1812.05784, PillarNet arXiv:2205.07403). The
reference wraps SECOND and CenterPoint; the pillar encoder is the natural
third family ON TPU because it removes the sparse 3D conv stack entirely:
one PFN matmul + a BEV scatter feed the same dense SECOND/SECONDFPN/
Anchor3DHead stack used everywhere else, so the whole network is MXU work —
no gathers, no sorts, no sparse index machinery on the device at all.

Geometry follows mmdet3d's pointpillars_hv_secfpn_8xb6-160e_kitti-3d-3class:
0.16 m pillars over [0, -39.68, -3, 69.12, 39.68, 1], 32 points/pillar,
16k pillars, backbone (64, 128, 256) x (3, 5, 5) at strides (2, 2, 2), FPN
upsample (1, 2, 4) -> 384ch at stride 2 (BEV 248 x 216).

The adversary is the SAME VoxelPerturber on raw pillar points with the same
epoch gate / GRL min-max wiring as AdversarialVoxelNet — the reference's
adversarial recipe transplanted onto the third family. Trainer, run_training,
run_evaluation, checkpoints, and the KITTI metric all work unchanged (the
config duck-types VoxelNetConfig's surface).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..core.registry import MODELS
from ..nn import Anchor3DHead, SECONDBackbone, SECONDFPN, VoxelPerturber
from ..nn.layers import MaskedBatchNorm
from ..ops import anchors as anchor_ops
from ..ops import sparse
from ..ops.grad import grad_scale
from ..ops.voxelize import VoxelizerConfig, voxelize_batch
from .detection import AnchorHeadConfig
from .voxelnet import ModelOutputs


class PointPillarsConfig(NamedTuple):
    """Static config; mirrors VoxelNetConfig's surface so train/loop.Trainer,
    run_training/run_evaluation and the CLIs work unchanged."""

    voxelizer: VoxelizerConfig = VoxelizerConfig(
        point_cloud_range=(0.0, -39.68, -3.0, 69.12, 39.68, 1.0),
        voxel_size=(0.16, 0.16, 4.0),
        max_points_per_voxel=32,
        max_voxels=16000,
    )
    num_classes: int = 3
    class_names: Sequence[str] = ("Car", "Pedestrian", "Cyclist")
    anchor_ranges: Sequence[Sequence[float]] = (
        (0, -39.68, -1.78, 69.12, 39.68, -1.78),
        (0, -39.68, -0.6, 69.12, 39.68, -0.6),
        (0, -39.68, -0.6, 69.12, 39.68, -0.6),
    )
    anchor_sizes: Sequence[Sequence[float]] = (
        (3.9, 1.6, 1.56),
        (0.8, 0.6, 1.73),
        (1.76, 0.6, 1.73),
    )
    anchor_rotations: Sequence[float] = (0.0, 1.5707963)
    head: AnchorHeadConfig = AnchorHeadConfig()
    pfn_channels: int = 64
    backbone_channels: Sequence[int] = (64, 128, 256)
    backbone_layers: Sequence[int] = (3, 5, 5)
    backbone_strides: Sequence[int] = (2, 2, 2)
    fpn_channels: Sequence[int] = (128, 128, 128)
    fpn_strides: Sequence[int] = (1, 2, 4)
    adversary: Optional[Dict[str, Any]] = {
        "sensor_error_bound": 0.2,
        "use_spatial_attention": True,
        "hidden_channels": (64, 128, 64),
    }
    adversarial_loss_weight: float = 0.1
    regularization_weight: float = 0.02
    adversary_start_epoch: int = 3
    compute_dtype: str = "bfloat16"

    @property
    def bev_feature_size(self) -> Tuple[int, int]:
        nx, ny, _ = self.voxelizer.grid_size
        s = self.backbone_strides[0]
        return (ny // s, nx // s)

    def make_anchors(self) -> Tuple[np.ndarray, np.ndarray]:
        a = anchor_ops.generate_anchors(
            self.bev_feature_size, self.anchor_ranges, self.anchor_sizes,
            self.anchor_rotations,
        )
        cls_ids = anchor_ops.anchor_class_ids(
            self.bev_feature_size, len(self.anchor_sizes), len(self.anchor_rotations)
        )
        return anchor_ops.flatten_anchors(a), cls_ids


class PillarFeatureNet(nn.Module):
    """mmdet3d PillarFeatureNet: 9D decorated points -> Linear+BN+ReLU ->
    masked max over the pillar (num_filters=[64], with_distance=False)."""

    out_channels: int = 64
    voxel_size: Tuple[float, float] = (0.16, 0.16)
    pc_start: Tuple[float, float] = (0.0, -39.68)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxels, point_mask, coords, train: bool):
        """voxels [B,V,T,4], point_mask [B,V,T], coords [B,V,3] (z,y,x)."""
        b, v, t, f = voxels.shape
        m = point_mask[..., None].astype(voxels.dtype)
        cnt = jnp.maximum(jnp.sum(m, axis=2), 1.0)  # [B,V,1]
        mean_xyz = jnp.sum(voxels[..., :3] * m, axis=2) / cnt  # [B,V,3]
        f_cluster = voxels[..., :3] - mean_xyz[:, :, None, :]
        # pillar center offsets (x from coords[...,2], y from coords[...,1])
        cx = (coords[..., 2].astype(voxels.dtype) + 0.5) * self.voxel_size[0] + self.pc_start[0]
        cy = (coords[..., 1].astype(voxels.dtype) + 0.5) * self.voxel_size[1] + self.pc_start[1]
        f_center = jnp.stack(
            [voxels[..., 0] - cx[:, :, None], voxels[..., 1] - cy[:, :, None]],
            axis=-1,
        )
        feats = jnp.concatenate([voxels, f_cluster, f_center], axis=-1)  # [B,V,T,9]
        feats = feats * m  # zero the padding rows before BN
        x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype)(
            feats.astype(self.dtype)
        )
        flat = x.reshape(b * v * t, self.out_channels)
        flat = MaskedBatchNorm(momentum=0.99, eps=1e-3, dtype=self.dtype)(
            flat, point_mask.reshape(b * v * t), train
        )
        x = nn.relu(flat).reshape(b, v, t, self.out_channels)
        # masked max over the pillar's points
        neg = jnp.asarray(-1e9, x.dtype)
        x = jnp.max(jnp.where(point_mask[..., None], x, neg), axis=2)
        return jnp.where(jnp.any(point_mask, axis=2)[..., None], x,
                         jnp.zeros((), x.dtype))


def build_pillar_plan(points, points_mask, cfg: "PointPillarsConfig"):
    """Host plan for the pillar family: voxelization + merged BEV grid +
    dense-cell gather map (all pure functions of the points). With it the
    device step is sort- AND scatter-free; the anchor assignment rides along
    separately (train/loop.PillarPlanBuilder), exactly like the flagship."""
    vz = cfg.voxelizer
    res = voxelize_batch(points[..., :4], points_mask, vz)
    nx, ny, _ = vz.grid_size
    grid, order = sparse.with_batch_axis(
        res.coords[..., 1:], res.voxel_mask, (ny, nx)
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
        "dense": sparse.dense_gather_map(grid),
    }


@MODELS.register_module()
@MODELS.register_module(name="PointPillars")
class AdversarialPointPillars(nn.Module):
    """PointPillars detector with the reference's pre-encoder voxel adversary."""

    cfg: PointPillarsConfig = PointPillarsConfig()

    def setup(self):
        c = self.cfg
        dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        vx, vy, _ = c.voxelizer.voxel_size
        pcr = c.voxelizer.point_cloud_range
        self.pfn = PillarFeatureNet(
            out_channels=c.pfn_channels, voxel_size=(vx, vy),
            pc_start=(pcr[0], pcr[1]), dtype=dt,
        )
        self.backbone = SECONDBackbone(
            out_channels=tuple(c.backbone_channels),
            layer_nums=tuple(c.backbone_layers),
            layer_strides=tuple(c.backbone_strides), dtype=dt,
        )
        self.neck = SECONDFPN(
            out_channels=tuple(c.fpn_channels),
            upsample_strides=tuple(c.fpn_strides), dtype=dt,
        )
        self.bbox_head = Anchor3DHead(
            num_classes=c.num_classes,
            num_anchors_per_loc=len(c.anchor_sizes) * len(c.anchor_rotations),
            dtype=dt,
        )
        if c.adversary is not None:
            self.adversary = VoxelPerturber(
                num_features=4,
                **{k: tuple(v) if isinstance(v, (list, tuple)) else v
                   for k, v in c.adversary.items()},
            )
        else:
            self.adversary = None

    def __call__(self, points, points_mask, train: bool, epoch=0,
                 attack: bool = False, adv_grad_scale=-1.0, plan=None
                 ) -> ModelOutputs:
        """Same contract as AdversarialVoxelNet.__call__.

        `plan`: optional host plan from :func:`build_pillar_plan` —
        voxelization + the merged BEV grid + the dense-cell gather map, so
        the device step contains neither the voxelize sort nor the BEV
        scatter (both are pure functions of the points).
        """
        vz = self.cfg.voxelizer
        if plan is not None:
            from ..ops.voxelize import VoxelizationResult

            res = VoxelizationResult(
                plan["voxels"], plan["vox_coords"], plan["num_points"],
                plan["voxel_mask"], plan["point_mask"],
            )
        else:
            res = voxelize_batch(points[..., :4], points_mask, vz)

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
            from .voxelnet import apply_voxel_adversary

            voxels, adv_aux = apply_voxel_adversary(
                self.adversary, points, voxels, res, plan, train, attack,
                epoch, self.cfg.adversary_start_epoch, adv_grad_scale,
            )

        feats = self.pfn(voxels, res.point_mask, res.coords, train)  # [B,V,C]
        # BEV densify (mmdet3d PointPillarsScatter): 2D (y, x) merged grid
        nx, ny, _ = vz.grid_size
        b = res.voxels.shape[0]
        if plan is not None:
            grid = sparse.SparseGrid(
                plan["grid_ids"], plan["grid_coords"], plan["grid_mask"],
                (b, ny, nx),
            )
            order = plan["order"]
            f2 = feats.reshape(-1, feats.shape[-1])[order]
            bev = sparse.scatter_to_dense_gather(f2, grid, plan["dense"])
        else:
            grid, order = sparse.with_batch_axis(
                res.coords[..., 1:], res.voxel_mask, (ny, nx)
            )
            f2 = feats.reshape(-1, feats.shape[-1])[order]
            bev = sparse.scatter_to_dense(f2, grid)  # [B, ny, nx, C]
        outs = self.backbone(bev, train)
        fused = self.neck(outs, train)
        cls_scores, bbox_preds, dir_preds = self.bbox_head(fused)
        return ModelOutputs(cls_scores, bbox_preds, dir_preds, adv_aux)
