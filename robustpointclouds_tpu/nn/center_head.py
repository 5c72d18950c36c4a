"""CenterPoint detection head: per-task heatmaps + dense regression maps.

Equivalent of mmdet3d's `CenterHead` as configured by the reference's
NuScenes pipeline (configs/adversarial/adversarial-centerpoint_voxel-nuscenes.py:11-13
inherits centerpoint_voxel01_second_secfpn_head-dcn-circlenms): a shared conv
trunk, then per-task branches predicting a class heatmap plus common
regression maps reg(2) / height(1) / dim(3) / rot(2) / vel(2). Decode is
dense-heatmap top-k + circle NMS in ops/, all static-shape XLA.

Two separate-head variants, selected by `use_dcn`:
  * plain `SeparateHead` conv stacks (default — fastest on TPU);
  * `DCNSeparateHead` parity with the reference base config: a deformable
    feature-adaptation conv (nn/deform_conv.py, gather-based XLA DCN) in
    front of the classification and regression branches. Grouped DCN
    (groups=4 in the mmdet3d config) is realized as a full-channel DCN —
    a strict superset parameterization, noted for checkpoint conversion.
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

# NuScenes task grouping (mmdet3d centerpoint nus config)
NUSCENES_TASKS: Tuple[Tuple[str, ...], ...] = (
    ("car",),
    ("truck", "construction_vehicle"),
    ("bus", "trailer"),
    ("barrier",),
    ("motorcycle", "bicycle"),
    ("pedestrian", "traffic_cone"),
)

COMMON_HEADS: Tuple[Tuple[str, int], ...] = (
    ("reg", 2), ("height", 1), ("dim", 3), ("rot", 2), ("vel", 2)
)


class _SeparateHead(nn.Module):
    out_channels: int
    head_conv: int = 64
    num_convs: int = 2
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.num_convs - 1):
            x = nn.Conv(self.head_conv, (3, 3), padding="SAME", use_bias=False,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, name=f"bn{i}")(x)
            x = nn.relu(x)
        return nn.Conv(
            self.out_channels, (3, 3), padding="SAME",
            bias_init=nn.initializers.constant(self.bias_init), name="out",
        )(x)


class _DCNAdapt(nn.Module):
    """Deformable feature adaptation: DCN 3x3 -> BN -> ReLU (mmdet3d
    DCNSeparateHead's feature_adapt_{cls,reg}; its dcn_config uses
    groups=4, so the zoo checkpoint's grouped weights load exactly)."""

    channels: int = 64
    groups: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        from .deform_conv import DeformConv2d

        x = DeformConv2d(self.channels, groups=self.groups, name="dcn")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, name="bn")(x)
        return nn.relu(x)


class CenterHead(nn.Module):
    """Returns per-task dicts of dense prediction maps."""

    tasks: Tuple[Tuple[str, ...], ...] = NUSCENES_TASKS
    share_conv_channels: int = 64
    common_heads: Tuple[Tuple[str, int], ...] = COMMON_HEADS
    use_dcn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> Tuple[Dict[str, jnp.ndarray], ...]:
        """x: [B, H, W, C] neck output -> tuple over tasks of
        {'heatmap': [B,H,W,ncls], 'reg': [B,H,W,2], ...}."""
        x = nn.Conv(self.share_conv_channels, (3, 3), padding="SAME",
                    use_bias=False, name="shared_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, name="shared_bn")(x)
        x = nn.relu(x)
        outs = []
        for t, classes in enumerate(self.tasks):
            if self.use_dcn:
                x_cls = _DCNAdapt(self.share_conv_channels,
                                  name=f"task{t}_adapt_cls")(x, train)
                x_reg = _DCNAdapt(self.share_conv_channels,
                                  name=f"task{t}_adapt_reg")(x, train)
            else:
                x_cls = x_reg = x
            # f32 at the head/loss boundary (same invariant as the flagship
            # AnchorHead, nn/anchor_head.py:49-54): conv compute may be bf16
            # but losses, sigmoid/exp/arctan2 decode, and box geometry are f32
            task_out = {}
            task_out["heatmap"] = _SeparateHead(
                len(classes), bias_init=-4.595, name=f"task{t}_heatmap"
            )(x_cls, train).astype(jnp.float32)
            for head_name, dim in self.common_heads:
                task_out[head_name] = _SeparateHead(
                    dim, name=f"task{t}_{head_name}"
                )(x_reg, train).astype(jnp.float32)
            outs.append(task_out)
        return tuple(outs)
