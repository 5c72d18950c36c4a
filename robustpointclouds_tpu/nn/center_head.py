"""CenterPoint detection head: per-task heatmaps + dense regression maps.

Equivalent of mmdet3d's `CenterHead` as configured by the reference's
NuScenes pipeline (configs/adversarial/adversarial-centerpoint_voxel-nuscenes.py:11-13
inherits centerpoint_voxel01_second_secfpn_head-dcn-circlenms): a shared conv
trunk, then per-task branches predicting a class heatmap plus common
regression maps reg(2) / height(1) / dim(3) / rot(2) / vel(2). The reference
checkpoint's DCN in the shared conv is replaced by a plain conv stack — a
deliberate TPU-first substitution (SURVEY.md §2b 'CenterPoint pipeline');
decode is dense-heatmap top-k + circle NMS in ops/, all static-shape XLA.
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


class CenterHead(nn.Module):
    """Returns per-task dicts of dense prediction maps."""

    tasks: Tuple[Tuple[str, ...], ...] = NUSCENES_TASKS
    share_conv_channels: int = 64
    common_heads: Tuple[Tuple[str, int], ...] = COMMON_HEADS

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
            task_out = {}
            task_out["heatmap"] = _SeparateHead(
                len(classes), bias_init=-4.595, name=f"task{t}_heatmap"
            )(x, train)
            for head_name, dim in self.common_heads:
                task_out[head_name] = _SeparateHead(
                    dim, name=f"task{t}_{head_name}"
                )(x, train)
            outs.append(task_out)
        return tuple(outs)
