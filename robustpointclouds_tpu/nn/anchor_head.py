"""Anchor-based 3D detection head (Anchor3DHead-equivalent).

1x1 conv predictors over the BEV feature map for classification, 7-DoF box
regression, and direction classification (reference config
configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:38-69:
num_classes=3, in 512, 6 anchors/location, use_direction_classifier=True).
Target assignment, loss assembly and decoding live in models/ — this module is
just the conv predictors, keeping the head jit-friendly and reusable.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class Anchor3DHead(nn.Module):
    num_classes: int = 3
    num_anchors_per_loc: int = 6  # classes * rotations
    box_code_size: int = 7
    use_direction_classifier: bool = True
    feat_channels: int = 0  # 0 = no extra shared conv (mmdet3d default)
    # compute dtype of the 1x1 convs; predictions are always returned in f32
    # (loss/decoding numerics stay full precision)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """
        Args:
            x: [B, H, W, C] neck output.
        Returns:
            cls_scores [B, H, W, A, num_classes],
            bbox_preds [B, H, W, A, 7],
            dir_preds  [B, H, W, A, 2] (or None when disabled).
        """
        b, h, w, _ = x.shape
        a = self.num_anchors_per_loc
        x = x.astype(self.dtype)
        # focal-style bias init so initial foreground probability ~ 0.01
        cls_out = nn.Conv(
            a * self.num_classes, (1, 1),
            bias_init=nn.initializers.constant(-4.595),
            dtype=self.dtype,
            name="conv_cls",
        )(x)
        box_out = nn.Conv(a * self.box_code_size, (1, 1), dtype=self.dtype, name="conv_reg")(x)
        cls_scores = cls_out.reshape(b, h, w, a, self.num_classes).astype(jnp.float32)
        bbox_preds = box_out.reshape(b, h, w, a, self.box_code_size).astype(jnp.float32)
        dir_preds = None
        if self.use_direction_classifier:
            dir_out = nn.Conv(a * 2, (1, 1), dtype=self.dtype, name="conv_dir_cls")(x)
            dir_preds = dir_out.reshape(b, h, w, a, 2).astype(jnp.float32)
        return cls_scores, bbox_preds, dir_preds
