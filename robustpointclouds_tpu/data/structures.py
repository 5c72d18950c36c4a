"""Batch structures shared between the data pipeline and the train/eval steps.

Everything is padded to static shapes; validity is carried by masks (the
static-shape counterpart of the reference's variable-length mmengine data
samples).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PointCloudBatch(NamedTuple):
    points: jnp.ndarray       # [B, P, F] (xyz + intensity [+ timestamp])
    points_mask: jnp.ndarray  # [B, P] bool
    gt_boxes: jnp.ndarray     # [B, G, 7] (x, y, z_center, dx, dy, dz, yaw)
    gt_labels: jnp.ndarray    # [B, G] int32 (class id; padding rows arbitrary)
    gt_mask: jnp.ndarray      # [B, G] bool
