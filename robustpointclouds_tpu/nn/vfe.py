"""Voxel feature encoders.

HardSimpleVFE — per-voxel masked mean of point features — is the encoder both
reference pipelines use (config `voxel_encoder=dict(type='HardSimpleVFE')`,
reference configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:17,
invoked at models/detectors/adversarial_voxelnet.py:135-137). Parameter-free,
so it is a plain function rather than a module.
"""
from __future__ import annotations

import jax.numpy as jnp


def HardSimpleVFE(voxels: jnp.ndarray, point_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of valid points per voxel.

    Args:
        voxels: [..., V, T, F] padded point features.
        point_mask: [..., V, T] validity.
    Returns:
        [..., V, F] voxel features (0 for empty voxels).
    """
    m = point_mask.astype(voxels.dtype)[..., None]
    total = jnp.sum(voxels * m, axis=-2)
    count = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    return total / count
