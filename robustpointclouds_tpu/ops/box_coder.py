"""Delta-XYZWLHR residual box coder (SECOND-style).

Equivalent of the `DeltaXYZWLHRBBoxCoder` the reference configures at
configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:55.
Encodes a 7-DoF box against an anchor using the BEV diagonal as the xy scale.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def encode(boxes: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Encode target boxes against anchors.

    Args:
        boxes:   [..., 7] (x, y, z, dx, dy, dz, yaw) ground-truth.
        anchors: [..., 7] anchors.
    Returns:
        deltas [..., 7].
    """
    xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors, 7, axis=-1)
    xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(boxes, 7, axis=-1)
    diag = jnp.sqrt(dxa**2 + dya**2) + _EPS
    return jnp.concatenate(
        [
            (xg - xa) / diag,
            (yg - ya) / diag,
            (zg - za) / jnp.maximum(dza, _EPS),
            jnp.log(jnp.maximum(dxg, _EPS) / jnp.maximum(dxa, _EPS)),
            jnp.log(jnp.maximum(dyg, _EPS) / jnp.maximum(dya, _EPS)),
            jnp.log(jnp.maximum(dzg, _EPS) / jnp.maximum(dza, _EPS)),
            rg - ra,
        ],
        axis=-1,
    )


def decode(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Decode predicted deltas into boxes. Inverse of :func:`encode`."""
    xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors, 7, axis=-1)
    tx, ty, tz, tdx, tdy, tdz, tr = jnp.split(deltas, 7, axis=-1)
    diag = jnp.sqrt(dxa**2 + dya**2) + _EPS
    return jnp.concatenate(
        [
            tx * diag + xa,
            ty * diag + ya,
            tz * dza + za,
            jnp.exp(jnp.clip(tdx, -10.0, 10.0)) * dxa,
            jnp.exp(jnp.clip(tdy, -10.0, 10.0)) * dya,
            jnp.exp(jnp.clip(tdz, -10.0, 10.0)) * dza,
            tr + ra,
        ],
        axis=-1,
    )
