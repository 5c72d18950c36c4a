"""Box geometry: rotated BEV IoU, nearest-BEV IoU, 3D IoU, corners.

TPU-native replacement for the CUDA rotated-IoU ops the reference pulls in via
mmcv/numba (reference requirements.txt:17, configs test_cfg use_rotate_nms and
Max3DIoUAssigner's BboxOverlapsNearest3D). Everything here is branch-free,
static-shape XLA: rotated polygon intersection is computed via the candidate-
point + angular-sort formulation (24 candidate vertices, shoelace area) so it
vmaps cleanly over [N, M] pair grids.

Box conventions (internal to this framework):
  * 7-DoF box: (x, y, z, dx, dy, dz, yaw) with z the *gravity center* and
    (dx, dy, dz) the full extents along the box frame's x/y/z. yaw rotates
    box-x toward world-y (right-handed around +z).
  * BEV box: (x, y, dx, dy, yaw).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def box_bev_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """BEV corners of rotated boxes.

    Args:
        boxes: [..., 5] (x, y, dx, dy, yaw).
    Returns:
        [..., 4, 2] corners in counter-clockwise order.
    """
    x, y, dx, dy, yaw = (boxes[..., i] for i in range(5))
    hx, hy = dx * 0.5, dy * 0.5
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # explicit rotation arithmetic (VPU, full f32) — an einsum here would hit
    # the MXU's default bf16 precision and corrupt IoU at the 1e-3 level
    corners = []
    for lx, ly in ((hx, hy), (-hx, hy), (-hx, -hy), (hx, -hy)):  # CCW
        corners.append(jnp.stack([x + lx * c - ly * s, y + lx * s + ly * c], axis=-1))
    return jnp.stack(corners, axis=-2)


def box3d_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """8 corners of 7-DoF boxes: [..., 8, 3]. Bottom 4 then top 4."""
    bev = box_bev_corners(boxes[..., [0, 1, 3, 4, 6]])  # [...,4,2]
    z = boxes[..., 2:3]
    dz = boxes[..., 5:6]
    zb = (z - dz * 0.5)[..., None, :]
    zt = (z + dz * 0.5)[..., None, :]
    bottom = jnp.concatenate([bev, jnp.broadcast_to(zb, bev[..., :1].shape)], -1)
    top = jnp.concatenate([bev, jnp.broadcast_to(zt, bev[..., :1].shape)], -1)
    return jnp.concatenate([bottom, top], axis=-2)


def _cross2(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _segment_intersections(ca: jnp.ndarray, cb: jnp.ndarray):
    """All 16 edge-pair intersection points between two quads.

    Args:
        ca, cb: [4, 2] corners.
    Returns:
        pts [16, 2], valid [16].
    """
    a0 = jnp.repeat(ca, 4, axis=0)  # edges of A start
    a1 = jnp.repeat(jnp.roll(ca, -1, axis=0), 4, axis=0)
    b0 = jnp.tile(cb, (4, 1))
    b1 = jnp.tile(jnp.roll(cb, -1, axis=0), (4, 1))

    r = a1 - a0
    s = b1 - b0
    denom = r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]
    qp = b0 - a0
    t = (qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom
    )
    u = (qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom
    )
    valid = (
        (jnp.abs(denom) >= _EPS)
        & (t >= 0.0)
        & (t <= 1.0)
        & (u >= 0.0)
        & (u <= 1.0)
    )
    pts = a0 + t[:, None] * r
    return pts, valid


def _points_in_quad(pts: jnp.ndarray, quad: jnp.ndarray) -> jnp.ndarray:
    """Point-in-convex-quad (CCW winding). pts [K,2], quad [4,2] -> [K] bool."""
    e0 = quad  # [4,2]
    e1 = jnp.roll(quad, -1, axis=0)
    # cross(e1-e0, p-e0) >= 0 for all edges (CCW)
    d = (e1[None, :, 0] - e0[None, :, 0]) * (pts[:, None, 1] - e0[None, :, 1]) - (
        e1[None, :, 1] - e0[None, :, 1]
    ) * (pts[:, None, 0] - e0[None, :, 0])
    return jnp.all(d >= -1e-6, axis=1)


def _poly_area_sorted(pts: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Area of convex polygon given unordered candidate vertices + validity.

    Sorts valid points by angle around the valid centroid and applies the
    shoelace formula. pts [K,2], valid [K] -> scalar area.
    """
    k = pts.shape[0]
    nvalid = jnp.sum(valid)
    safe_n = jnp.maximum(nvalid, 1)
    centroid = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / safe_n
    ang = jnp.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    ang = jnp.where(valid, ang, jnp.inf)  # invalid sorted last
    order = jnp.argsort(ang)
    sp = pts[order]
    idx = jnp.arange(k)
    nxt = jnp.where(idx == nvalid - 1, 0, idx + 1)
    nxt = jnp.clip(nxt, 0, k - 1)
    p0 = sp
    p1 = sp[nxt]
    contrib = p0[:, 0] * p1[:, 1] - p1[:, 0] * p0[:, 1]
    contrib = jnp.where(idx < nvalid, contrib, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(contrib))
    return jnp.where(nvalid >= 3, area, 0.0)


def _pair_bev_intersection(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two rotated BEV boxes [5] -> scalar."""
    ca = box_bev_corners(box_a)
    cb = box_bev_corners(box_b)
    inter_pts, inter_valid = _segment_intersections(ca, cb)
    a_in_b = _points_in_quad(ca, cb)
    b_in_a = _points_in_quad(cb, ca)
    pts = jnp.concatenate([inter_pts, ca, cb], axis=0)  # [24, 2]
    valid = jnp.concatenate([inter_valid, a_in_b, b_in_a], axis=0)
    return _poly_area_sorted(pts, valid)


def rotated_bev_overlap(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated-BEV intersection areas. [N,5] x [M,5] -> [N,M]."""
    fn = jax.vmap(jax.vmap(_pair_bev_intersection, (None, 0)), (0, None))
    return fn(boxes_a, boxes_b)


def rotated_bev_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated-BEV IoU. boxes [N,5]=(x,y,dx,dy,yaw), [M,5] -> [N,M].

    Degenerate boxes (non-positive extent, e.g. zero padding rows) get IoU 0.
    """
    inter = rotated_bev_overlap(boxes_a, boxes_b)
    area_a = (boxes_a[:, 2] * boxes_a[:, 3])[:, None]
    area_b = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
    iou = inter / jnp.maximum(area_a + area_b - inter, _EPS)
    nondegenerate = (area_a > _EPS) & (area_b > _EPS)
    return jnp.where(nondegenerate, iou, 0.0)


def boxes3d_to_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 7] -> [..., 5] BEV box (x, y, dx, dy, yaw)."""
    return boxes[..., [0, 1, 3, 4, 6]]


def rotated_iou_3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3D IoU of 7-DoF boxes (rotated BEV overlap x z-overlap)."""
    inter_bev = rotated_bev_overlap(boxes3d_to_bev(boxes_a), boxes3d_to_bev(boxes_b))
    za_lo = boxes_a[:, 2] - boxes_a[:, 5] * 0.5
    za_hi = boxes_a[:, 2] + boxes_a[:, 5] * 0.5
    zb_lo = boxes_b[:, 2] - boxes_b[:, 5] * 0.5
    zb_hi = boxes_b[:, 2] + boxes_b[:, 5] * 0.5
    z_overlap = jnp.maximum(
        jnp.minimum(za_hi[:, None], zb_hi[None, :])
        - jnp.maximum(za_lo[:, None], zb_lo[None, :]),
        0.0,
    )
    inter = inter_bev * z_overlap
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.maximum(vol_a + vol_b - inter, _EPS)


def nearest_bev_boxes(boxes: jnp.ndarray) -> jnp.ndarray:
    """Rotation-snapped axis-aligned BEV boxes [x1, y1, x2, y2].

    Equivalent of mmdet3d's `BboxOverlapsNearest3D` preprocessing (used by the
    Max3DIoUAssigner config in reference
    configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:90):
    yaw is snapped to the nearest axis; extents swap when the box is closer to
    vertical.

    Args:
        boxes: [..., 7] or [..., 5] BEV.
    Returns:
        [..., 4] axis-aligned boxes.
    """
    if boxes.shape[-1] == 7:
        boxes = boxes3d_to_bev(boxes)
    x, y, dx, dy, yaw = (boxes[..., i] for i in range(5))
    rot = jnp.abs(jnp.mod(yaw, jnp.pi))
    swap = (rot > jnp.pi / 4) & (rot < 3 * jnp.pi / 4)
    ex = jnp.where(swap, dy, dx) * 0.5
    ey = jnp.where(swap, dx, dy) * 0.5
    return jnp.stack([x - ex, y - ey, x + ex, y + ey], axis=-1)


def aligned_bev_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of axis-aligned [x1,y1,x2,y2] boxes: [N,4] x [M,4] -> [N,M]."""
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, _EPS)


def nearest_bev_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """BboxOverlapsNearest3D-equivalent IoU for 7-DoF boxes: [N,7] x [M,7]."""
    return aligned_bev_iou(nearest_bev_boxes(boxes_a), nearest_bev_boxes(boxes_b))


def limit_period(val: jnp.ndarray, offset: float = 0.5, period: float = jnp.pi) -> jnp.ndarray:
    """Limit angles into [-offset*period, (1-offset)*period)."""
    return val - jnp.floor(val / period + offset) * period
