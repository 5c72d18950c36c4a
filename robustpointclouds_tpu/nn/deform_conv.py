"""Deformable 2D convolution (DCNv1), TPU-native gather formulation.

The reference CenterPoint base config is `...head-dcn-circlenms` — mmdet3d's
`DCNSeparateHead` runs a `DeformConv2d` feature-adaptation layer in front of
each head branch (mmdet3d/models/dense_heads/centerpoint_head.py; reference
configs/adversarial/adversarial-centerpoint_voxel-nuscenes.py:11-13 inherits
it). The CUDA op samples the input at per-position learned offsets; on TPU we
express it as: offset conv (plain XLA conv) -> bilinear gather of the K taps
at (p + p_k + offset_k) -> one [B*H*W, K*C] x [K*C, Cout] MXU matmul — the
same img2col-matmul shape as the sparse encoder's convs, fully static.

Zero offsets reduce exactly to a standard 3x3 convolution (tested), so zoo
checkpoints convert by copying the regular conv weight and the offset conv's
(usually near-zero-initialized) parameters.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _bilinear_gather(x: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Sample x [B, H, W, C] at fractional positions (py, px) [B, H, W, K].

    Out-of-bounds samples contribute zero (mmcv DeformConv2d border
    behavior: samples outside the padded feature map vanish).
    Returns [B, H, W, K, C].
    """
    b, h, w, c = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None, None]
        g = x[bidx, yc, xc]  # [B, H, W, K, C]
        return jnp.where(valid[..., None], g, 0.0)

    g00 = tap(y0, x0)
    g01 = tap(y0, x0 + 1)
    g10 = tap(y0 + 1, x0)
    g11 = tap(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    return (
        g00 * (1 - wy) * (1 - wx)
        + g01 * (1 - wy) * wx
        + g10 * wy * (1 - wx)
        + g11 * wy * wx
    )


class DeformConv2d(nn.Module):
    """3x3 deformable conv: offsets from a plain conv, sampling by gather.

    Matches mmcv `DeformConv2d(in, out, 3, padding=1)` + its offset conv
    (`conv_offset`, zero-initialized so training starts as a plain conv).
    """

    out_channels: int
    kernel: int = 3
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        k = self.kernel
        K = k * k
        # offset conv: 2 values (dy, dx) per tap, zero-init (mmcv convention)
        off = nn.Conv(
            2 * K, (k, k), padding="SAME",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv_offset",
        )(x)
        off = off.reshape(b, h, w, K, 2)

        # base sampling grid: p + p_k
        ky, kx = np.meshgrid(
            np.arange(k) - (k - 1) // 2, np.arange(k) - (k - 1) // 2, indexing="ij"
        )
        ky = jnp.asarray(ky.reshape(-1), jnp.float32)
        kx = jnp.asarray(kx.reshape(-1), jnp.float32)
        gy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        gx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        py = gy + ky[None, None, None, :] + off[..., 0]
        px = gx + kx[None, None, None, :] + off[..., 1]

        col = _bilinear_gather(x, py, px)  # [B, H, W, K, C]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (K * c, self.out_channels),
        )
        out = jnp.dot(
            col.reshape(b * h * w, K * c), kernel,
            preferred_element_type=jnp.float32,
        ).reshape(b, h, w, self.out_channels)
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.out_channels,)
            )
        return out
