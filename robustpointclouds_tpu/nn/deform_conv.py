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

    Matches mmcv `DeformConv2dPack(in, out, 3, padding=1, groups,
    deform_groups)` + its offset conv (`conv_offset`, zero-initialized so
    training starts as a plain conv):

      * `groups` — grouped convolution: output group i sees input channel
        group i only (torch weight [out, in/groups, k, k]); the zoo DCN
        CenterHead uses groups=4 (mmdet3d centerpoint_head DCNSeparateHead
        dcn_config).
      * `deform_groups` — the offset conv emits 2*K offsets PER deform
        group (channel block layout [dg, K, (y, x)], the CUDA
        deformable_im2col ordering); each input channel block samples at
        its own offsets.
    """

    out_channels: int
    kernel: int = 3
    use_bias: bool = False
    groups: int = 1
    deform_groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        k = self.kernel
        K = k * k
        g, dg = self.groups, self.deform_groups
        assert c % g == 0 and self.out_channels % g == 0 and c % dg == 0
        # offset conv: 2 values (dy, dx) per tap per deform group, zero-init
        off = nn.Conv(
            dg * 2 * K, (k, k), padding="SAME",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv_offset",
        )(x)
        off = off.reshape(b, h, w, dg, K, 2)

        # base sampling grid: p + p_k
        ky, kx = np.meshgrid(
            np.arange(k) - (k - 1) // 2, np.arange(k) - (k - 1) // 2, indexing="ij"
        )
        ky = jnp.asarray(ky.reshape(-1), jnp.float32)
        kx = jnp.asarray(kx.reshape(-1), jnp.float32)
        gy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        gx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]

        cols = []
        cdg = c // dg
        for di in range(dg):
            py = gy + ky[None, None, None, :] + off[..., di, :, 0]
            px = gx + kx[None, None, None, :] + off[..., di, :, 1]
            cols.append(
                _bilinear_gather(x[..., di * cdg:(di + 1) * cdg], py, px)
            )
        col = jnp.concatenate(cols, axis=-1)  # [B, H, W, K, C]

        if g == 1:
            kernel = self.param(
                "kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                (K * c, self.out_channels),
            )
            out = jnp.dot(
                col.reshape(b * h * w, K * c), kernel,
                preferred_element_type=jnp.float32,
            ).reshape(b, h, w, self.out_channels)
        else:
            # grouped conv: [g, K*(C/g), Cout/g]; group i's outputs read
            # input channel group i only
            cg, og = c // g, self.out_channels // g
            kernel = self.param(
                "kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                (g, K * cg, og),
            )
            outs = []
            for gi in range(g):
                col_g = col[..., gi * cg:(gi + 1) * cg].reshape(
                    b * h * w, K * cg
                )
                outs.append(jnp.dot(
                    col_g, kernel[gi], preferred_element_type=jnp.float32
                ))
            out = jnp.concatenate(outs, axis=-1).reshape(
                b, h, w, self.out_channels
            )
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.out_channels,)
            )
        return out


def torch_dcn_weight_to_params(w_torch: np.ndarray, groups: int = 1) -> np.ndarray:
    """mmcv DeformConv2d weight [Cout, Cin/groups, kH, kW] -> this module's
    kernel param: [K*Cin, Cout] (groups=1) or [g, K*(Cin/g), Cout/g].

    Tap order is row-major (kH, kW), matching the base-grid construction
    above; within a tap, channels are contiguous — the same im2col layout
    the sparse convs use."""
    w = np.asarray(w_torch, np.float32)
    cout, cg, kh, kw = w.shape
    K = kh * kw
    og = cout // groups
    # [Cout, Cin/g, kH, kW] -> [Cout, K, Cin/g] -> [Cout, K*Cin/g]
    flat = w.transpose(0, 2, 3, 1).reshape(cout, K * cg)
    if groups == 1:
        return flat.T  # [K*Cin, Cout]
    return np.stack(
        [flat[gi * og:(gi + 1) * og].T for gi in range(groups)], axis=0
    )
