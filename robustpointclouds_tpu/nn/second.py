"""SECOND BEV backbone + SECONDFPN neck (dense 2D conv stacks, NHWC).

Equivalents of mmdet3d's `SECOND` (layer_nums [5,5], strides [1,2], channels
[128,256]) and `SECONDFPN` (deconv upsample strides [1,2] -> concat 512ch) the
reference configures at
configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:25-36.
Plain XLA convolutions — these map straight onto the MXU.
"""
from __future__ import annotations

import os as _os
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# A/B gate: stride-2 deconv as 1x1-matmul + depth-to-space (same weights,
# same numerics — kernel == stride means the transpose conv has no overlap,
# each input pixel stamps one s x s block). Isolated round-3 measurement:
# 4.7 vs 8.6 ms for the FPN; default OFF pending the whole-step gate
# (tools/bench_r4_step re-measures it under the host-plan schedule).
FPN_D2S = _os.environ.get("RPC_FPN_D2S", "0") == "1"


class _DeconvD2S(nn.Module):
    """ConvTranspose(k=s, stride=s) as matmul + depth-to-space.

    Parameter name/shape identical to nn.ConvTranspose ("kernel",
    [s, s, cin, cout]) so checkpoints load into either form.
    """

    features: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s, ch = self.stride, self.features
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (s, s, cin, ch)
        ).astype(self.dtype)
        b, h, w, _ = x.shape
        # lax.conv_transpose (flax default) applies the kernel spatially
        # FLIPPED relative to the stamped block — matches to float roundoff
        # (~1e-7 f32; accumulation order differs), pinned by test_nn
        k2 = jnp.transpose(kernel[::-1, ::-1], (2, 0, 1, 3)).reshape(
            cin, s * s * ch
        )
        y = jnp.dot(x, k2, preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.reshape(b, h, w, s, s, ch)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, h * s, w * s, ch)
        return y


class ConvBNReLU(nn.Module):
    channels: int
    stride: int = 1
    kernel: int = 3
    # compute dtype (params f32; flax BN promotes stat reductions to f32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.channels,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
        )(x.astype(self.dtype))
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class SECONDBackbone(nn.Module):
    """Multi-stage 2D conv backbone over the BEV map. Returns all stage outputs."""

    out_channels: Sequence[int] = (128, 256)
    layer_nums: Sequence[int] = (5, 5)
    layer_strides: Sequence[int] = (1, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> Tuple[jnp.ndarray, ...]:
        outs = []
        for i, (ch, n, s) in enumerate(
            zip(self.out_channels, self.layer_nums, self.layer_strides)
        ):
            x = ConvBNReLU(ch, stride=s, dtype=self.dtype, name=f"stage{i}_conv0")(x, train)
            for j in range(n):
                x = ConvBNReLU(ch, dtype=self.dtype, name=f"stage{i}_conv{j + 1}")(x, train)
            outs.append(x)
        return tuple(outs)


class SECONDFPN(nn.Module):
    """Upsample each backbone stage to a common resolution and concat."""

    out_channels: Sequence[int] = (256, 256)
    upsample_strides: Sequence[int] = (1, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...], train: bool) -> jnp.ndarray:
        ups = []
        for i, (x, ch, s) in enumerate(zip(feats, self.out_channels, self.upsample_strides)):
            x = x.astype(self.dtype)
            if s > 1:
                if FPN_D2S:
                    x = _DeconvD2S(ch, s, dtype=self.dtype,
                                   name=f"deblock{i}_deconv")(x)
                else:
                    x = nn.ConvTranspose(
                        ch, (s, s), strides=(s, s), use_bias=False,
                        dtype=self.dtype, name=f"deblock{i}_deconv",
                    )(x)
            else:
                x = nn.Conv(
                    ch, (s, s), strides=(s, s), use_bias=False, dtype=self.dtype,
                    name=f"deblock{i}_conv",
                )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-3,
                dtype=self.dtype, name=f"deblock{i}_bn",
            )(x)
            ups.append(nn.relu(x))
        return jnp.concatenate(ups, axis=-1)
