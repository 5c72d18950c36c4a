"""SECOND BEV backbone + SECONDFPN neck (dense 2D conv stacks, NHWC).

Equivalents of mmdet3d's `SECOND` (layer_nums [5,5], strides [1,2], channels
[128,256]) and `SECONDFPN` (deconv upsample strides [1,2] -> concat 512ch) the
reference configures at
configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:25-36.
Plain XLA convolutions — these map straight onto the MXU.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


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
                x = nn.ConvTranspose(
                    ch, (s, s), strides=(s, s), use_bias=False, dtype=self.dtype,
                    name=f"deblock{i}_deconv",
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
