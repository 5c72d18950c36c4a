"""Sparse 3D middle encoder (spconv SparseEncoder-equivalent, TPU-native).

Reproduces the capability of mmdet3d's `SparseEncoder` over
sparse_shape [41, 1600, 1408] (reference config
configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:19-23,
hot path models/detectors/adversarial_voxelnet.py:141, which in the reference
runs on spconv's CUDA kernels) as a stack of static-shape gather-matmul sparse
convolutions (see ops/sparse.py for the index machinery).

Architecture (mmdet3d defaults for SECOND/CenterPoint):
    conv_input: subm k3 (in -> 16)
    stage 1: subm k3 x1 (16)
    stage 2: strided k3 s2 (16->32), subm x2
    stage 3: strided k3 s2 (32->64), subm x2
    stage 4: strided k3 s2 (64->64, z-pad 0), subm x2
    conv_out: strided k(3,1,1) s(2,1,1) (->128), then dense scatter and the
    remaining z-planes fold into channels: [B, H/8, W/8, 2*128].

The whole batch is ONE sparse array (4D coords with batch as the leading
axis), so convs are single big matmuls and BatchNorm statistics span the full
batch exactly like the reference's BN1d.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse
from .layers import MaskedBatchNorm


class SparseConvBlock(nn.Module):
    """One sparse conv (submanifold or strided) + masked BN + ReLU."""

    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    subm: bool = True
    out_cap: int = 0           # required when not subm
    remat: bool = True          # recompute img2col in backward (saves HBM)

    @nn.compact
    def __call__(self, feats, grid: sparse.SparseGrid, train: bool):
        # batch axis: kernel 1 / stride 1 / pad 0
        k4 = (1,) + tuple(self.kernel_size)
        s4 = (1,) + tuple(self.stride)
        p4 = (0,) + tuple(self.padding)
        offs = sparse.kernel_offsets(k4)
        ktaps = int(np.prod(k4))
        cin = feats.shape[-1]

        if self.subm:
            out_grid = grid
        else:
            out_grid = sparse.downsample_sites(grid, k4, s4, p4, self.out_cap)

        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (ktaps * cin, self.out_channels),
        )

        def conv(f):
            gathered = sparse.gather_neighbors(
                f, grid, out_grid.coords, out_grid.mask, offs, s4, p4
            )
            col = gathered.reshape(gathered.shape[0], ktaps * cin)
            return jnp.dot(col, kernel, preferred_element_type=jnp.float32)

        out = jax.checkpoint(conv)(feats) if self.remat else conv(feats)
        out = MaskedBatchNorm()(out, out_grid.mask, train)
        out = nn.relu(out)
        out = jnp.where(out_grid.mask[:, None], out, 0.0)
        return out, out_grid


class SparseEncoder(nn.Module):
    """Sparse middle encoder: [N, Cin] voxel features -> dense BEV map."""

    sparse_shape: Tuple[int, int, int]  # (D, H, W), e.g. (41, 1600, 1408)
    in_channels: int = 4
    base_channels: int = 16
    encoder_channels: Sequence[Sequence[int]] = ((16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
    out_channels: int = 128
    # static active-site caps after each strided downsample, as a fraction of
    # the input voxel cap; lidar scenes shrink ~2x per stride-2 despite kernel
    # dilation, so these defaults hold with margin
    stage_cap_factors: Sequence[float] = (1.0, 1.0, 0.75, 0.5)
    out_cap_factor: float = 0.5

    @nn.compact
    def __call__(self, voxel_features, grid: sparse.SparseGrid, train: bool):
        """
        Args:
            voxel_features: [N, Cin] merged-batch voxel features.
            grid: 4D SparseGrid (batch, z, y, x) aligned with features.
        Returns:
            BEV map [B, H/8, W/8, 2*out_channels].
        """
        n_cap = voxel_features.shape[0]
        x, g = SparseConvBlock(self.base_channels, name="conv_input")(
            voxel_features, grid, train
        )
        for i, stage in enumerate(self.encoder_channels):
            for j, ch in enumerate(stage):
                if i != 0 and j == 0:
                    # stage 4 uses z-padding 0 (mmdet3d encoder_paddings)
                    pad = (0, 1, 1) if i == len(self.encoder_channels) - 1 else (1, 1, 1)
                    x, g = SparseConvBlock(
                        ch,
                        stride=(2, 2, 2),
                        padding=pad,
                        subm=False,
                        out_cap=max(int(n_cap * self.stage_cap_factors[i]), 1),
                        name=f"stage{i}_down",
                    )(x, g, train)
                else:
                    x, g = SparseConvBlock(ch, name=f"stage{i}_subm{j}")(x, g, train)

        x, g = SparseConvBlock(
            self.out_channels,
            kernel_size=(3, 1, 1),
            stride=(2, 1, 1),
            padding=(0, 0, 0),
            subm=False,
            out_cap=max(int(n_cap * self.out_cap_factor), 1),
            name="conv_out",
        )(x, g, train)

        dense = sparse.scatter_to_dense(x, g)  # [B, Dz, H', W', C]
        b, dz, h, w, c = dense.shape
        # fold remaining z planes into channels: [B, H', W', Dz*C]
        return jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(b, h, w, dz * c)
