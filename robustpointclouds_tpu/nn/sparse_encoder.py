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

TPU design notes:
  * The whole batch is ONE sparse array (4D coords with batch as the leading
    axis): single big sorts/searches/matmuls, and BatchNorm statistics span
    the full batch exactly like the reference's BN1d.
  * The submanifold neighbor relation is computed ONCE per grid resolution
    (one rank sort) and shared by every subm conv on that grid.
  * Gather formulation is chosen PER LAYER WIDTH (v5e A/B, bf16, N=96k):
    narrow rows are row-count-bound (16ch and 64ch dense rows cost the same,
    ~3.3 ns/row), so the x-window table's 3x-fewer-but-3x-wider rows win at
    Cin <= XWIN_MAX_CIN (12.6 vs 19.3 ms fwd+bwd at 16ch; 13.9 vs 20.2 at
    32ch) — but by 64ch the 3*C-wide rows go byte-bound and lose 1.9x
    (35.3 vs 18.8 ms), so 64ch layers use the dense [N, K] index. The per-site slot-resolution variant
    tried first lost 2-4x everywhere and is gone.
  * Strided convs reuse their fused-downsample dense index for the backward;
    the forward picks xwin (derived FREE from that index) or dense by the
    same width rule.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import mp_conv, sparse
from ..ops import subm_conv as subm_conv_ops
from .layers import MaskedBatchNorm

_SUBM_KERNEL = (1, 3, 3, 3)  # batch axis has extent 1

# widest Cin for which the x-window gather beats the dense-index gather on
# v5e: 32ch still wins 1.45x (13.9 vs 20.2 ms fwd+bwd; 192 B rows stay
# row-count-bound), 64ch loses 1.9x (384 B rows go byte-bound)
XWIN_MAX_CIN = 32

# merge-path Pallas kernel tile geometry (kernels/mp_gather.py): the table
# window needs TPAD-1 + D + kx = 530 rows; 544 is the 16-aligned cover
MP_TILE = 512
MP_WLEN = 544
# tests flip this to exercise the integrated mp path in interpreter mode
MP_INTERPRET = False

# A/B gate: densify the conv_out features by a plan-carried dense-cell ->
# sparse-row gather map instead of an N-row feature scatter (TPU scatters
# serialize; both directions of the gather form are scatter-free). Default
# OFF until the whole-step scan measurement (tools/bench_r4_step) says
# otherwise — the round-3 lesson is that component wins don't compose.
import os as _os

DENSE_GATHER = _os.environ.get("RPC_DENSE_GATHER", "0") == "1"


def _mp_kernel_available() -> bool:
    """Whether the Pallas merge-path kernel is the right default: NO.

    Measured on the v5e (tools/bench_mp_kernel, N=96k, D=512): correct
    (rel err 5e-3 bf16) but 27-30 ms fwd+bwd at every width vs 12.6 (xwin
    16ch) / 17.2 (dense 64ch) — the one-hot matmuls are MXU-bound at
    S*kx*TWIN*DW*cout_pad*2*T ≈ 0.9 TFLOP per 96k-row conv forward
    regardless of channel width (lanes pad to 128), which exceeds what the
    XLA gather engine charges. The kernel stays as a correct opt-in
    (use_mp_kernel=True) and the geometry levers (smaller D, merge-path
    band skip, VMEM output carry) are tracked in PARITY.md round-3 notes."""
    return False


def _down_geom(num_stages: int, stage_i: int):
    """Static kernel/stride/padding of the stage-i strided downsample."""
    zpad = 0 if stage_i == num_stages - 1 else 1
    return (1, 3, 3, 3), (1, 2, 2, 2), (0, zpad, 1, 1)


_OUT_GEOM = ((1, 3, 1, 1), (1, 2, 1, 1), (0, 0, 0, 0))  # conv_out (mmdet3d)


def _down_shape(in_shape, kernel, stride, padding):
    return tuple(
        (dim + 2 * p - k) // s + 1
        for dim, k, s, p in zip(in_shape, kernel, stride, padding)
    )


def encoder_plan(
    grid: sparse.SparseGrid,
    n_cap: int,
    in_channels: int = 4,
    base_channels: int = 16,
    encoder_channels: Sequence[Sequence[int]] = (
        (16,), (32, 32, 32), (64, 64, 64), (64, 64, 64)
    ),
    stage_cap_factors: Sequence[float] = (1.0, 1.0, 0.75, 0.5),
    out_cap_factor: float = 0.5,
):
    """Every neighbor/downsample index the encoder needs, as a dict of arrays.

    This is the ONLY index-building code path: :class:`SparseEncoder` calls it
    inline (traced into the device step) when no precomputed plan is passed,
    and the host input pipeline calls the SAME function jitted on the CPU
    backend to prepare plans ahead of the device (models/plan.py). Everything
    here depends only on the sparse structure (voxel coordinates) — never on
    parameters or features — which is what makes host-side preparation exact:
    the reference's spconv builds these index pairs on-GPU inside the step
    (models/detectors/adversarial_voxelnet.py:141); on TPU the rank/candidate
    sorts were measured at ~38% of the encoder step (PARITY.md), so moving
    them into the (otherwise idle) input pipeline shortens the device critical
    path by exactly that much.

    Returns a dict with keys rel0..relS (submanifold relations per grid
    level: {rows, xvalid} in x-window form or {idx} dense by the width rule),
    down1..downS (strided-layer output grid arrays {ids, coords, mask, inv}
    plus {rows, xvalid} or {idx} for the forward gather), and out (conv_out).
    Only arrays — static shapes are re-derived by the consumer.
    """
    plan = {}

    def subm_rel(g: sparse.SparseGrid, cin: int):
        import numpy as _np

        id_space = int(_np.prod([int(s) for s in g.spatial_shape], dtype=_np.int64))
        # neighbor_xwin_info switches to the WIDE two-key rank sort past the
        # 2^30 pack cap, so the width rule holds for any int32 id space —
        # keeping the plan layout identical between the jax and native
        # builders at every batch size (the native builder has no cap)
        xwin_cap = sparse._WIDE_BAND
        if cin <= XWIN_MAX_CIN and id_space + _SUBM_KERNEL[-1] < xwin_cap:
            xw = sparse.neighbor_xwin_info(
                g, g.coords, g.mask, _SUBM_KERNEL, (1, 1, 1, 1), (0, 1, 1, 1)
            )
            return {"rows": xw.rows, "xvalid": xw.xvalid}
        return {
            "idx": sparse.neighbor_index(
                g, g.coords, g.mask, _SUBM_KERNEL, (1, 1, 1, 1), (0, 1, 1, 1)
            )
        }

    g = grid
    plan["rel0"] = subm_rel(g, max(in_channels, base_channels))
    for i, stage in enumerate(encoder_channels):
        if i == 0:
            continue
        k4, s4, p4 = _down_geom(len(encoder_channels), i)
        cin = encoder_channels[i - 1][-1]
        use_xwin = cin <= XWIN_MAX_CIN
        # when the forward gather runs in x-window form the dense forward
        # index is never consumed — skip its scatter transpose entirely
        new_g, down_idx, down_inv = sparse.downsample_with_index(
            g, k4, s4, p4,
            out_cap=max(int(n_cap * stage_cap_factors[i]), 1),
            forward=not use_xwin,
        )
        st = {"ids": new_g.flat_ids, "coords": new_g.coords, "mask": new_g.mask,
              "inv": down_inv}
        if use_xwin:
            # derive the x-window forward form from the inverse index's
            # transpose-free info: xwin_from_index needs the dense idx, so
            # build it from inv (one scatter) only for the xwin derivation
            dense_idx = sparse.inverse_from_forward(down_inv, new_g.flat_ids.shape[0])
            xw = sparse.xwin_from_index(
                dense_idx, new_g.coords, new_g.mask, k4[-1],
                g.flat_ids.shape[0], s4[-1], p4[-1], g.spatial_shape[-1],
            )
            st["rows"] = xw.rows
            st["xvalid"] = xw.xvalid
        else:
            st["idx"] = down_idx
        plan[f"down{i}"] = st
        g = new_g
        plan[f"rel{i}"] = subm_rel(g, stage[0])

    k4, s4, p4 = _OUT_GEOM
    out_g, out_idx, out_inv = sparse.downsample_with_index(
        g, k4, s4, p4, out_cap=max(int(n_cap * out_cap_factor), 1), forward=True
    )
    plan["out"] = {"ids": out_g.flat_ids, "coords": out_g.coords,
                   "mask": out_g.mask, "idx": out_idx, "inv": out_inv}
    if DENSE_GATHER:
        plan["out"]["dense"] = sparse.dense_gather_map(out_g)
    return plan


class SparseConvBlock(nn.Module):
    """One sparse conv (gather-matmul) + masked BN + ReLU.

    For submanifold convs (`symmetric_taps=True`, the default) the conv uses
    the scatter-free custom VJP (ops/subm_conv.py) — the neighbor relation is
    symmetric, so the backward is another gather, measured ~6x faster than
    the autodiff scatter-add. Strided convs (asymmetric relation) gather
    through an inverse index in the backward (also scatter-free).
    """

    out_channels: int
    symmetric_taps: bool = True
    # compute dtype for the gather+matmul (params and BN stats stay f32);
    # bf16 halves the img2col gather traffic, the dominant cost on TPU
    dtype: jnp.dtype = jnp.float32
    # last-axis kernel extent for the merge-path kernel path
    mp_kx: int = 3

    @nn.compact
    def __call__(self, feats, out_mask, train: bool, idx=None, inv_idx=None,
                 xwin=None, ids=None, mp_pack=None):
        """Subm form: pass (xwin, ids) from sparse.neighbor_xwin_info, or
        mp_pack from mp_conv.subm_mp3_pack (Pallas merge-path kernel), on
        the layer's grid. Strided form: pass idx (+ inv_idx for the
        gather-based backward)."""
        if mp_pack is not None:
            ktaps = mp_pack.q_offs.shape[0] * self.mp_kx
        elif xwin is not None:
            ktaps = xwin.num_taps
        else:
            _, ktaps = idx.shape
        cin = feats.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (ktaps * cin, self.out_channels),
        )
        feats = feats.astype(self.dtype)
        kernel = kernel.astype(self.dtype)

        if self.symmetric_taps:
            if mp_pack is not None:
                out = mp_conv.mp3_subm_conv(
                    self.mp_kx, MP_TILE, MP_WLEN, feats, kernel, mp_pack,
                    interpret=MP_INTERPRET,
                )
            elif xwin is not None:
                out = subm_conv_ops.subm_conv_xwin(
                    xwin.kx, feats, kernel, ids, xwin.rows, xwin.xvalid
                )
            else:
                out = subm_conv_ops.subm_conv(feats, kernel, idx)
        elif mp_pack is not None and inv_idx is not None:
            out = mp_conv.mp3_strided_conv(
                self.mp_kx, MP_TILE, MP_WLEN, feats, kernel, mp_pack, inv_idx,
                interpret=MP_INTERPRET,
            )
        elif xwin is not None and inv_idx is not None:
            out = subm_conv_ops.strided_conv_xwin(
                feats, kernel, ids, xwin.rows, xwin.xvalid, inv_idx
            )
        elif inv_idx is not None:
            out = subm_conv_ops.strided_conv_t(feats, kernel, idx, inv_idx)
        else:
            out = jax.checkpoint(
                lambda f: subm_conv_ops.strided_conv(f, kernel, idx)
            )(feats)
        out = MaskedBatchNorm(dtype=self.dtype)(out, out_mask, train)
        out = nn.relu(out)
        return jnp.where(out_mask[:, None], out, jnp.zeros((), self.dtype))


class SparseSubmConv(nn.Module):
    """Bare submanifold sparse conv (gather-matmul), no norm/activation.

    The conv piece of :class:`SparseConvBlock`, factored out so residual
    blocks can place BN/ReLU around the residual add themselves."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, idx=None, xwin=None, ids=None):
        ktaps = xwin.num_taps if xwin is not None else idx.shape[1]
        cin = feats.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (ktaps * cin, self.out_channels),
        )
        feats = feats.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if xwin is not None:
            return subm_conv_ops.subm_conv_xwin(
                xwin.kx, feats, kernel, ids, xwin.rows, xwin.xvalid
            )
        return subm_conv_ops.subm_conv(feats, kernel, idx)


class SparseBasicBlock(nn.Module):
    """Residual sparse block: conv1-bn1-relu-conv2-bn2 (+x) relu.

    spconv/mmdet3d `SparseBasicBlock` — the stage unit of the CenterPoint
    middle encoder (`block_type='basicblock'`, the reference's base config
    centerpoint_voxel01_second_secfpn_head-dcn-circlenms). Submanifold convs
    preserve the active-site set, so the residual add is a plain row-wise
    add on the same grid. Param names (conv1/bn1/conv2/bn2) line up with
    tools/convert_torch_checkpoint.convert_centerpoint_state_dict."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, mask, train: bool, idx=None, xwin=None, ids=None):
        rel = dict(idx=idx, xwin=xwin, ids=ids)
        identity = feats.astype(self.dtype)
        x = SparseSubmConv(self.channels, dtype=self.dtype, name="conv1")(
            feats, **rel
        )
        x = MaskedBatchNorm(dtype=self.dtype, name="bn1")(x, mask, train)
        x = nn.relu(x)
        x = SparseSubmConv(self.channels, dtype=self.dtype, name="conv2")(
            x, **rel
        )
        x = MaskedBatchNorm(dtype=self.dtype, name="bn2")(x, mask, train)
        x = nn.relu(x + identity)
        return jnp.where(mask[:, None], x, jnp.zeros((), self.dtype))


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
    dtype: jnp.dtype = jnp.float32
    # None = auto: Pallas merge-path kernel on TPU, XLA gathers elsewhere
    use_mp_kernel: bool = None
    # mmdet3d block_type='basicblock' (the CenterPoint base config): each
    # stage is residual SparseBasicBlocks with the strided downsample as the
    # stage's LAST element (vs first for the SECOND conv_module layout); the
    # final stage has no downsample. Consumes the same encoder_plan — the
    # rel/down sequence over grids is identical, only the traversal differs.
    residual: bool = False

    @nn.compact
    def __call__(self, voxel_features, grid: sparse.SparseGrid, train: bool,
                 plan=None):
        """
        Args:
            voxel_features: [N, Cin] merged-batch voxel features.
            grid: 4D SparseGrid (batch, z, y, x) aligned with features.
            plan: optional precomputed index plan from :func:`encoder_plan` —
                the host input pipeline builds it on CPU so the device step
                contains no rank/candidate sorts (they were ~38% of the
                encoder step, PARITY.md). When None the same function is
                traced inline: identical ops, identical numerics.
        Returns:
            BEV map [B, H/8, W/8, 2*out_channels].
        """
        n_cap = voxel_features.shape[0]

        use_mp = self.use_mp_kernel
        if use_mp is None:
            use_mp = _mp_kernel_available()
        if use_mp:
            assert plan is None, "precomputed plans do not carry mp packs"
            assert not self.residual, "mp kernel path has no residual variant"
            return self._forward_mp(voxel_features, grid, train)
        if plan is None:
            plan = encoder_plan(
                grid, n_cap, self.in_channels, self.base_channels,
                self.encoder_channels, self.stage_cap_factors,
                self.out_cap_factor,
            )

        def rel_kwargs(rel, g):
            if "rows" in rel:
                xw = sparse.XWindowInfo(
                    rel["rows"], rel["xvalid"], _SUBM_KERNEL[-1],
                    g.flat_ids.shape[0],
                )
                return dict(xwin=xw, ids=g.flat_ids)
            return dict(idx=rel["idx"])

        x = voxel_features
        g = grid
        rel = plan["rel0"]
        x = SparseConvBlock(self.base_channels, dtype=self.dtype, name="conv_input")(
            x, g.mask, train, **rel_kwargs(rel, g)
        )

        def apply_down(x, g, ch, down_i, name):
            k4, s4, p4 = _down_geom(len(self.encoder_channels), down_i)
            st = plan[f"down{down_i}"]
            new_g = sparse.SparseGrid(
                st["ids"], st["coords"], st["mask"],
                _down_shape(g.spatial_shape, k4, s4, p4),
            )
            if "rows" in st:
                xw = sparse.XWindowInfo(
                    st["rows"], st["xvalid"], k4[-1], g.flat_ids.shape[0]
                )
                down_kw = dict(xwin=xw, ids=g.flat_ids)
            else:
                down_kw = dict(idx=st["idx"])
            x = SparseConvBlock(
                ch, symmetric_taps=False, dtype=self.dtype, name=name,
            )(x, new_g.mask, train, inv_idx=st["inv"], **down_kw)
            return x, new_g

        if self.residual:
            # basicblock layout: res blocks then the down (last element),
            # no down on the final stage (z-pad rule: the LAST of the 3 downs
            # is stage index len-1 in _down_geom terms — same geometry as the
            # conv_module layout, so plan["down{k}"] lines up 1:1)
            n_stages = len(self.encoder_channels)
            for i, stage in enumerate(self.encoder_channels):
                n_res = len(stage) if i == n_stages - 1 else len(stage) - 1
                for j in range(n_res):
                    x = SparseBasicBlock(
                        stage[j], dtype=self.dtype, name=f"stage{i}_res{j}"
                    )(x, g.mask, train, **rel_kwargs(rel, g))
                if i != n_stages - 1:
                    x, g = apply_down(x, g, stage[-1], i + 1, f"stage{i}_down")
                    rel = plan[f"rel{i + 1}"]
        else:
            for i, stage in enumerate(self.encoder_channels):
                for j, ch in enumerate(stage):
                    if i != 0 and j == 0:
                        x, g = apply_down(x, g, ch, i, f"stage{i}_down")
                        rel = plan[f"rel{i}"]
                    else:
                        x = SparseConvBlock(ch, dtype=self.dtype, name=f"stage{i}_subm{j}")(
                            x, g.mask, train, **rel_kwargs(rel, g)
                        )

        k4, s4, p4 = _OUT_GEOM
        st = plan["out"]
        out_g = sparse.SparseGrid(
            st["ids"], st["coords"], st["mask"],
            _down_shape(g.spatial_shape, k4, s4, p4),
        )
        x = SparseConvBlock(
            self.out_channels, symmetric_taps=False, dtype=self.dtype,
            name="conv_out",
        )(x, out_g.mask, train, inv_idx=st["inv"], idx=st["idx"])

        if "dense" in st:
            dense = sparse.scatter_to_dense_gather(x, out_g, st["dense"])
        else:
            dense = sparse.scatter_to_dense(x, out_g)  # [B, Dz, H', W', C]
        b, dz, h, w, c = dense.shape
        # fold remaining z planes into channels: [B, H', W', Dz*C]
        return jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(b, h, w, dz * c)

    def _forward_mp(self, voxel_features, grid: sparse.SparseGrid, train: bool):
        """Opt-in Pallas merge-path kernel traversal (use_mp_kernel=True).

        Measured slower than the XLA paths at every width (module docstring);
        kept as the correct kernel scaffold. Index building stays inline here.
        """
        n_cap = voxel_features.shape[0]
        use_mp = True

        def subm_rel(g: sparse.SparseGrid, cin: int):
            # ONE relation build per grid resolution, shared by every subm
            # conv on it. On TPU the Pallas merge-path kernel replaces both
            # the rank sort and the gathers (boundaries are a vectorized
            # binary search; values clamp at 2^31-2^26, lifting the packed
            # sort's 30-bit id-space cap). Off-TPU: xwin or dense by the
            # width rule (module docstring); the packed rank sort needs the
            # merged-batch id space in 30 bits (true up to B=11 at the
            # KITTI grid), beyond that the dense index's lookup degrades to
            # the non-packed path.
            import numpy as _np

            if use_mp:
                return {
                    "mp_pack": mp_conv.subm_mp3_pack(
                        g, _SUBM_KERNEL, D=MP_TILE, wlen=MP_WLEN
                    )
                }
            id_space = int(_np.prod([int(s) for s in g.spatial_shape],
                                    dtype=_np.int64))
            # merge-path ranks (not the packed sort) build subm relations, so
            # the only bound is int32 id space — no 2^30 batch cliff (with
            # the ranks A/B-gated off, the packed sort's cap returns)
            xwin_cap = (
                sparse.INT32_MAX - (1 << 26)
                if sparse.MP_RANKS
                else sparse._PACK_CAP
            )
            if cin <= XWIN_MAX_CIN and id_space + _SUBM_KERNEL[-1] < xwin_cap:
                return {
                    "xwin": sparse.neighbor_xwin_info(
                        g, g.coords, g.mask, _SUBM_KERNEL, (1, 1, 1, 1), (0, 1, 1, 1)
                    ),
                    "ids": g.flat_ids,
                }
            return {
                "idx": sparse.neighbor_index(
                    g, g.coords, g.mask, _SUBM_KERNEL, (1, 1, 1, 1), (0, 1, 1, 1)
                )
            }

        x = voxel_features
        g = grid
        # conv_input (Cin=4) and stage-0 subm (16) share the grid-0 relation
        rel = subm_rel(g, max(self.in_channels, self.base_channels))
        x = SparseConvBlock(self.base_channels, dtype=self.dtype, name="conv_input")(
            x, g.mask, train, **rel
        )
        for i, stage in enumerate(self.encoder_channels):
            for j, ch in enumerate(stage):
                if i != 0 and j == 0:
                    # stage 4 uses z-padding 0 (mmdet3d encoder_paddings)
                    zpad = 0 if i == len(self.encoder_channels) - 1 else 1
                    k4, s4, p4 = (
                        (1, 3, 3, 3),
                        (1, 2, 2, 2),
                        (0, zpad, 1, 1),
                    )
                    # one candidate sort yields sites + forward + inverse
                    # index (forward skipped when the mp kernel gathers)
                    new_g, down_idx, down_inv = sparse.downsample_with_index(
                        g, k4, s4, p4,
                        out_cap=max(int(n_cap * self.stage_cap_factors[i]), 1),
                        forward=not use_mp,
                    )
                    if use_mp:
                        down_kw = dict(mp_pack=mp_conv.strided_mp3_pack(
                            g, new_g, k4, s4, p4, D=MP_TILE, wlen=MP_WLEN,
                        ))
                    elif x.shape[-1] <= XWIN_MAX_CIN:
                        # x-window forward gather, derived FREE from the index
                        down_xwin = sparse.xwin_from_index(
                            down_idx, new_g.coords, new_g.mask, k4[-1],
                            g.flat_ids.shape[0], s4[-1], p4[-1],
                            g.spatial_shape[-1],
                        )
                        down_kw = dict(xwin=down_xwin, ids=g.flat_ids)
                    else:
                        down_kw = dict(idx=down_idx)
                    x = SparseConvBlock(
                        ch, symmetric_taps=False, dtype=self.dtype,
                        name=f"stage{i}_down",
                    )(x, new_g.mask, train, inv_idx=down_inv, **down_kw)
                    g = new_g
                    rel = subm_rel(g, ch)
                else:
                    x = SparseConvBlock(ch, dtype=self.dtype, name=f"stage{i}_subm{j}")(
                        x, g.mask, train, **rel
                    )

        # conv_out: kernel (3,1,1) stride (2,1,1) padding 0 over (z,y,x) —
        # kx == 1, so the window form degenerates; fused dense index path
        k4, s4, p4 = (1, 3, 1, 1), (1, 2, 1, 1), (0, 0, 0, 0)
        out_g, out_idx, out_inv = sparse.downsample_with_index(
            g, k4, s4, p4, out_cap=max(int(n_cap * self.out_cap_factor), 1),
            forward=not use_mp,
        )
        if use_mp:
            out_kw = dict(mp_pack=mp_conv.strided_mp3_pack(
                g, out_g, k4, s4, p4, D=MP_TILE, wlen=MP_WLEN,
            ))
            mp_kx_out = 1
        else:
            out_kw = dict(idx=out_idx)
            mp_kx_out = 3
        x = SparseConvBlock(
            self.out_channels, symmetric_taps=False, dtype=self.dtype,
            mp_kx=mp_kx_out, name="conv_out",
        )(x, out_g.mask, train, inv_idx=out_inv, **out_kw)

        dense = sparse.scatter_to_dense(x, out_g)  # [B, Dz, H', W', C]
        b, dz, h, w, c = dense.shape
        # fold remaining z planes into channels: [B, H', W', Dz*C]
        return jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(b, h, w, dz * c)
