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

    # SECONDFPN neck: deblocks.{i}.0 (deconv/conv), .1 (bn)
    i = 0
    while f"neck.deblocks.{i}.0.weight" in sd:
        w = sd[f"neck.deblocks.{i}.0.weight"]
        if w.shape[2] > 1:  # deconv (stride>1 upsample)
            _set(params, f"neck/deblock{i}_deconv/kernel", convert_deconv2d(w))
        else:
            # stride-1 "upsample" is a plain conv in mmdet3d too
            _set(params, f"neck/deblock{i}_conv/kernel", convert_conv2d(w))
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
