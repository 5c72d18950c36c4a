"""Generic config-driven training entry point.

Mirrors the reference's mmdet3d-style generic trainer (train.py:17-135):
takes a config file (core/config.py `_base_` inheritance), `--work-dir`,
`--resume`, `--cfg-options` dotted overrides, and dispatches to the model
family named by `model.type`. The reference's `--launcher` flag family
(pytorch/slurm/mpi DDP) is replaced by the mesh: pass `--devices N` to shard
the batch over the first N attached devices (XLA inserts the gradient psum;
SURVEY.md §2c).
"""
from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector from a config file")
    p.add_argument("config", help="config python file")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume", nargs="?", const="auto", default=None)
    p.add_argument("--devices", type=int, default=None,
                   help="data-parallel device count (default: all attached)")
    p.add_argument("--amp", action="store_true",
                   help="bfloat16 matmul precision (reference --amp equivalent)")
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    if args.amp:
        import jax

        jax.config.update("jax_default_matmul_precision", "bfloat16")
    from ..core import Config

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_cli(args.cfg_options)

    work_dir = args.work_dir or cfg.get("work_dir", "work_dirs/train")
    model_type = cfg.get("model", {}).get("type", "AdversarialVoxelNet")

    if model_type in ("AdversarialVoxelNet", "VoxelNet"):
        from .train_kitti_3class_adversarial import main as kitti_main
        import sys

        argv = ["train", "--work-dir", work_dir, "--synthetic"]
        if args.resume:
            argv.append("--resume")
        if cfg.get("max_epochs"):
            argv += ["--epochs", str(cfg.get("max_epochs"))]
        sys.argv = argv
        return kitti_main()
    elif model_type in ("AdversarialCenterPoint", "CenterPoint"):
        from .train_nuscenes_adversarial import main as nus_main
        import sys

        argv = ["train", "--work-dir", work_dir, "--synthetic"]
        if args.resume:
            argv.append("--resume")
        sys.argv = argv
        return nus_main()
    elif model_type == "StrongAdversarialVoxelNet":
        from .train_kitti_adversarial_strong import main as strong_main
        import sys

        sys.argv = ["train", "--work-dir", work_dir, "--synthetic"]
        return strong_main()
    raise ValueError(f"unknown model type {model_type!r}")


if __name__ == "__main__":
    main()
