"""KITTI 3-class adversarial training entry point.

Mirrors the reference orchestrator's CLI and recipe
(train_kitti_3class_adversarial.py:57-274: batch 6, 20 epochs, val every 5,
checkpoint every 5 keep 10, logger 50; `--freeze-detector` zeroes detector
learning and boosts the adversary lr x20 with w=0.5 / reg=1e-5, :198-211).
The model is built FROM the config file (configs/adversarial/
adversarial-second_kitti-3d-3class.py by default) so `--cfg-options`
dotted overrides really change it (reference --cfg-options surface,
train.py:46-55), and `--load-from` warm-starts from a zoo checkpoint the way
the reference's `load_from` config key does
(adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:167).

    python -m robustpointclouds_tpu.cli.train_kitti_3class_adversarial \
        --validate --work-dir work_dirs/kitti_3class [--synthetic] \
        [--freeze-detector] [--resume] [--load-from ckpt.pth] [--devices N] \
        [--epochs N] [--cfg-options k=v ...]
"""
from __future__ import annotations

import argparse
import os

_DEFAULT_CFG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "configs", "adversarial", "adversarial-second_kitti-3d-3class.py",
)


def parse_args():
    p = argparse.ArgumentParser(description="KITTI 3-class adversarial training")
    p.add_argument("--config", default=_DEFAULT_CFG,
                   help="config file (default: the 3-class adversarial config)")
    p.add_argument("--validate", action="store_true", help="run validation during training")
    p.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    p.add_argument(
        "--freeze-detector", action="store_true",
        help="freeze detector, train adversary only (lr x20, w=0.5, reg=1e-5)",
    )
    p.add_argument("--load-from", default=None,
                   help="warm start from a zoo .pth or converted orbax dir")
    p.add_argument("--work-dir", default="work_dirs/kitti_3class_adversarial")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=6)
    p.add_argument("--devices", type=int, default=None,
                   help="data-parallel device count (mesh over ICI)")
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="override steps per epoch (default: dataset size)")
    p.add_argument("--data-root", default="data/kitti")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic scenes (no dataset required)")
    p.add_argument("--steps", type=int, default=None,
                   help="debug: limit total steps (implies tiny run)")
    p.add_argument("--tiny", action="store_true",
                   help="debug: shrink grid/voxel caps for fast smoke runs")
    p.add_argument("--cpu", action="store_true", help="debug: force CPU backend")
    p.add_argument("--amp", action="store_true",
                   help="bfloat16 matmul precision (reference --amp equivalent)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler device trace of steps 10-13")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="dotted config overrides key=value")
    return p.parse_args()


def main():
    args = parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.amp:
        import jax

        jax.config.update("jax_default_matmul_precision", "bfloat16")

    from ..core import Config
    from ..core.builders import build_train_config, build_voxelnet_config
    from ..train import Trainer
    from .common import run_training, synthetic_loader

    cfg = Config.fromfile(args.config) if os.path.isfile(args.config) else Config()
    if args.cfg_options:
        cfg.merge_from_cli(args.cfg_options)

    model_cfg = build_voxelnet_config(cfg)
    num_points = 20000
    if args.tiny:
        from ..ops.voxelize import VoxelizerConfig

        model_cfg = model_cfg._replace(
            voxelizer=VoxelizerConfig(
                point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
                voxel_size=(0.5, 0.5, 0.125),
                max_points_per_voxel=3,
                max_voxels=512,
            ),
            anchor_ranges=tuple(
                (0, -8.0, -0.6, 16.0, 8.0, -0.6) for _ in range(3)
            ),
        )
        num_points = 512
    steps_per_epoch = args.steps_per_epoch or (args.steps or 1000)
    overrides = dict(max_epochs=args.epochs, steps_per_epoch=steps_per_epoch)
    if args.freeze_detector:
        # reference freeze mode: detector lr off, adversary lr_mult 20,
        # adversarial weight 0.5, regularization 1e-5 (ref :198-211)
        overrides.update(
            adversary_lr_mult=20.0,
            adversarial_loss_weight=0.5,
            regularization_weight=1e-5,
            freeze_detector=True,
        )
        model_cfg = model_cfg._replace(adversary_start_epoch=0)
    train_cfg = build_train_config(cfg, **overrides)

    mesh = None
    if args.devices and args.devices > 1:
        import jax

        from ..parallel.mesh import make_mesh

        devs = jax.devices()
        if len(devs) < args.devices:
            raise SystemExit(f"--devices {args.devices} but only {len(devs)} attached")
        if args.batch_size % args.devices != 0:
            raise SystemExit(
                f"--batch-size {args.batch_size} not divisible by --devices {args.devices}"
            )
        mesh = make_mesh(devs[: args.devices])
        print(f"[mesh] data-parallel over {args.devices} devices")

    trainer = Trainer(model_cfg=model_cfg, train_cfg=train_cfg, mesh=mesh)

    if not args.synthetic:
        from ..data.kitti import kitti_available

        if not kitti_available(args.data_root):
            print(
                f"[data] KITTI not found under {args.data_root!r}; "
                "falling back to --synthetic scenes"
            )
            args.synthetic = True

    if args.synthetic:
        pcr = model_cfg.voxelizer.point_cloud_range
        loader = synthetic_loader(
            args.batch_size, steps_per_epoch, num_points=num_points,
            seed=args.seed, point_range=pcr,
        )
        val_loader = (
            (lambda: synthetic_loader(
                args.batch_size, 4, num_points=num_points,
                seed=args.seed + 999, point_range=pcr,
            )(0))
            if args.validate
            else None
        )
    else:
        from ..data.kitti import kitti_epoch_loader, kitti_val_loader

        loader = kitti_epoch_loader(
            args.data_root, args.batch_size, model_cfg, seed=args.seed,
            steps_per_epoch=args.steps_per_epoch,
        )
        val_loader = (
            (lambda: kitti_val_loader(args.data_root, args.batch_size, model_cfg))
            if args.validate
            else None
        )

    out = run_training(
        trainer,
        loader,
        work_dir=args.work_dir,
        max_epochs=args.epochs if args.steps is None else 1,
        val_interval=int(cfg.get("val_interval", 5)),
        val_loader=val_loader,
        resume=args.resume,
        log_interval=50 if args.steps is None else 1,
        checkpoint_interval=5,
        max_keep=10,
        seed=args.seed,
        profile_dir=args.profile,
        load_from=args.load_from or cfg.get("load_from"),
        mesh=mesh,
    )
    print(f"[done] work_dir={out['work_dir']}")
    return out


if __name__ == "__main__":
    main()
