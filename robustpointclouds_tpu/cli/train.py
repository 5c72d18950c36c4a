"""Generic config-driven training entry point.

Mirrors the reference's mmdet3d-style generic trainer (train.py:17-135):
takes a config file (core/config.py `_base_` inheritance), `--work-dir`,
`--resume`, `--amp`, `--cfg-options` dotted overrides, and builds the model
named by `model.type` THROUGH the config (core/builders.py) — changing
`model.adversary_cfg.sensor_error_bound` in the file or on the CLI changes
the built model. The reference's `--launcher` flag family (pytorch/slurm/mpi
DDP over NCCL, train.py:56-60) is replaced by the mesh: `--devices N` shards
the batch over the first N attached devices and XLA inserts the gradient
psum over ICI (SURVEY.md §2c). `--load-from` is the reference's `load_from`
zoo warm start (adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:167).
"""
from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a detector from a config file")
    p.add_argument("config", help="config python file")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume", nargs="?", const="auto", default=None)
    p.add_argument("--load-from", default=None,
                   help="warm start from a zoo .pth or converted orbax dir")
    p.add_argument("--devices", type=int, default=None,
                   help="data-parallel device count (default: all attached)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-process run (one process per host): calls "
                        "jax.distributed.initialize, builds the mesh over ALL "
                        "global devices, and feeds each host its own batch "
                        "rows (reference --launcher slurm/mpi/pytorch, "
                        "train.py:56-64)")
    p.add_argument("--coordinator", default=None,
                   help="multihost coordinator address host:port (or "
                        "JAX_COORDINATOR_ADDRESS; auto-detected on TPU pods)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multihost process count (or JAX_NUM_PROCESSES)")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's rank (or JAX_PROCESS_ID)")
    p.add_argument("--amp", action="store_true",
                   help="bfloat16 matmul precision (reference --amp equivalent)")
    p.add_argument("--auto-scale-lr", action="store_true",
                   help="scale lr by effective_batch / auto_scale_lr.base_batch_size "
                        "(reference train.py:33-35 semantics)")
    p.add_argument("--synthetic", action="store_true",
                   help="force synthetic data even if the dataset exists")
    p.add_argument("--validate", action="store_true")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="debug: force the CPU backend (the axon TPU plugin "
                        "ignores JAX_PLATFORMS, so this must be a flag)")
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.amp:
        import jax

        jax.config.update("jax_default_matmul_precision", "bfloat16")
    from ..core import Config
    from ..core.builders import build_model_config, build_train_config

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_cli(args.cfg_options)

    work_dir = args.work_dir or cfg.get("work_dir", "work_dirs/train")
    model_type = cfg.get("model", {}).get("type", "AdversarialVoxelNet")
    batch_size = int(cfg.get("batch_size", 6))
    max_epochs = int(cfg.get("max_epochs", 20))
    val_interval = int(cfg.get("val_interval", 5))
    data_root = cfg.get("data_root", "data/kitti")
    load_from = args.load_from or cfg.get("load_from")

    mesh = None
    if args.multihost:
        import jax

        from ..parallel.mesh import make_mesh
        from ..parallel.multihost import init_multihost

        pid, nproc = init_multihost(
            args.coordinator, args.num_processes, args.process_id
        )
        devs = jax.devices()  # global across all processes
        if batch_size % len(devs) != 0:
            raise SystemExit(
                f"batch_size {batch_size} not divisible by the {len(devs)} "
                "global devices"
            )
        mesh = make_mesh(devs)
        print(f"[multihost] process {pid}/{nproc}, mesh over {len(devs)} "
              f"global devices ({jax.local_device_count()} local)")
    elif args.devices and args.devices > 1:
        import jax

        from ..parallel.mesh import make_mesh

        devs = jax.devices()
        if len(devs) < args.devices:
            raise SystemExit(
                f"--devices {args.devices} but only {len(devs)} attached"
            )
        if batch_size % args.devices != 0:
            raise SystemExit(
                f"batch_size {batch_size} not divisible by --devices {args.devices}"
            )
        mesh = make_mesh(devs[: args.devices])
        print(f"[mesh] data-parallel over {args.devices} devices")

    if model_type in ("AdversarialCenterPoint", "CenterPoint"):
        # CenterPoint runs through its own trainer (different loss/eval path)
        from .train_nuscenes_adversarial import run as nus_run

        return nus_run(
            cfg=cfg, work_dir=work_dir, data_root=data_root,
            batch_size=batch_size, max_epochs=max_epochs,
            resume=bool(args.resume), pretrained=load_from,
            synthetic=args.synthetic, seed=args.seed, mesh=mesh,
            steps_per_epoch=args.steps_per_epoch,
        )

    from ..train import Trainer
    from .common import run_training, synthetic_loader

    model_cfg = build_model_config(cfg)
    steps_per_epoch = args.steps_per_epoch
    train_cfg = build_train_config(
        cfg, steps_per_epoch=steps_per_epoch or 1000, max_epochs=max_epochs
    )
    if args.auto_scale_lr:
        base_bs = int(cfg.get("auto_scale_lr", {}).get("base_batch_size", 48))
        scale = batch_size * max(args.devices or 1, 1) / base_bs
        import dataclasses

        train_cfg = dataclasses.replace(
            train_cfg, learning_rate=train_cfg.learning_rate * scale
        )
        print(f"[auto-scale-lr] x{scale:.3f} -> lr {train_cfg.learning_rate:.2e}")
    trainer = Trainer(model_cfg=model_cfg, train_cfg=train_cfg, mesh=mesh)

    use_synth = args.synthetic
    if not use_synth:
        from ..data.kitti import kitti_available

        if not kitti_available(data_root):
            print(f"[data] KITTI not found under {data_root!r}; "
                  "falling back to synthetic scenes")
            use_synth = True

    if use_synth:
        pcr = model_cfg.voxelizer.point_cloud_range
        loader = synthetic_loader(
            batch_size, steps_per_epoch or 100, seed=args.seed, point_range=pcr
        )
        val_loader = (
            (lambda: synthetic_loader(batch_size, 4, seed=args.seed + 999,
                                      point_range=pcr)(0))
            if args.validate else None
        )
    else:
        from ..data.kitti import kitti_epoch_loader, kitti_val_loader

        loader = kitti_epoch_loader(
            data_root, batch_size, model_cfg, seed=args.seed,
            steps_per_epoch=steps_per_epoch,
        )
        val_loader = (
            (lambda: kitti_val_loader(data_root, batch_size, model_cfg))
            if args.validate else None
        )

    out = run_training(
        trainer, loader, work_dir=work_dir, max_epochs=max_epochs,
        val_interval=val_interval, val_loader=val_loader,
        resume=bool(args.resume), seed=args.seed,
        load_from=load_from, mesh=mesh,
    )
    print(f"[done] work_dir={out['work_dir']}")
    return out


if __name__ == "__main__":
    main()
