"""NuScenes adversarial training (AdversarialCenterPoint).

Mirrors the reference train_nuscenes_adversarial.py: conservative recipe
(batch 1, AdamW lr=5e-5, 20 epochs, logger 20, checkpoint every 2 —
:148-153), warm start from a pretrained CenterPoint checkpoint when given
(:124-128). The reference's storage-path patching is handled inside the
NuScenes reader (data/nuscenes.py).

    python -m robustpointclouds_tpu.cli.train_nuscenes_adversarial \
        --validate [--synthetic] [--pretrained DIR] [--tiny --cpu]
"""
from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser(description="NuScenes adversarial training")
    p.add_argument("--validate", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--work-dir", default="work_dirs/nuscenes_adversarial_training")
    p.add_argument("--pretrained", default=None,
                   help="checkpoint dir to warm-start the detector from")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.nuscenes import nuscenes_available, synthetic_nuscenes_batch
    from ..data.structures import PointCloudBatch
    from ..models.centerpoint import CenterPointConfig
    from ..train import NaNLadder, TrainConfig
    from ..train.centerpoint_loop import CenterPointTrainer
    from ..train.checkpoint import CheckpointManager
    from ..train.hooks import reinit_adversary_params

    model_cfg = CenterPointConfig()
    num_points = 30000
    if args.tiny:
        from ..models.center_detection import CenterHeadConfig
        from ..nn.center_head import NUSCENES_TASKS
        from ..ops.voxelize import VoxelizerConfig

        model_cfg = model_cfg._replace(
            voxelizer=VoxelizerConfig(
                point_cloud_range=(-12.8, -12.8, -5.0, 12.8, 12.8, 3.0),
                voxel_size=(0.4, 0.4, 0.2),
                max_points_per_voxel=3,
                max_voxels=512,
            ),
            head=CenterHeadConfig(
                tasks=NUSCENES_TASKS,
                point_cloud_range=(-12.8, -12.8, -5.0, 12.8, 12.8, 3.0),
                voxel_size=(0.4, 0.4),
                max_objs=16, nms_pre=64, max_per_task=8,
            ),
        )
        num_points = 512

    steps_per_epoch = args.steps_per_epoch or (args.steps or 500)
    trainer = CenterPointTrainer(
        model_cfg=model_cfg,
        train_cfg=TrainConfig(
            learning_rate=5e-5, grad_clip_norm=1.0, adversary_lr_mult=1.0,
            max_epochs=args.epochs, steps_per_epoch=steps_per_epoch,
        ),
    )

    if not args.synthetic and not nuscenes_available(args.data_root):
        print(f"[data] NuScenes not found under {args.data_root!r}; using --synthetic")
        args.synthetic = True

    pcr = model_cfg.voxelizer.point_cloud_range

    def batches(epoch):
        rng = np.random.RandomState(args.seed * 31 + epoch)
        for _ in range(steps_per_epoch):
            b, vel = synthetic_nuscenes_batch(
                rng, batch_size=args.batch_size, num_points=num_points,
                max_gt=model_cfg.head.max_objs, point_range=pcr,
            )
            yield PointCloudBatch(*(jnp.asarray(x) for x in b)), jnp.asarray(vel)

    import os

    os.makedirs(args.work_dir, exist_ok=True)
    ckpt = CheckpointManager(args.work_dir, save_interval_epochs=2)
    ladder = NaNLadder()
    rng = jax.random.PRNGKey(args.seed)
    first, first_vel = next(batches(0))
    state = trainer.init_state(rng, first)
    if args.pretrained:
        pre = CheckpointManager(args.pretrained)
        if pre.latest_epoch() is not None:
            state = pre.restore(state)
            print(f"[warm start] loaded detector from {args.pretrained}")
        else:
            print(f"[warm start] no checkpoint in {args.pretrained}; "
                  "training from scratch (reference requires a pretrained "
                  "CenterPoint for stability, train_nuscenes_adversarial.py:124-128)")
    if args.resume:
        latest = ckpt.latest_epoch()
        if latest is not None:
            state = ckpt.restore(state)
            print(f"[resume] epoch {latest}")
    trainer.compile(donate=False)

    max_epochs = args.epochs if args.steps is None else 1
    for epoch in range(max_epochs):
        for i, (batch, vel) in enumerate(batches(epoch)):
            state, logs = trainer.train_step(state, batch, vel, epoch)
            if (i + 1) % 20 == 0 or i == 0:
                state = ladder.update(
                    state,
                    adversary_reinit_fn=lambda p: reinit_adversary_params(
                        p, jax.random.fold_in(rng, epoch)
                    ),
                )
                print(f"[epoch {epoch} iter {i+1}] " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in sorted(logs.items())
                ))
            if args.steps and i + 1 >= args.steps:
                break
        ckpt.maybe_save(epoch, state)
        if ladder.should_stop:
            break
    ckpt.save(max_epochs - 1, state)
    print(f"[done] work_dir={args.work_dir}")


if __name__ == "__main__":
    main()
