"""NuScenes adversarial training (AdversarialCenterPoint).

Mirrors the reference train_nuscenes_adversarial.py: conservative recipe
(batch 1, AdamW lr=5e-5, 20 epochs, logger 20, checkpoint every 2 —
:148-153), warm start from a pretrained CenterPoint checkpoint when given
(:124-128), and — like the reference (:93-191) — trains on REAL NuScenes
info pickles when present (multi-sweep points, real velocity targets),
falling back to synthetic scenes only when the dataset is absent. The
reference's storage-path patching is handled inside the NuScenes reader
(data/nuscenes.py `_normalize_path`).

    python -m robustpointclouds_tpu.cli.train_nuscenes_adversarial \
        --validate [--synthetic] [--pretrained DIR] [--tiny --cpu]
"""
from __future__ import annotations

import argparse
import os


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
    p.add_argument("--max-sweeps", type=int, default=9)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def tiny_centerpoint_cfg(model_cfg, num_points=512):
    from ..models.center_detection import CenterHeadConfig
    from ..nn.center_head import NUSCENES_TASKS
    from ..ops.voxelize import VoxelizerConfig

    return model_cfg._replace(
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
    ), num_points


def run(
    cfg=None,
    work_dir: str = "work_dirs/nuscenes_adversarial_training",
    data_root: str = "data/nuscenes",
    batch_size: int = 1,
    max_epochs: int = 20,
    steps_per_epoch=None,
    resume: bool = False,
    pretrained=None,
    synthetic: bool = False,
    validate: bool = False,
    tiny: bool = False,
    max_sweeps: int = 9,
    seed: int = 0,
    mesh=None,
    max_steps=None,
):
    """Programmatic entry (used by cli/train.py's config dispatch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.nuscenes import (
        nuscenes_available,
        nuscenes_epoch_loader,
        nuscenes_val_loader,
        synthetic_nuscenes_batch,
    )
    from ..data.structures import PointCloudBatch
    from ..models.centerpoint import CenterPointConfig
    from ..train import NaNLadder, TrainConfig
    from ..train.centerpoint_loop import CenterPointTrainer
    from ..train.checkpoint import CheckpointManager
    from ..train.hooks import reinit_adversary_params
    from .common import MetricsLogger

    if cfg is not None:
        from ..core.builders import build_centerpoint_config, build_train_config

        model_cfg = build_centerpoint_config(cfg)
        base_train = build_train_config(cfg)
        lr = base_train.learning_rate
    else:
        model_cfg = CenterPointConfig()
        lr = 5e-5

    num_points = 30000
    if tiny:
        model_cfg, num_points = tiny_centerpoint_cfg(model_cfg)

    steps_per_epoch = steps_per_epoch or (max_steps or 500)
    trainer = CenterPointTrainer(
        model_cfg=model_cfg,
        train_cfg=TrainConfig(
            learning_rate=lr, grad_clip_norm=1.0, adversary_lr_mult=1.0,
            max_epochs=max_epochs, steps_per_epoch=steps_per_epoch,
        ),
    )

    use_synth = synthetic
    if not use_synth and not nuscenes_available(data_root):
        print(f"[data] NuScenes not found under {data_root!r}; using --synthetic")
        use_synth = True

    pcr = model_cfg.voxelizer.point_cloud_range

    if use_synth:
        def batches(epoch):
            rng_np = np.random.RandomState(seed * 31 + epoch)
            for _ in range(steps_per_epoch):
                b, vel = synthetic_nuscenes_batch(
                    rng_np, batch_size=batch_size, num_points=num_points,
                    max_gt=model_cfg.head.max_objs, point_range=pcr,
                )
                yield PointCloudBatch(*(jnp.asarray(x) for x in b)), jnp.asarray(vel)

        val_batches = None
    else:
        batches = nuscenes_epoch_loader(
            data_root, batch_size, model_cfg, seed=seed,
            steps_per_epoch=steps_per_epoch, num_points=num_points,
            max_gt=model_cfg.head.max_objs, max_sweeps=max_sweeps,
        )
        val_batches = (
            (lambda: nuscenes_val_loader(
                data_root, batch_size, model_cfg, num_points=num_points,
                max_gt=model_cfg.head.max_objs, max_sweeps=max_sweeps, limit=64,
            ))
            if validate else None
        )

    shard = None
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    use_ddp = n_dev > 1  # shard_map DDP: per-device sub-plans, pmean'd grads
    if mesh is not None:
        from ..parallel.mesh import (
            replicate,
            shard_batch,
            shard_stacked,
            stack_plans,
        )

        def shard(x):
            return shard_batch(x, mesh)

    os.makedirs(work_dir, exist_ok=True)
    logger = MetricsLogger(work_dir)
    ckpt = CheckpointManager(work_dir, save_interval_epochs=2)
    ladder = NaNLadder()
    rng = jax.random.PRNGKey(seed)
    first, first_vel = next(batches(0))
    state = trainer.init_state(rng, first)
    if pretrained:
        if os.path.isdir(pretrained):
            pre = CheckpointManager(pretrained)
            if pre.latest_epoch() is not None:
                state = pre.restore(state)
                print(f"[warm start] loaded detector from {pretrained}")
            else:
                print(f"[warm start] no checkpoint in {pretrained}; "
                      "training from scratch (reference requires a pretrained "
                      "CenterPoint for stability, train_nuscenes_adversarial.py:124-128)")
        else:
            from ..train.checkpoint import load_pretrained

            state = load_pretrained(state, pretrained)
    if mesh is not None:
        state = replicate(state, mesh)
    if resume:
        latest = ckpt.latest_epoch()
        if latest is not None:
            state = ckpt.restore(state)
            print(f"[resume] epoch {latest}")
    if use_ddp:
        trainer.compile_sharded(mesh, donate=False)
    else:
        trainer.compile(donate=False)

    history = {}
    n_epochs = max_epochs if max_steps is None else 1
    # host-side sparse plans, built in the prefetch thread (see
    # cli/common.run_training); NuScenes plans carry the 5-feature voxels
    plan_builder = trainer.make_plan_builder()

    def _with_plans(it):
        for batch, vel in it:
            args = (
                np.asarray(batch.points), np.asarray(batch.points_mask),
                np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
                np.asarray(batch.gt_mask), np.asarray(vel),
            )
            if use_ddp:
                # one sub-plan per device (reference DDP semantics — see
                # cli/common.run_training); the merged-batch index arrays
                # cannot be GSPMD-sharded, replicating them pins the whole
                # encoder to replicated compute
                b = args[0].shape[0]
                if b % n_dev:
                    raise ValueError(
                        f"batch size {b} not divisible by the {n_dev}-device mesh"
                    )
                k = b // n_dev
                plan = shard_stacked(stack_plans([
                    plan_builder(*(a[i * k:(i + 1) * k] for a in args))
                    for i in range(n_dev)
                ]), mesh)
            else:
                plan = plan_builder(*args)
                # place in the prefetch thread so the transfer overlaps:
                # mesh -> replicated (matches the params layout), else dev 0
                if mesh is not None:
                    plan = replicate(plan, mesh)
                else:
                    plan = jax.device_put(plan, jax.devices()[0])
            yield batch, vel, plan

    from .common import prefetch_iterator

    for epoch in range(n_epochs):
        for i, (batch, vel, plan) in enumerate(
            prefetch_iterator(_with_plans(batches(epoch)))
        ):
            if shard is not None:
                batch, vel = shard(batch), shard(vel)
            state, logs = trainer.train_step(state, batch, vel, epoch, plan=plan)
            if (i + 1) % 20 == 0 or i == 0:
                logs_f = {k: float(v) for k, v in logs.items()}
                logger.log_step(logs_f)
                state = ladder.update(
                    state,
                    adversary_reinit_fn=lambda p: reinit_adversary_params(
                        p, jax.random.fold_in(rng, epoch)
                    ),
                )
                print(f"[epoch {epoch} iter {i+1}] " + " ".join(
                    f"{k}={v:.4f}" for k, v in sorted(logs_f.items())
                ))
            if max_steps and i + 1 >= max_steps:
                break
        ckpt.maybe_save(epoch, state)
        if val_batches is not None and (epoch + 1) % 2 == 0:
            metrics = evaluate_centerpoint(trainer, state, val_batches())
            history[f"val_epoch{epoch}"] = metrics
            print(f"[val epoch {epoch}] mAP={metrics.get('mAP', 0):.2f} "
                  f"NDS={metrics.get('NDS', 0):.2f}")
        if ladder.should_stop:
            break
    ckpt.save(n_epochs - 1, state)
    logger.save_l2_norms()
    logger.save_history()
    print(f"[done] work_dir={work_dir}")
    return {"state": state, "history": history, "work_dir": work_dir}


def evaluate_centerpoint(trainer, state, batches, attack: bool = False):
    """Shared CenterPoint eval: decode + full NuScenes mAP/NDS (with velocity
    TP errors from the decoded 9D boxes)."""
    import jax
    import numpy as np

    from ..data.nuscenes import NUSCENES_CLASSES
    from ..eval.nuscenes_metric import eval_nuscenes_map
    from ..models.center_detection import centerpoint_decode

    decode = jax.jit(lambda preds: centerpoint_decode(preds, trainer.model_cfg.head))
    plan_builder = trainer.make_plan_builder()
    gts, dts = [], []
    for item in batches:
        if isinstance(item, tuple) and len(item) == 3:
            batch, vel, metas = item
        elif isinstance(item, tuple):
            batch, vel = item
            metas = None
        else:
            batch, vel, metas = item, None, None
        # sort-free eval forward: host plan, numpy leaves (uncommitted) so
        # the jit places them freely against the params layout
        plan = jax.tree_util.tree_map(
            np.asarray,
            plan_builder(np.asarray(batch.points), np.asarray(batch.points_mask)),
        )
        outs = trainer.forward_eval(state, batch, attack=attack, plan=plan)
        boxes, scores, labels, mask = decode(outs.task_preds)
        for b in range(batch.points.shape[0]):
            if metas is not None and not metas[b].get("valid", True):
                continue
            gm = np.asarray(batch.gt_mask[b])
            dm = np.asarray(mask[b])
            gt = {
                "boxes_3d": np.asarray(batch.gt_boxes[b])[gm],
                "labels": np.asarray(batch.gt_labels[b])[gm],
            }
            if vel is not None:
                gt["vel"] = np.asarray(vel[b])[gm]
            if metas is not None and metas[b].get("gt_attrs") is not None:
                gt["attrs"] = np.asarray(metas[b]["gt_attrs"])[gm]
            gts.append(gt)
            dts.append({
                "boxes_3d": np.asarray(boxes[b])[dm],
                "labels": np.asarray(labels[b])[dm],
                "score": np.asarray(scores[b])[dm],
            })
    return eval_nuscenes_map(gts, dts, NUSCENES_CLASSES)


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    return run(
        work_dir=args.work_dir, data_root=args.data_root,
        batch_size=args.batch_size, max_epochs=args.epochs,
        steps_per_epoch=args.steps_per_epoch, resume=args.resume,
        pretrained=args.pretrained, synthetic=args.synthetic,
        validate=args.validate, tiny=args.tiny, max_sweeps=args.max_sweeps,
        seed=args.seed, max_steps=args.steps,
    )


if __name__ == "__main__":
    main()
