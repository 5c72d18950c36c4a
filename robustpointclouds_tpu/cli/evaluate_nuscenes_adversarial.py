"""NuScenes evaluation: baseline / clean / adversarial modes.

Mirrors the reference evaluate_nuscenes_adversarial.py mode surface
(--mode baseline|clean|adversarial|all, :248-266) with its SUCCESS/FAILED
summary table (:269-275). 'baseline' = non-adversarial checkpoint; 'clean' =
adversarially-trained model with perturbations off; 'adversarial' = forced
perturbations (attack bounds). Scoring = the self-contained center-distance
mAP (eval/nuscenes_metric.py) instead of the devkit.
"""
from __future__ import annotations

import argparse
import json


def parse_args():
    p = argparse.ArgumentParser(description="NuScenes adversarial evaluation")
    p.add_argument("--mode", choices=("baseline", "clean", "adversarial", "all"),
                   default="all")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--work-dir", default="work_dirs/nuscenes_adversarial_training")
    p.add_argument("--baseline-dir", default="work_dirs/nuscenes_baseline")
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--frames", type=int, default=8, help="synthetic val frames")
    return p.parse_args()


def _evaluate(work_dir, args, attack: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.nuscenes import NUSCENES_CLASSES, synthetic_nuscenes_batch
    from ..data.structures import PointCloudBatch
    from ..eval.nuscenes_metric import eval_nuscenes_map
    from ..models.center_detection import centerpoint_decode
    from ..models.centerpoint import CenterPointConfig
    from ..train import TrainConfig
    from ..train.centerpoint_loop import CenterPointTrainer
    from ..train.checkpoint import CheckpointManager

    model_cfg = CenterPointConfig()
    num_points = 30000
    if args.tiny:
        from ..models.center_detection import CenterHeadConfig
        from ..nn.center_head import NUSCENES_TASKS
        from ..ops.voxelize import VoxelizerConfig

        model_cfg = model_cfg._replace(
            voxelizer=VoxelizerConfig(
                point_cloud_range=(-12.8, -12.8, -5.0, 12.8, 12.8, 3.0),
                voxel_size=(0.4, 0.4, 0.2), max_points_per_voxel=3, max_voxels=512,
            ),
            head=CenterHeadConfig(
                tasks=NUSCENES_TASKS,
                point_cloud_range=(-12.8, -12.8, -5.0, 12.8, 12.8, 3.0),
                voxel_size=(0.4, 0.4), max_objs=16, nms_pre=64, max_per_task=8,
            ),
        )
        num_points = 512

    trainer = CenterPointTrainer(model_cfg=model_cfg, train_cfg=TrainConfig())
    rng = np.random.RandomState(777)
    pcr = model_cfg.voxelizer.point_cloud_range
    frames = []
    for _ in range(args.frames // args.batch_size):
        b, vel = synthetic_nuscenes_batch(
            rng, batch_size=args.batch_size, num_points=num_points,
            max_gt=model_cfg.head.max_objs, point_range=pcr,
        )
        frames.append(PointCloudBatch(*(jnp.asarray(x) for x in b)))

    state = trainer.init_state(jax.random.PRNGKey(0), frames[0])
    ckpt = CheckpointManager(work_dir)
    if ckpt.latest_epoch() is not None:
        state = ckpt.restore(state)
        print(f"[eval] restored epoch {ckpt.latest_epoch()} from {work_dir}")
    else:
        print(f"[warn] no checkpoint in {work_dir}; evaluating random init")

    decode = jax.jit(lambda preds: centerpoint_decode(preds, model_cfg.head))
    gts, dts = [], []
    for batch in frames:
        outs = trainer.forward_eval(state, batch, attack=attack)
        boxes, scores, labels, mask = decode(outs.task_preds)
        for b in range(batch.points.shape[0]):
            gm = np.asarray(batch.gt_mask[b])
            dm = np.asarray(mask[b])
            gts.append({
                "boxes_3d": np.asarray(batch.gt_boxes[b])[gm],
                "labels": np.asarray(batch.gt_labels[b])[gm],
            })
            dts.append({
                "boxes_3d": np.asarray(boxes[b])[dm][:, :7],
                "labels": np.asarray(labels[b])[dm],
                "score": np.asarray(scores[b])[dm],
            })
    return eval_nuscenes_map(gts, dts, NUSCENES_CLASSES)


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    results = {}
    modes = (
        ("baseline", args.baseline_dir, False),
        ("clean", args.checkpoint or args.work_dir, False),
        ("adversarial", args.checkpoint or args.work_dir, True),
    )
    for name, wd, attack in modes:
        if args.mode not in ("all", name):
            continue
        print("=" * 60 + f"\n{name.upper()} EVALUATION\n" + "=" * 60)
        try:
            results[name] = _evaluate(wd, args, attack)
            print(json.dumps({k: round(v, 3) for k, v in results[name].items()}, indent=2))
        except Exception as e:
            print(f"[{name}] FAILED: {e}")
            results[name] = None

    print("\n" + "=" * 60 + "\nSUMMARY")
    for name, res in results.items():
        status = "SUCCESS" if res is not None else "FAILED"
        extra = f" mAP={res['mAP']:.2f} NDS~={res['NDS_simplified']:.2f}" if res else ""
        print(f"  {name}: {status}{extra}")
    return results


if __name__ == "__main__":
    main()
