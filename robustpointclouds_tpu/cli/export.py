"""Export the serving forward as a portable jax.export artifact.

The reference has no deployment story beyond re-running `tools/test`
(evaluate_kitti_3class.py:90-94 shells into it); this framework's serving
path is a first-class AOT artifact: the FULL device graph — voxelize ->
(sparse or pillar) encoder -> backbone/FPN -> anchor head -> box decode +
rotated NMS — with the checkpoint's weights baked in as constants, exported
via jax.export (StableHLO). A serving host needs only jax and the artifact
bytes: `load_exported(path)` returns a callable `(points, mask) -> (boxes,
scores, labels, valid)`.

Two variants:
  * default: self-contained (voxelization on device) — fully portable, no
    host-side machinery at all;
  * --plan: the production sort-free step whose plan input the serving
    host's loader builds (train/loop.HostPlanBuilder + csrc/plan.cpp) —
    faster on chip, same contract as training.

Export on the platform you will serve on (the artifact records its lowering
platform); exporting on the attached TPU produces a TPU artifact, `--cpu` a
CPU one.

Usage:
    python -m robustpointclouds_tpu.cli.export <out.jaxexp> \
        [--config CFG | --tiny] [--work-dir DIR | --load-from CKPT]
        [--batch-size N] [--num-points P] [--plan] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os


def parse_args():
    p = argparse.ArgumentParser(description="Export the serving forward (AOT)")
    p.add_argument("out", help="output artifact path (.jaxexp)")
    p.add_argument("--config", default=None,
                   help="model config file (model.type picks the family)")
    p.add_argument("--work-dir", default=None,
                   help="checkpoint dir to bake weights from")
    p.add_argument("--load-from", default=None,
                   help="checkpoint (.pth zoo file or orbax dir) to bake")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-points", type=int, default=20000)
    p.add_argument("--plan", action="store_true",
                   help="export the plan-fed (sort-free) device step")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--allow-random-init", action="store_true",
                   help="export fresh-init weights (smoke runs only)")
    return p.parse_args()


def export_serving(trainer, state, batch_size: int, num_points: int,
                   use_plan: bool = False):
    """Export `(points, mask[, plan]) -> (boxes, scores, labels, valid)` with
    the state's weights baked in. Returns (jax.export.Exported, meta dict)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    cfg = trainer.model_cfg
    params, stats = state.params, state.batch_stats
    head = cfg.head
    num_features = getattr(cfg, "num_point_features", 4)

    if hasattr(trainer, "anchors"):  # SECOND / pillar families
        from ..models.detection import anchor_head_predict

        anchors = trainer.anchors

        def serve(points, mask, plan=None):
            outs = trainer.model.apply(
                {"params": params, "batch_stats": stats},
                points, mask, False, 100, False, -1.0, plan,
            )
            return anchor_head_predict(
                outs.cls_scores, outs.bbox_preds, outs.dir_preds, anchors, head
            )
    else:  # CenterPoint: per-task heatmap top-k + circle NMS decode
        from ..models.center_detection import centerpoint_decode

        def serve(points, mask, plan=None):
            outs = trainer.model.apply(
                {"params": params, "batch_stats": stats},
                points, mask, False, 100, False, -1.0, plan,
            )
            return centerpoint_decode(outs.task_preds, head)

    example_points = jnp.zeros((batch_size, num_points, num_features),
                               jnp.float32)
    example_mask = jnp.zeros((batch_size, num_points), bool)
    if use_plan:
        import numpy as np

        builder = trainer.make_plan_builder()
        plan = builder(
            np.zeros((batch_size, num_points, num_features), np.float32),
            np.zeros((batch_size, num_points), bool),
        )
        plan = jax.tree_util.tree_map(jnp.asarray, plan)
        fn = jax.jit(lambda pts, m, pl: serve(pts, m, pl))
        exported = jexport.export(fn)(example_points, example_mask, plan)
    else:
        fn = jax.jit(lambda pts, m: serve(pts, m, None))
        exported = jexport.export(fn)(example_points, example_mask)

    meta = {
        "model_type": type(trainer.model).__name__,
        "batch_size": batch_size,
        "num_points": num_points,
        "plan_fed": use_plan,
        "classes": list(getattr(
            cfg, "class_names",
            [c for t in getattr(cfg, "tasks", ()) for c in t],
        )),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "outputs": ["boxes [B,N,7]", "scores [B,N]", "labels [B,N]",
                    "valid [B,N]"],
    }
    return exported, meta


def save_exported(exported, meta, path: str):
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return len(data)


def load_exported(path: str):
    """Deserialize an artifact -> (callable, meta). The callable runs the
    baked graph under jit on the current backend (must match the artifact's
    lowering platform)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    meta = {}
    if os.path.isfile(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return exported.call, meta


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from ..models import VoxelNetConfig
    from ..train import TrainConfig, Trainer
    from ..train.checkpoint import CheckpointManager

    trainer_cls = Trainer
    if args.config:
        from ..core.builders import build_model_config
        from ..core.config import Config

        model_cfg = build_model_config(Config.fromfile(args.config))
        if type(model_cfg).__name__ == "CenterPointConfig":
            from ..train.centerpoint_loop import CenterPointTrainer

            trainer_cls = CenterPointTrainer
    elif args.tiny:
        from .common import tiny_voxelnet_cfg

        model_cfg = tiny_voxelnet_cfg()
    else:
        model_cfg = VoxelNetConfig()

    trainer = trainer_cls(model_cfg=model_cfg, train_cfg=TrainConfig())
    import numpy as np

    from ..data.structures import PointCloudBatch
    import jax.numpy as jnp

    if trainer_cls is Trainer:
        from ..data import synthetic_kitti_batch

        sample = synthetic_kitti_batch(
            np.random.RandomState(0), args.batch_size,
            min(args.num_points, 2048),
            point_range=model_cfg.voxelizer.point_cloud_range,
        )
    else:
        from ..data.nuscenes import synthetic_nuscenes_batch

        sample, _ = synthetic_nuscenes_batch(
            np.random.RandomState(0), batch_size=args.batch_size,
            num_points=min(args.num_points, 2048),
            max_gt=model_cfg.head.max_objs,
            point_range=model_cfg.voxelizer.point_cloud_range,
        )
    state = trainer.init_state(
        jax.random.PRNGKey(0), PointCloudBatch(*(jnp.asarray(x) for x in sample))
    )
    restored = False
    if args.load_from:
        from ..train.checkpoint import load_pretrained

        state = load_pretrained(state, args.load_from)
        restored = True
    elif args.work_dir:
        mgr = CheckpointManager(args.work_dir)
        if mgr.latest_epoch() is not None:
            try:
                state = mgr.restore(state)
            except Exception as e:
                raise RuntimeError(
                    f"checkpoint in {args.work_dir!r} does not match the "
                    "exported model (e.g. a --tiny smoke run wrote it); "
                    f"point --work-dir at the right run: {e}"
                ) from e
            restored = True
    if not restored and not args.allow_random_init:
        raise RuntimeError(
            "no checkpoint given (--work-dir/--load-from) — refusing to "
            "export random weights (pass --allow-random-init for smoke runs)"
        )

    exported, meta = export_serving(
        trainer, state, args.batch_size, args.num_points, use_plan=args.plan
    )
    nbytes = save_exported(exported, meta, args.out)
    print(f"[export] {args.out}: {nbytes / 1e6:.1f} MB, "
          f"platforms={meta['platforms']}, plan_fed={meta['plan_fed']}")
    return meta


if __name__ == "__main__":
    main()
