"""Strong-perturbation KITTI adversarial training + progress dashboard.

Mirrors the reference train_kitti_adversarial_strong.py: batch 1, 10 epochs,
val every 2 (:219-232), StrongVoxelPerturber with dynamic scaling and
momentum, plus the post-train attack-progress analysis
(`AdversarialProgressMonitor` with the strength-retention verdict, :69-173 —
ratio recent/initial adversarial loss >= 0.8 => SUSTAINED). The dashboard is
always written as JSON/CSV; the 4-panel matplotlib figure is produced when
matplotlib is importable.
"""
from __future__ import annotations

import argparse
import csv
import json
import os


class AdversarialProgressMonitor:
    """Tracks adversarial strength across training (reference :69-173)."""

    def __init__(self):
        self.history = []  # per-log dicts

    def record(self, epoch: int, step: int, logs: dict):
        self.history.append(
            {"epoch": epoch, "step": step,
             **{k: float(v) for k, v in logs.items()}}
        )

    def strength_retention(self) -> float:
        adv = [abs(h.get("loss_adversarial", 0.0)) for h in self.history]
        if len(adv) < 4:
            return 1.0
        k = max(len(adv) // 4, 1)
        initial = sum(adv[:k]) / k
        recent = sum(adv[-k:]) / k
        return recent / max(initial, 1e-9)

    def verdict(self) -> str:
        r = self.strength_retention()
        return (
            f"ATTACK {'SUCCESSFUL — sustained' if r >= 0.8 else 'WEAKENED'} "
            f"(strength retention {r:.2f}, threshold 0.8)"
        )

    def save(self, work_dir: str):
        path = os.path.join(work_dir, "adversarial_progress.csv")
        if self.history:
            with open(path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=sorted(self.history[0].keys()))
                w.writeheader()
                w.writerows(self.history)
        with open(os.path.join(work_dir, "adversarial_progress.json"), "w") as f:
            json.dump(
                {"history": self.history, "strength_retention": self.strength_retention(),
                 "verdict": self.verdict()},
                f, indent=2,
            )
        self._plot(work_dir)
        return path

    def _plot(self, work_dir: str):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return  # matplotlib absent: JSON/CSV dashboards suffice
        if not self.history:
            return
        fig, axes = plt.subplots(2, 2, figsize=(12, 8))
        xs = list(range(len(self.history)))
        panels = [
            ("loss_adversarial", "Adversarial loss"),
            ("loss_cls", "Classification loss"),
            ("perturbation_l2_norm", "Perturbation L2"),
            ("attack_scale", "Dynamic attack scale"),
        ]
        for ax, (key, title) in zip(axes.ravel(), panels):
            ax.plot(xs, [h.get(key, 0.0) for h in self.history])
            ax.set_title(title)
            ax.grid(alpha=0.3)
        fig.suptitle(self.verdict())
        fig.tight_layout()
        fig.savefig(os.path.join(work_dir, "adversarial_progress.png"), dpi=100)
        plt.close(fig)


def parse_args():
    p = argparse.ArgumentParser(description="Strong KITTI adversarial training")
    p.add_argument("--work-dir", default="work_dirs/kitti_adversarial_strong")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--data-root", default="data/kitti")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--validate", action="store_true",
                   help="KITTI AP validation every 2 epochs (reference :219-232)")
    p.add_argument("--val-limit", type=int, default=None,
                   help="cap on validation frames")
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

    from ..data import synthetic_kitti_batch
    from ..data.structures import PointCloudBatch
    from ..models.strong import StrongVoxelNetConfig
    from ..models.voxelnet import VoxelNetConfig
    from ..train import NaNLadder, TrainConfig
    from ..train.checkpoint import CheckpointManager
    from ..train.strong_loop import StrongTrainer

    base = VoxelNetConfig(adversary=None)
    num_points = 20000
    if args.tiny:
        from ..ops.voxelize import VoxelizerConfig

        base = base._replace(
            voxelizer=VoxelizerConfig(
                point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
                voxel_size=(0.5, 0.5, 0.125),
                max_points_per_voxel=3, max_voxels=512,
            ),
            anchor_ranges=tuple((0, -8.0, -0.6, 16.0, 8.0, -0.6) for _ in range(3)),
        )
        num_points = 512
    model_cfg = StrongVoxelNetConfig(base=base)
    if args.tiny:
        model_cfg = model_cfg._replace(
            perturber={**model_cfg.perturber, "hidden_channels": (16, 32)}
        )

    steps_per_epoch = args.steps_per_epoch or (args.steps or 500)
    trainer = StrongTrainer(
        model_cfg=model_cfg,
        train_cfg=TrainConfig(max_epochs=args.epochs, steps_per_epoch=steps_per_epoch),
    )

    pcr = base.voxelizer.point_cloud_range

    # real KITTI when present (the reference trains on the real dataset);
    # synthetic only as fallback or on --synthetic
    use_synth = args.synthetic
    if not use_synth:
        from ..data.kitti import kitti_available

        if not kitti_available(args.data_root):
            print(f"[data] KITTI not found under {args.data_root!r}; "
                  "falling back to --synthetic scenes")
            use_synth = True

    if use_synth:
        def batches(epoch):
            rng = np.random.RandomState(args.seed * 17 + epoch)
            for _ in range(steps_per_epoch):
                b = synthetic_kitti_batch(
                    rng, batch_size=args.batch_size, num_points=num_points,
                    point_range=pcr,
                )
                yield PointCloudBatch(*(jnp.asarray(x) for x in b))

        val_loader = None
    else:
        from ..data.kitti import kitti_epoch_loader, kitti_val_loader

        batches = kitti_epoch_loader(
            args.data_root, args.batch_size, base, seed=args.seed,
            steps_per_epoch=args.steps_per_epoch, num_points=num_points,
        )
        val_loader = (
            (lambda: kitti_val_loader(args.data_root, args.batch_size, base,
                                      num_points=num_points, limit=args.val_limit))
            if args.validate else None
        )

    os.makedirs(args.work_dir, exist_ok=True)
    monitor = AdversarialProgressMonitor()
    ladder = NaNLadder()
    ckpt = CheckpointManager(args.work_dir, save_interval_epochs=2)
    rng_key = jax.random.PRNGKey(args.seed)
    state = trainer.init_state(rng_key, next(iter(batches(0))))
    trainer.compile(donate=False)

    from ..train.hooks import reinit_adversary_params
    from .common import run_evaluation

    val_history = {}
    max_epochs = args.epochs if args.steps is None else 1

    from .common import prefetch_iterator

    # host-side sparse plans built in the prefetch thread (see
    # cli/common.run_training for the rationale). Built ONCE — a fresh
    # builder per epoch would re-jit its plan/assign functions every epoch.
    plan_builder = trainer.make_plan_builder()

    def _with_plans(it):
        import numpy as _np

        for b in it:
            plan = plan_builder(
                _np.asarray(b.points), _np.asarray(b.points_mask),
                _np.asarray(b.gt_boxes), _np.asarray(b.gt_labels),
                _np.asarray(b.gt_mask),
            )
            yield b, jax.device_put(plan, jax.devices()[0])

    for epoch in range(max_epochs):
        state = trainer.update_dynamic_scaling(state, epoch)
        state = trainer.reset_momentum(state)  # reference resets between epochs

        for i, (batch, plan) in enumerate(
            prefetch_iterator(_with_plans(batches(epoch)))
        ):
            state, logs = trainer.train_step(state, batch, plan=plan)
            if (i + 1) % 10 == 0 or i == 0:
                monitor.record(epoch, i, logs)
                state = trainer.update_dynamic_scaling(state, epoch, logs)
                state = ladder.update(
                    state,
                    adversary_reinit_fn=lambda p: reinit_adversary_params(
                        p, jax.random.fold_in(rng_key, epoch)
                    ),
                )
                print(f"[epoch {epoch} iter {i+1}] " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in sorted(logs.items())
                ))
                if ladder.should_stop:
                    break
            if args.steps and i + 1 >= args.steps:
                break
        ckpt.maybe_save(epoch, state)
        # val every 2 epochs (reference train_kitti_adversarial_strong.py:219-232)
        if val_loader is not None and (epoch + 1) % 2 == 0:
            metrics = run_evaluation(trainer, state, val_loader())
            val_history[f"val_epoch{epoch}"] = metrics
            key = "mAP_3d_moderate"
            if key in metrics and ckpt.save_best(metrics[key], state, epoch):
                print(f"[ckpt] new best {key}={metrics[key]:.2f} (epoch {epoch})")
            monitor.record(epoch, -1, {f"val_{k}": v for k, v in metrics.items()
                                       if isinstance(v, (int, float))})
            print(f"[val epoch {epoch}] {metrics}")
        if ladder.should_stop:
            print("[NaN ladder] stopping")
            break
    ckpt.save(max_epochs - 1, state)
    monitor.save(args.work_dir)
    if val_history:
        with open(os.path.join(args.work_dir, "val_history.json"), "w") as f:
            json.dump(val_history, f, indent=2)
    print(monitor.verdict())
    print(f"[done] work_dir={args.work_dir}")


if __name__ == "__main__":
    main()
