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
    p.add_argument("--limit", type=int, default=None,
                   help="cap on real val frames (default: full split)")
    p.add_argument("--pretrained", default=None,
                   help="warm start scored when the work dir is empty")
    p.add_argument("--allow-random-init", action="store_true",
                   help="score an untrained model (smoke runs only)")
    return p.parse_args()


def _evaluate(work_dir, args, attack: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.nuscenes import nuscenes_available, synthetic_nuscenes_batch
    from ..data.structures import PointCloudBatch
    from ..models.centerpoint import CenterPointConfig
    from ..train import TrainConfig
    from ..train.centerpoint_loop import CenterPointTrainer
    from ..train.checkpoint import CheckpointManager
    from .train_nuscenes_adversarial import evaluate_centerpoint, tiny_centerpoint_cfg

    model_cfg = CenterPointConfig()
    num_points = 30000
    if args.tiny:
        model_cfg, num_points = tiny_centerpoint_cfg(model_cfg)

    trainer = CenterPointTrainer(model_cfg=model_cfg, train_cfg=TrainConfig())
    pcr = model_cfg.voxelizer.point_cloud_range

    # real NuScenes val frames when the dataset is present (the reference
    # evaluates real infos, evaluate_nuscenes_adversarial.py:80-283);
    # synthetic only as fallback
    use_synth = args.synthetic or not nuscenes_available(args.data_root)
    if use_synth:
        rng = np.random.RandomState(777)
        frames = []
        for _ in range(max(args.frames // args.batch_size, 1)):
            b, vel = synthetic_nuscenes_batch(
                rng, batch_size=args.batch_size, num_points=num_points,
                max_gt=model_cfg.head.max_objs, point_range=pcr,
            )
            frames.append(
                (PointCloudBatch(*(jnp.asarray(x) for x in b)), jnp.asarray(vel))
            )
        batches = iter(frames)
        first = frames[0][0]
    else:
        from ..data.nuscenes import nuscenes_val_loader

        def make_loader():
            return nuscenes_val_loader(
                args.data_root, args.batch_size, model_cfg,
                num_points=num_points, max_gt=model_cfg.head.max_objs,
                limit=args.limit,
            )

        batches = make_loader()
        first = next(make_loader())[0]

    state = trainer.init_state(jax.random.PRNGKey(0), first)
    ckpt = CheckpointManager(work_dir)
    if ckpt.latest_epoch() is not None:
        try:
            state = ckpt.restore(state)
        except Exception as e:
            raise RuntimeError(
                f"checkpoint in {work_dir!r} does not match the evaluated "
                f"model (e.g. a --tiny smoke run wrote it): {e}"
            ) from e
        print(f"[eval] restored epoch {ckpt.latest_epoch()} from {work_dir}")
    elif getattr(args, "pretrained", None):
        from ..train.checkpoint import load_pretrained

        state = load_pretrained(state, args.pretrained)
        print(f"[eval] warm start from {args.pretrained}")
    elif getattr(args, "allow_random_init", False):
        print(f"[warn] no checkpoint in {work_dir}; evaluating RANDOM INIT "
              "(--allow-random-init)")
    else:
        raise FileNotFoundError(
            f"no checkpoint in {work_dir!r} and no --pretrained given; "
            "refusing to score a random init (--allow-random-init for smoke)"
        )

    metrics = evaluate_centerpoint(trainer, state, batches, attack=attack)
    if use_synth:
        # a synthetic-scene score must never read as a real NuScenes number
        # (VERDICT r2): shout it in every result key
        metrics = {f"SYNTHETIC_{k}": v for k, v in metrics.items()}
    return metrics


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
        extra = ""
        if res:
            synth = any(k.startswith("SYNTHETIC_") for k in res)
            get = (lambda k: res.get("SYNTHETIC_" + k, res.get(k, 0.0)))
            tag = " [SYNTHETIC DATA]" if synth else ""
            nds = res.get("NDS", res.get("SYNTHETIC_NDS"))
            if nds is None:
                nds = get("NDS_simplified")
            extra = f" mAP={get('mAP'):.2f} NDS={nds:.2f}{tag}"
        print(f"  {name}: {status}{extra}")
    return results


if __name__ == "__main__":
    main()
