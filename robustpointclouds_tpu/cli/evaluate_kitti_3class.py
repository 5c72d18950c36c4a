"""KITTI 3-class evaluation: clean and adversarially-trained-model modes.

Mirrors the reference evaluate_kitti_3class.py surface (--mode
clean|adversarial|both, :182-186): 'clean' evaluates a baseline (non-
adversarial) checkpoint; 'adversarial' evaluates the adversarially-trained
detector with perturbations OFF (measuring clean accuracy of the robust model,
reference call stack §3.2 in SURVEY.md). Attack-mode measurement lives in
evaluate_kitti_adversarial_attack.
"""
from __future__ import annotations

import argparse
import json


def parse_args():
    p = argparse.ArgumentParser(description="KITTI 3-class evaluation")
    p.add_argument("--mode", choices=("clean", "adversarial", "both"), default="both")
    p.add_argument("--checkpoint", default=None, help="explicit checkpoint dir")
    p.add_argument(
        "--load-from", default=None,
        help="zoo warm start (.pth or converted orbax dir) scored when the "
        "work dir has no checkpoint — the reference's clean mode evaluates a "
        "zoo checkpoint (evaluate_kitti_3class.py:57-61)",
    )
    p.add_argument(
        "--allow-random-init", action="store_true",
        help="score an untrained model when no checkpoint exists (smoke runs "
        "only; default is a hard error so clean mAP can't silently be noise)",
    )
    p.add_argument("--work-dir", default="work_dirs/kitti_3class_adversarial")
    p.add_argument("--data-root", default="data/kitti")
    p.add_argument("--batch-size", type=int, default=6)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true", help="shrunken grid for smoke runs")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--limit", type=int, default=None, help="max val frames")
    p.add_argument("--tta", action="store_true",
                   help="y-flip test-time augmentation (MultiScaleFlipAug3D "
                        "with flipping enabled)")
    p.add_argument("--dump-results", default=None, metavar="PKL",
                   help="write per-frame detections (the reference's "
                        "pklfile_prefix result dump)")
    return p.parse_args()


def evaluate_checkpoint(work_dir, data_root, batch_size, synthetic, limit,
                        attack=False, tiny=False, load_from=None,
                        allow_random_init=False, dump_results=None,
                        tta=False, attack_method="learned", attack_steps=10):
    import jax

    from ..data.structures import PointCloudBatch
    from ..models import VoxelNetConfig
    from ..train import TrainConfig, Trainer
    from ..train.checkpoint import CheckpointManager
    from .common import run_evaluation, synthetic_loader

    model_cfg = VoxelNetConfig()
    num_points = 20000
    if tiny:
        from .common import tiny_voxelnet_cfg

        model_cfg = tiny_voxelnet_cfg()
        num_points = 512
    trainer = Trainer(model_cfg=model_cfg, train_cfg=TrainConfig())

    pcr = model_cfg.voxelizer.point_cloud_range
    if synthetic:
        batches = list(synthetic_loader(batch_size, 4, num_points=num_points,
                                        seed=999, point_range=pcr)(0))
    else:
        from ..data.kitti import kitti_available, kitti_val_loader

        if not kitti_available(data_root):
            print(f"[data] KITTI not found under {data_root!r}; using synthetic val")
            batches = list(synthetic_loader(batch_size, 4, num_points=num_points,
                                            seed=999, point_range=pcr)(0))
        else:
            # materialize: the first batch is needed for init AND must still
            # be scored (consuming a generator here would silently drop it)
            batches = list(kitti_val_loader(data_root, batch_size, model_cfg, limit=limit))

    sample = batches[0]
    if not isinstance(sample, PointCloudBatch):
        sample = sample[0]  # (batch, metas) pair from the val loader
    state = trainer.init_state(jax.random.PRNGKey(0), sample)
    ckpt = CheckpointManager(work_dir)
    latest = ckpt.latest_epoch()
    if latest is not None:
        try:
            state = ckpt.restore(state)
        except Exception as e:
            raise RuntimeError(
                f"checkpoint in {work_dir!r} does not match the evaluated "
                f"model (e.g. a --tiny smoke run wrote it); point "
                f"--checkpoint/--work-dir at the right run: {e}"
            ) from e
        print(f"[eval] restored epoch {latest} from {work_dir}")
    elif load_from is not None:
        from ..train.checkpoint import load_pretrained

        state = load_pretrained(state, load_from)
        print(f"[eval] no checkpoint in {work_dir}; warm start from {load_from}")
    elif allow_random_init:
        print(f"[warn] no checkpoint in {work_dir}; evaluating RANDOM INIT "
              "(--allow-random-init)")
    else:
        raise FileNotFoundError(
            f"no checkpoint in {work_dir!r} and no --load-from given; refusing "
            "to score a random init (pass --allow-random-init for smoke runs)"
        )

    return run_evaluation(trainer, state, iter(batches), attack=attack,
                          dump_path=dump_results, tta=tta,
                          attack_method=attack_method, attack_steps=attack_steps)


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    results = {}
    if args.mode in ("clean", "both"):
        print("=" * 60 + "\nCLEAN BASELINE EVALUATION\n" + "=" * 60)
        wd = args.checkpoint or "work_dirs/kitti_3class_baseline"
        try:
            results["clean"] = evaluate_checkpoint(
                wd, args.data_root, args.batch_size, args.synthetic, args.limit,
                tiny=args.tiny, load_from=args.load_from,
                allow_random_init=args.allow_random_init,
                dump_results=args.dump_results, tta=args.tta,
            )
            print(json.dumps(results["clean"], indent=2))
        except Exception as e:  # keep the reference's per-mode SUCCESS/FAIL table
            print(f"[clean] FAILED: {e}")
            results["clean"] = None
    if args.mode in ("adversarial", "both"):
        print("=" * 60 + "\nADVERSARIAL-MODEL EVALUATION (perturbations off)\n" + "=" * 60)
        wd = args.checkpoint or args.work_dir
        try:
            results["adversarial"] = evaluate_checkpoint(
                wd, args.data_root, args.batch_size, args.synthetic, args.limit,
                tiny=args.tiny, load_from=args.load_from,
                allow_random_init=args.allow_random_init,
                dump_results=args.dump_results, tta=args.tta,
            )
            print(json.dumps(results["adversarial"], indent=2))
        except Exception as e:
            print(f"[adversarial] FAILED: {e}")
            results["adversarial"] = None

    print("\n" + "=" * 60 + "\nSUMMARY")
    for mode, res in results.items():
        status = "SUCCESS" if res is not None else "FAILED"
        map_str = f" mAP_3d_moderate={res.get('mAP_3d_moderate', float('nan')):.2f}" if res else ""
        print(f"  {mode}: {status}{map_str}")
    return results


if __name__ == "__main__":
    main()
