"""Robustness-under-attack evaluation: perturbations FORCED ON at test time.

The reference achieves this by monkeypatching `AdversarialVoxelNet.
extract_feat` to force training=True during test so the (stronger) eval-bound
perturbations fire (evaluate_kitti_adversarial_attack.py:23-62). Here attack
mode is a first-class model flag (`attack=True` in models/voxelnet.py), so
this script is just evaluation with attack=True, and it prints the mAP drop
against the clean run — the reference's attack-effectiveness measurement
(SURVEY.md §3.3).
"""
from __future__ import annotations

import argparse
import json


def parse_args():
    p = argparse.ArgumentParser(description="KITTI adversarial-attack evaluation")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--work-dir", default="work_dirs/kitti_3class_adversarial")
    p.add_argument("--data-root", default="data/kitti")
    p.add_argument("--batch-size", type=int, default=6)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--allow-random-init", action="store_true",
                   help="permit scoring an untrained model (smoke runs only)")
    p.add_argument("--method", default="learned",
                   choices=("learned", "pgd", "fgsm"),
                   help="attack: the reference's learned adversary (default) "
                        "or the white-box gradient baselines under the same "
                        "physical envelope (eval/attacks.py)")
    p.add_argument("--pgd-steps", type=int, default=10)
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from .evaluate_kitti_3class import evaluate_checkpoint

    wd = args.checkpoint or args.work_dir
    print("=" * 60 + "\nCLEAN EVALUATION (for comparison)\n" + "=" * 60)
    clean = evaluate_checkpoint(
        wd, args.data_root, args.batch_size, args.synthetic, args.limit,
        attack=False, tiny=args.tiny, allow_random_init=args.allow_random_init,
    )
    print(json.dumps(clean, indent=2))

    label = {
        "learned": "forced perturbations, eval bounds",
        "pgd": f"white-box PGD-{args.pgd_steps}, same physical envelope",
        "fgsm": "white-box FGSM, same physical envelope",
    }[args.method]
    print("=" * 60 + f"\nATTACK EVALUATION ({label})\n" + "=" * 60)
    attacked = evaluate_checkpoint(
        wd, args.data_root, args.batch_size, args.synthetic, args.limit,
        attack=True, tiny=args.tiny, allow_random_init=args.allow_random_init,
        attack_method=args.method, attack_steps=args.pgd_steps,
    )
    print(json.dumps(attacked, indent=2))

    print("\n" + "=" * 60 + "\nATTACK EFFECTIVENESS")
    for key in sorted(clean):
        if key.endswith("_moderate") or key == "mAP_3d_moderate":
            c, a = clean.get(key, 0.0), attacked.get(key, 0.0)
            drop = c - a
            rel = 100.0 * drop / c if c > 0 else 0.0
            print(f"  {key}: clean={c:.2f} attacked={a:.2f} drop={drop:.2f} ({rel:.1f}%)")
    return {"clean": clean, "attacked": attacked}


if __name__ == "__main__":
    main()
