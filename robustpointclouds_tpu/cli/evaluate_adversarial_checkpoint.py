"""Evaluate the latest NuScenes adversarial checkpoint.

Mirrors the reference evaluate_adversarial_checkpoint.py (auto-picks the
highest epoch checkpoint from the adversarial work dir, :89-100, then runs the
test pipeline). Device pinning (reference hardcodes CUDA_VISIBLE_DEVICES=1,
:13) has no TPU equivalent worth keeping — jax owns the attached chip.
"""
from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate latest NuScenes adversarial ckpt")
    p.add_argument("--work-dir", default="work_dirs/nuscenes_adversarial_training")
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--limit", type=int, default=None,
                   help="cap on real val frames (default: full split)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from ..train.checkpoint import CheckpointManager
    from .evaluate_nuscenes_adversarial import _evaluate

    mgr = CheckpointManager(args.work_dir)
    latest = mgr.latest_epoch()
    if latest is None:
        print(f"[error] no checkpoints under {args.work_dir}")
        return None
    print(f"[eval] latest checkpoint: epoch {latest}")
    res = _evaluate(args.work_dir, args, attack=False)
    import json

    print(json.dumps({k: round(v, 3) for k, v in res.items()}, indent=2))
    return res


if __name__ == "__main__":
    main()
