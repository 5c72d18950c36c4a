"""Eval CLI safeguards: clean mode must not silently score a random init.

Reference clean mode evaluates a zoo checkpoint (evaluate_kitti_3class.py:57-61);
scoring an untrained model would make its numbers meaningless (round-1 verdict
weakness #9).
"""
import numpy as np
import pytest

from robustpointclouds_tpu.cli.evaluate_kitti_3class import evaluate_checkpoint


def test_refuses_random_init(tmp_path):
    with pytest.raises(FileNotFoundError, match="refusing"):
        evaluate_checkpoint(
            str(tmp_path / "nonexistent_work_dir"), "data/kitti", 2, True, None,
            tiny=True,
        )


def test_allow_random_init_flag(tmp_path):
    res = evaluate_checkpoint(
        str(tmp_path / "nonexistent_work_dir"), "data/kitti", 2, True, None,
        tiny=True, allow_random_init=True,
    )
    assert "mAP_3d_moderate" in res


def test_dump_results(tmp_path):
    import pickle

    dump = str(tmp_path / "out" / "results.pkl")
    evaluate_checkpoint(
        str(tmp_path / "nope"), "data/kitti", 2, True, None,
        tiny=True, allow_random_init=True, dump_results=dump,
    )
    with open(dump, "rb") as f:
        frames = pickle.load(f)
    assert len(frames) == 8  # 4 synthetic batches x 2 rows
    assert {"frame_id", "boxes_3d", "scores", "labels"} <= set(frames[0])
    assert frames[0]["boxes_3d"].shape[1] == 7


def test_nuscenes_eval_refuses_random_init(tmp_path):
    import argparse

    from robustpointclouds_tpu.cli.evaluate_nuscenes_adversarial import _evaluate

    args = argparse.Namespace(
        data_root=str(tmp_path / "no_nuscenes"), synthetic=True, tiny=True,
        frames=1, batch_size=1, limit=None, pretrained=None,
        allow_random_init=False,
    )
    with pytest.raises(FileNotFoundError, match="refusing"):
        _evaluate(str(tmp_path / "empty_wd"), args, attack=False)


def test_save_best_checkpoint(tmp_path):
    """save_best keeps only the best-metric state and restore_best returns it
    (reference CheckpointHook save_best semantics)."""
    import jax

    from robustpointclouds_tpu.cli.common import synthetic_loader
    from robustpointclouds_tpu.train import TrainConfig, Trainer
    from robustpointclouds_tpu.train.checkpoint import CheckpointManager
    from robustpointclouds_tpu.models import VoxelNetConfig
    from robustpointclouds_tpu.ops.voxelize import VoxelizerConfig

    cfg = VoxelNetConfig(
        voxelizer=VoxelizerConfig(
            point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
            voxel_size=(0.5, 0.5, 0.125), max_points_per_voxel=3, max_voxels=512,
        ),
        anchor_ranges=tuple((0, -8.0, -0.6, 16.0, 8.0, -0.6) for _ in range(3)),
    )
    trainer = Trainer(model_cfg=cfg, train_cfg=TrainConfig())
    batch = next(iter(synthetic_loader(1, 1, num_points=256,
                                       point_range=cfg.voxelizer.point_cloud_range)(0)))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    mgr = CheckpointManager(str(tmp_path / "wd"))

    assert mgr.save_best(10.0, state, epoch=1)
    assert not mgr.save_best(5.0, state, epoch=2)   # worse: not kept
    assert mgr.save_best(20.0, state, epoch=3)      # better: replaces
    restored = mgr.restore_best(state)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )
    import json

    with open(tmp_path / "wd" / "best_metric.json") as f:
        rec = json.load(f)
    assert rec == {"value": 20.0, "epoch": 3}


def test_tta_merge_dedups_and_keeps_disjoint():
    """The flip-TTA merge suppresses near-duplicate boxes of the same class
    and keeps disjoint/other-class detections."""
    import jax.numpy as jnp

    from robustpointclouds_tpu.cli.common import _tta_merge_fn

    merge = _tta_merge_fn(0.01)
    car = [10.0, 5.0, -1.0, 3.9, 1.6, 1.56, 0.3]
    car_dup = [10.02, 5.0, -1.0, 3.9, 1.6, 1.56, 0.3]
    far = [30.0, -5.0, -1.0, 3.9, 1.6, 1.56, 0.0]
    boxes = jnp.asarray([[car, car_dup, far, car]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.8, 0.7, 0.6]])
    labels = jnp.asarray([[0, 0, 0, 1]])
    valid = jnp.asarray([[True, True, True, True]])
    b, s, l, v = merge(boxes, scores, labels, valid)
    kept = np.asarray(v[0])
    ss = np.asarray(s[0])
    ll = np.asarray(l[0])
    # the 0.8 duplicate of the 0.9 box is suppressed; the far box and the
    # other-class overlap survive
    assert kept.sum() == 3
    np.testing.assert_allclose(sorted(ss[kept]), [0.6, 0.7, 0.9], atol=1e-6)
    assert 1 in ll[kept]


def test_run_evaluation_tta_smoke(tmp_path):
    """tta=True must run end-to-end and return the same metric surface."""
    import jax
    import jax.numpy as jnp

    from robustpointclouds_tpu.cli.common import run_evaluation
    from robustpointclouds_tpu.train import TrainConfig, Trainer

    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_model import as_jnp, tiny_batch, tiny_cfg

    trainer = Trainer(model_cfg=tiny_cfg(adversary=False),
                      train_cfg=TrainConfig())
    batch = as_jnp(tiny_batch(np.random.RandomState(0), B=2))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    res = run_evaluation(trainer, state, iter([batch]), tta=True)
    assert "mAP_3d_moderate" in res
