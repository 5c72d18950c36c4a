"""Eval CLI safeguards: clean mode must not silently score a random init.

Reference clean mode evaluates a zoo checkpoint (evaluate_kitti_3class.py:57-61);
scoring an untrained model would make its numbers meaningless (round-1 verdict
weakness #9).
"""
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
