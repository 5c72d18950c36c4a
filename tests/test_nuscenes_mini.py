"""Committed real-format NuScenes mini-fixture, end to end.

tests/fixtures/nuscenes_mini holds 3 frames in the real mmdet3d-NuScenes
layout — v2 info pkls (`data_list`, `lidar_points`, `lidar_sweeps` with
sensor2lidar transforms, 9D `bbox_3d` instances with velocity and
`attr_label`), 5-float lidar bins under samples/ and transformed sweep bins
under sweeps/ (the reference's NuScenes contract,
train_nuscenes_adversarial.py:93-191). Generated once by
tests/fixtures/make_nuscenes_mini.py, checked in; this runs
reader -> multi-sweep aggregation -> host plan -> CenterPoint train step ->
eval CLI on the committed bytes in the default tier.
"""
import os

import jax
import numpy as np
import pytest

from robustpointclouds_tpu.data import nuscenes as nus

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "nuscenes_mini")


def _tiny_cfg():
    from robustpointclouds_tpu.cli.train_nuscenes_adversarial import (
        tiny_centerpoint_cfg,
    )
    from robustpointclouds_tpu.models.centerpoint import CenterPointConfig

    cfg, num_points = tiny_centerpoint_cfg(CenterPointConfig())
    return cfg, num_points


def test_fixture_layout_is_real_nuscenes():
    assert nus.nuscenes_available(FIXTURE)
    assert os.path.isfile(os.path.join(FIXTURE, "samples/LIDAR_TOP/n000000.bin"))
    assert os.path.isfile(os.path.join(FIXTURE, "sweeps/LIDAR_TOP/n000002_sw0.bin"))


def test_reader_multisweep_and_annotations():
    ds = nus.NuScenesDataset(FIXTURE, split="train")
    assert len(ds) == 2
    s = ds.get(0)
    pts = s["points"]
    assert pts.dtype == np.float32 and pts.shape[1] == 5
    # key frame + one aggregated sweep: both time lags present
    lags = np.unique(pts[:, 4].round(3))
    assert 0.0 in lags and 0.1 in lags, lags
    # the sweep was stored in the PREVIOUS ego frame; sensor2lidar must bring
    # its ground plane back to the key frame's (z ~ -1.8 both)
    key_z = pts[pts[:, 4] == 0.0][:, 2]
    sw_z = pts[pts[:, 4] > 0.0][:, 2]
    assert abs(np.median(key_z) - np.median(sw_z)) < 0.1
    # annotations: car (moving, vx=2) + pedestrian; z bottom -> center
    assert s["gt_labels"].tolist() == [0, 8]
    np.testing.assert_allclose(s["gt_boxes"][0][:3], [5.0, 2.0, -0.8], atol=1e-5)
    np.testing.assert_allclose(s["gt_vel"][0], [2.0, 0.3], atol=1e-6)
    assert s["gt_attrs"][0] == 5  # vehicle.moving rides through attr_label
    # frame n000001 has a traffic cone with the no-attribute sentinel
    s1 = ds.get(1)
    assert 9 in s1["gt_labels"].tolist()


def test_plan_fed_centerpoint_step_on_fixture():
    from robustpointclouds_tpu.train import TrainConfig
    from robustpointclouds_tpu.train.centerpoint_loop import CenterPointTrainer

    cfg, num_points = _tiny_cfg()
    loader = nus.nuscenes_epoch_loader(
        FIXTURE, batch_size=2, model_cfg=cfg, steps_per_epoch=1,
        num_points=num_points, max_gt=cfg.head.max_objs, max_sweeps=1,
        augment=False,
    )
    batch, vel = next(iter(loader(0)))
    assert bool(batch.points_mask.any()) and bool(batch.gt_mask.any())

    trainer = CenterPointTrainer(model_cfg=cfg, train_cfg=TrainConfig(warmup_iters=5))
    trainer.compile(donate=False)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    plan = trainer.make_plan_builder()(
        np.asarray(batch.points), np.asarray(batch.points_mask),
        np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
        np.asarray(batch.gt_mask), np.asarray(vel),
    )
    assert "targets" in plan
    new_state, logs = trainer.train_step(state, batch, vel, epoch=5, plan=plan)
    assert np.isfinite(float(logs["loss"]))
    assert int(new_state.step) == 1


def test_eval_cli_on_fixture(tmp_path):
    import argparse

    from robustpointclouds_tpu.cli.evaluate_nuscenes_adversarial import _evaluate

    args = argparse.Namespace(
        data_root=FIXTURE, synthetic=False, tiny=True, frames=1,
        batch_size=1, limit=None, pretrained=None, allow_random_init=True,
    )
    res = _evaluate(str(tmp_path / "no_ckpt"), args, attack=False)
    assert "mAP" in res and "NDS" in res


def test_generator_is_reproducible(tmp_path):
    import importlib.util
    import shutil

    gen_src = os.path.join(os.path.dirname(FIXTURE), "make_nuscenes_mini.py")
    gen_copy = tmp_path / "make_nuscenes_mini.py"
    shutil.copy(gen_src, gen_copy)
    spec = importlib.util.spec_from_file_location("make_nuscenes_mini_tmp", gen_copy)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.ROOT = str(tmp_path / "nuscenes_mini")
    mod.main()
    for rel in ("samples/LIDAR_TOP/n000001.bin", "sweeps/LIDAR_TOP/n000000_sw0.bin",
                "nuscenes_infos_val.pkl"):
        with open(os.path.join(FIXTURE, rel), "rb") as f:
            committed = f.read()
        with open(os.path.join(str(tmp_path / "nuscenes_mini"), rel), "rb") as f:
            regenerated = f.read()
        assert committed == regenerated, rel
