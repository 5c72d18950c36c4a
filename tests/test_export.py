"""Serving export (cli/export.py): serialize -> reload -> bitwise parity."""
import numpy as np
import jax
import jax.numpy as jnp

from test_model import as_jnp, tiny_cfg

from robustpointclouds_tpu.cli.export import (
    export_serving, load_exported, save_exported,
)
from robustpointclouds_tpu.data import synthetic_kitti_batch
from robustpointclouds_tpu.models.detection import anchor_head_predict
from robustpointclouds_tpu.train import TrainConfig, Trainer


def _trainer_state_batch():
    cfg = tiny_cfg(adversary=False)
    trainer = Trainer(model_cfg=cfg, train_cfg=TrainConfig())
    batch = as_jnp(synthetic_kitti_batch(
        np.random.RandomState(0), 2, 512,
        point_range=cfg.voxelizer.point_cloud_range,
    ))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    return trainer, state, batch


def test_export_roundtrip_bitwise(tmp_path):
    trainer, state, batch = _trainer_state_batch()
    exported, meta = export_serving(trainer, state, batch_size=2,
                                    num_points=512)
    path = str(tmp_path / "model.jaxexp")
    nbytes = save_exported(exported, meta, path)
    assert nbytes > 1000
    call, meta2 = load_exported(path)
    assert meta2["model_type"] == "AdversarialVoxelNet"
    assert meta2["plan_fed"] is False

    got = call(batch.points, batch.points_mask)
    outs = trainer.forward_eval(state, batch)
    want = anchor_head_predict(
        outs.cls_scores, outs.bbox_preds, outs.dir_preds, trainer.anchors,
        trainer.model_cfg.head,
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_export_plan_fed_matches_inline(tmp_path):
    """The --plan artifact consumes a host plan and must decode identically
    to the self-contained artifact on the same cloud (plan-fed == inline is
    the framework's core bitwise invariant, tests/test_plan.py)."""
    trainer, state, batch = _trainer_state_batch()
    exported, meta = export_serving(trainer, state, batch_size=2,
                                    num_points=512, use_plan=True)
    path = str(tmp_path / "model_plan.jaxexp")
    save_exported(exported, meta, path)
    call, meta2 = load_exported(path)
    assert meta2["plan_fed"] is True

    builder = trainer.make_plan_builder()
    plan = builder(np.asarray(batch.points), np.asarray(batch.points_mask))
    plan = jax.tree_util.tree_map(jnp.asarray, plan)
    got = call(batch.points, batch.points_mask, plan)

    outs = trainer.forward_eval(state, batch)
    want = anchor_head_predict(
        outs.cls_scores, outs.bbox_preds, outs.dir_preds, trainer.anchors,
        trainer.model_cfg.head,
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_export_centerpoint_roundtrip(tmp_path):
    """The CenterPoint family exports with its own decode (heatmap top-k +
    circle NMS) and reloads bitwise."""
    from robustpointclouds_tpu.cli.train_nuscenes_adversarial import (
        tiny_centerpoint_cfg,
    )
    from robustpointclouds_tpu.data.nuscenes import synthetic_nuscenes_batch
    from robustpointclouds_tpu.data.structures import PointCloudBatch
    from robustpointclouds_tpu.models.center_detection import centerpoint_decode
    from robustpointclouds_tpu.models.centerpoint import CenterPointConfig
    from robustpointclouds_tpu.train.centerpoint_loop import CenterPointTrainer

    cfg, npts = tiny_centerpoint_cfg(CenterPointConfig(adversary=None))
    trainer = CenterPointTrainer(model_cfg=cfg)
    b, _vel = synthetic_nuscenes_batch(
        np.random.RandomState(0), batch_size=1, num_points=npts,
        max_gt=cfg.head.max_objs,
        point_range=cfg.voxelizer.point_cloud_range,
    )
    batch = PointCloudBatch(*(jnp.asarray(x) for x in b))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    exported, meta = export_serving(trainer, state, batch_size=1,
                                    num_points=npts)
    assert meta["model_type"] == "AdversarialCenterPoint"
    path = str(tmp_path / "cp.jaxexp")
    save_exported(exported, meta, path)
    call, _ = load_exported(path)

    got = call(batch.points, batch.points_mask)

    # bitwise vs the SAME fused graph jitted in-process (the artifact is a
    # serialization of exactly this function)
    fused = jax.jit(
        lambda pts, m: centerpoint_decode(
            trainer.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                pts, m, False, 100, False, -1.0, None,
            ).task_preds,
            cfg.head,
        )
    )
    want = fused(batch.points, batch.points_mask)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    # and within float roundoff of the separately-jitted eval+decode path
    # (different fusion -> different accumulation order, not different math)
    outs = trainer.forward_eval(state, batch)
    loose = centerpoint_decode(outs.task_preds, cfg.head)
    for g, w in zip(got, loose):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            rtol=2e-3, atol=2e-3,
        )
