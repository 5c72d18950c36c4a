"""AdversarialPointPillars — the all-dense pillar family (models/pointpillars.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.data import synthetic_kitti_batch
from robustpointclouds_tpu.data.structures import PointCloudBatch
from robustpointclouds_tpu.models import AdversarialPointPillars, PointPillarsConfig
from robustpointclouds_tpu.ops.voxelize import VoxelizerConfig
from robustpointclouds_tpu.train import TrainConfig, Trainer


def tiny_pp_cfg(adversary=True):
    return PointPillarsConfig(
        voxelizer=VoxelizerConfig(
            point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
            voxel_size=(0.5, 0.5, 4.0),
            max_points_per_voxel=8,
            max_voxels=128,
        ),
        anchor_ranges=(
            (0, -8.0, -1.78, 16.0, 8.0, -1.78),
            (0, -8.0, -0.6, 16.0, 8.0, -0.6),
            (0, -8.0, -0.6, 16.0, 8.0, -0.6),
        ),
        adversary=(
            {"sensor_error_bound": 0.2, "use_spatial_attention": True,
             "hidden_channels": (8, 16, 8)}
            if adversary
            else None
        ),
    )


def tiny_batch(rng, B=2):
    b = synthetic_kitti_batch(
        rng, batch_size=B, num_points=512, max_gt=8, num_objects=3,
        point_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
    )
    return PointCloudBatch(*(jnp.asarray(x) for x in b))


class TestPointPillarsForward:
    def test_shapes_and_finite(self):
        cfg = tiny_pp_cfg()
        model = AdversarialPointPillars(cfg=cfg)
        batch = tiny_batch(np.random.RandomState(0))
        variables = jax.jit(lambda r, p, m: model.init(r, p, m, True, 5))(
            jax.random.PRNGKey(0), batch.points, batch.points_mask
        )
        outs, _ = jax.jit(lambda v, p, m: model.apply(
            v, p, m, True, 5, mutable=["batch_stats"]))(
            variables, batch.points, batch.points_mask
        )
        h, w = cfg.bev_feature_size
        assert outs.cls_scores.shape == (2, h, w, 6, 3)
        assert outs.bbox_preds.shape == (2, h, w, 6, 7)
        assert outs.dir_preds.shape == (2, h, w, 6, 2)
        for x in (outs.cls_scores, outs.bbox_preds, outs.dir_preds):
            assert bool(jnp.all(jnp.isfinite(x.astype(jnp.float32))))
        # adversary active at epoch >= 3 in train mode
        assert float(outs.adv_aux["l2_norm"]) > 0.0

    def test_adversary_gated_before_start_epoch(self):
        cfg = tiny_pp_cfg()
        model = AdversarialPointPillars(cfg=cfg)
        batch = tiny_batch(np.random.RandomState(1))
        variables = jax.jit(lambda r, p, m: model.init(r, p, m, True, 0))(
            jax.random.PRNGKey(0), batch.points, batch.points_mask
        )
        outs, _ = jax.jit(lambda v, p, m: model.apply(
            v, p, m, True, 0, mutable=["batch_stats"]))(
            variables, batch.points, batch.points_mask
        )
        assert float(outs.adv_aux["l2_norm"]) == 0.0

    def test_anchor_count_matches_head(self):
        cfg = tiny_pp_cfg()
        anchors, cls_ids = cfg.make_anchors()
        h, w = cfg.bev_feature_size
        assert anchors.shape == (h * w * 6, 7)
        assert cls_ids.shape == (h * w * 6,)


@pytest.mark.heavy
class TestPointPillarsTraining:
    def test_trainer_step_and_learning(self):
        """Trainer works unchanged on the pillar family; loss decreases when
        repeatedly stepping the same batch (single-batch overfit direction)."""
        cfg = tiny_pp_cfg()
        trainer = Trainer(
            model_cfg=cfg,
            train_cfg=TrainConfig(learning_rate=3e-4, warmup_iters=1,
                                  max_epochs=1, steps_per_epoch=8),
        ).compile(donate=False)
        assert trainer.make_plan_builder() is not None  # pillar plan builder
        batch = tiny_batch(np.random.RandomState(2))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        losses = []
        for _ in range(12):
            state, logs = trainer.train_step(state, batch, epoch=0)
            losses.append(float(logs["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert np.mean(losses[-3:]) < np.mean(losses[:3])

    def test_eval_predict_roundtrip(self):
        from robustpointclouds_tpu.models import anchor_head_predict

        cfg = tiny_pp_cfg(adversary=False)
        trainer = Trainer(model_cfg=cfg, train_cfg=TrainConfig(warmup_iters=1))
        batch = tiny_batch(np.random.RandomState(3))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        outs = trainer.forward_eval(state, batch)
        boxes, scores, labels, mask = jax.jit(
            lambda c, b, d: anchor_head_predict(c, b, d, trainer.anchors, cfg.head)
        )(outs.cls_scores, outs.bbox_preds, outs.dir_preds)
        assert boxes.shape[0] == 2 and boxes.shape[-1] == 7
        assert bool(jnp.all(jnp.isfinite(boxes)))


class TestPillarPlan:
    def test_plan_step_bitwise_equal(self):
        """Pillar host plan (voxelize + BEV grid + dense map + assign) must
        leave the step bitwise-identical to inline building."""
        cfg = tiny_pp_cfg()
        trainer = Trainer(model_cfg=cfg, train_cfg=TrainConfig(warmup_iters=5))
        batch = tiny_batch(np.random.RandomState(4))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        builder = trainer.make_plan_builder()
        assert builder is not None
        plan = builder(
            np.asarray(batch.points), np.asarray(batch.points_mask),
            np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
            np.asarray(batch.gt_mask),
        )
        assert "dense" in plan and "assign" in plan
        sa, la = jax.jit(trainer._step_impl)(state, batch, jnp.float32(5))
        sb, lb = jax.jit(trainer._step_impl)(state, batch, jnp.float32(5), plan)
        for k in la:
            assert bool(jnp.all(la[k] == lb[k])), k
        eq = jax.tree_util.tree_map(lambda x, y: bool(jnp.all(x == y)),
                                    sa.params, sb.params)
        assert all(jax.tree_util.tree_leaves(eq))
