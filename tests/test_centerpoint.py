import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.data.nuscenes import (
    NUSCENES_CLASSES,
    synthetic_nuscenes_batch,
)
from robustpointclouds_tpu.data.structures import PointCloudBatch
from robustpointclouds_tpu.eval.nuscenes_metric import eval_nuscenes_map
from robustpointclouds_tpu.models.center_detection import (
    CenterHeadConfig,
    centerpoint_decode,
    centerpoint_loss,
    gaussian_radius,
)
from robustpointclouds_tpu.models.centerpoint import (
    AdversarialCenterPoint,
    CenterPointConfig,
    centerpoint_adversary_terms,
)
from robustpointclouds_tpu.nn.center_head import NUSCENES_TASKS, CenterHead
from robustpointclouds_tpu.ops.voxelize import VoxelizerConfig


def tiny_cp_cfg(adversary=True):
    return CenterPointConfig(
        voxelizer=VoxelizerConfig(
            point_cloud_range=(-12.8, -12.8, -5.0, 12.8, 12.8, 3.0),
            voxel_size=(0.4, 0.4, 0.2),
            max_points_per_voxel=3,
            max_voxels=512,
        ),
        head=CenterHeadConfig(
            tasks=NUSCENES_TASKS,
            point_cloud_range=(-12.8, -12.8, -5.0, 12.8, 12.8, 3.0),
            voxel_size=(0.4, 0.4),
            max_objs=16,
            nms_pre=64,
            max_per_task=8,
        ),
        adversary=(
            {"sensor_error_bound": 0.2, "use_spatial_attention": True,
             "hidden_channels": (8, 16)}
            if adversary
            else None
        ),
    )


def tiny_cp_batch(rng, B=2):
    batch, vel = synthetic_nuscenes_batch(
        rng, batch_size=B, num_points=512, max_gt=8, num_objects=4,
        point_range=(-12.8, -12.8, -5.0, 12.8, 12.8, 3.0),
    )
    return PointCloudBatch(*(jnp.asarray(x) for x in batch)), jnp.asarray(vel)


class TestCenterHead:
    def test_shapes(self):
        head = CenterHead(tasks=NUSCENES_TASKS)
        x = jnp.ones((2, 8, 8, 64))
        v = head.init(jax.random.PRNGKey(0), x, False)
        outs = head.apply(v, x, False)
        assert len(outs) == 6
        assert outs[0]["heatmap"].shape == (2, 8, 8, 1)   # car task
        assert outs[1]["heatmap"].shape == (2, 8, 8, 2)   # truck+cv
        for t in outs:
            assert t["reg"].shape == (2, 8, 8, 2)
            assert t["dim"].shape == (2, 8, 8, 3)
            assert t["vel"].shape == (2, 8, 8, 2)

    def test_heatmap_bias_init(self):
        head = CenterHead(tasks=NUSCENES_TASKS)
        x = jnp.zeros((1, 4, 4, 16))
        v = head.init(jax.random.PRNGKey(0), x, False)
        outs = head.apply(v, x, False)
        p = jax.nn.sigmoid(np.asarray(outs[0]["heatmap"]))
        assert np.all(p < 0.05)


class TestGaussianRadius:
    def test_monotone_in_size(self):
        small = float(gaussian_radius(jnp.float32(2.0), jnp.float32(2.0), 0.1))
        large = float(gaussian_radius(jnp.float32(10.0), jnp.float32(10.0), 0.1))
        assert large > small > 0


class TestCenterPointModel:
    def test_forward_and_gate(self):
        cfg = tiny_cp_cfg()
        model = AdversarialCenterPoint(cfg=cfg)
        batch, vel = tiny_cp_batch(np.random.RandomState(0))
        v = model.init(jax.random.PRNGKey(0), batch.points, batch.points_mask, True, 0)
        outs, _ = model.apply(
            v, batch.points, batch.points_mask, True, 5, mutable=["batch_stats"]
        )
        ny, nx = cfg.bev_feature_size
        assert outs.task_preds[0]["heatmap"].shape == (2, ny, nx, 1)
        assert float(outs.adv_aux["l2_norm"]) > 0
        outs0, _ = model.apply(
            v, batch.points, batch.points_mask, True, 0, mutable=["batch_stats"]
        )
        assert float(outs0.adv_aux["l2_norm"]) == 0.0  # epoch gate

    def test_timestamp_channel_untouched(self):
        # 5-feature NuScenes points: adversary must zero the timestamp channel
        cfg = tiny_cp_cfg()
        model = AdversarialCenterPoint(cfg=cfg)
        batch, _ = tiny_cp_batch(np.random.RandomState(1))
        v = model.init(jax.random.PRNGKey(0), batch.points, batch.points_mask, True, 0)
        # directly probe the perturber through the model's param tree
        from robustpointclouds_tpu.nn import VoxelPerturber

        pert = VoxelPerturber(num_features=5, hidden_channels=(8, 16))
        pv = pert.init(jax.random.PRNGKey(0), jnp.ones((16, 5)), jnp.ones(16, bool), True)
        (out, aux), _ = pert.apply(
            pv, jnp.ones((16, 5)), jnp.ones(16, bool), True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(np.asarray(out[:, 4]), 1.0)


class TestCenterPointLoss:
    def test_loss_and_decode_roundtrip(self):
        cfg = tiny_cp_cfg(adversary=False)
        model = AdversarialCenterPoint(cfg=cfg)
        batch, vel = tiny_cp_batch(np.random.RandomState(0))
        v = model.init(jax.random.PRNGKey(0), batch.points, batch.points_mask, True, 0)
        outs, _ = model.apply(
            v, batch.points, batch.points_mask, True, 0, mutable=["batch_stats"]
        )
        losses = centerpoint_loss(
            outs.task_preds, batch.gt_boxes, batch.gt_labels, batch.gt_mask, vel,
            cfg.head,
        )
        assert np.isfinite(float(losses["loss_heatmap"]))
        assert np.isfinite(float(losses["loss_bbox"]))
        assert float(losses["loss_heatmap"]) > 0

        boxes, scores, labels, mask = centerpoint_decode(outs.task_preds, cfg.head)
        assert boxes.shape[-1] == 9
        assert boxes.shape[0] == 2

    def test_perfect_heatmap_decodes_gt(self):
        """Build ideal predictions from targets; decode must recover the GTs."""
        from robustpointclouds_tpu.models.center_detection import (
            centerpoint_targets_single,
        )

        cfg = tiny_cp_cfg(adversary=False).head
        H = W = 8
        cfg = cfg._replace(out_factor=8, voxel_size=(0.4, 0.4), score_thr=0.3)
        gt_boxes = jnp.array(
            [[0.0, 0.0, -1.0, 4.6, 1.95, 1.7, 0.5]], jnp.float32
        )
        gt_labels = jnp.array([0], jnp.int32)  # car
        gt_mask = jnp.array([True])
        gt_vel = jnp.array([[1.0, -2.0]], jnp.float32)
        tgts = centerpoint_targets_single(
            gt_boxes, gt_labels, gt_mask, gt_vel, (H, W), cfg
        )
        # craft dense predictions whose positive cells carry the target rows
        preds = []
        for t, tgt in enumerate(tgts):
            C = tgt["heatmap"].shape[-1]
            logits = jnp.log(jnp.clip(tgt["heatmap"], 1e-6, 1 - 1e-6) /
                             (1 - jnp.clip(tgt["heatmap"], 1e-6, 1 - 1e-6)))
            reg = jnp.zeros((1, H, W, 10))
            anno = tgt["anno"][0]
            pos = int(tgt["pos"][0])
            iy, ix = pos // W, pos % W
            reg = reg.at[0, iy, ix, :].set(anno)
            preds.append({
                "heatmap": logits[None],
                "reg": reg[..., 0:2], "height": reg[..., 2:3],
                "dim": reg[..., 3:6], "rot": reg[..., 6:8], "vel": reg[..., 8:10],
            })
        boxes, scores, labels, mask = centerpoint_decode(preds, cfg)
        m = np.asarray(mask[0])
        got = np.asarray(boxes[0])[m]
        assert len(got) >= 1
        best = got[np.argmax(np.asarray(scores[0])[m])]
        np.testing.assert_allclose(best[:3], [0.0, 0.0, -1.0], atol=0.05)
        np.testing.assert_allclose(best[3:6], [4.6, 1.95, 1.7], rtol=0.01)
        assert abs(((best[6] - 0.5 + np.pi) % (2 * np.pi)) - np.pi) < 0.02
        np.testing.assert_allclose(best[7:9], [1.0, -2.0], atol=0.02)
        assert int(labels[0][np.argmax(np.asarray(scores[0]))]) == 0


class TestCenterPointAdversaryTerms:
    def test_epoch_ramp(self):
        det = {"loss_heatmap": jnp.float32(2.0), "loss_bbox": jnp.float32(1.0)}
        aux = {"l2_norm": jnp.float32(0.05)}
        _, s0, logs0 = centerpoint_adversary_terms(det, aux, epoch=0)
        _, s5, logs5 = centerpoint_adversary_terms(det, aux, epoch=5)
        _, s20, logs20 = centerpoint_adversary_terms(det, aux, epoch=20)
        assert float(s0) == 0.0
        assert float(s5) == pytest.approx(-0.025)
        assert float(s20) == pytest.approx(-0.05)  # capped at w
        assert float(logs5["loss_l2_regularization"]) == pytest.approx(0.005 * 0.05)


class TestNuScenesMetric:
    def test_perfect(self):
        gt = [{"boxes_3d": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32),
               "labels": np.array([0])}]
        dt = [{"boxes_3d": np.array([[0.1, 0, 0, 4, 2, 1.5, 0.0]], np.float32),
               "labels": np.array([0]), "score": np.array([0.9], np.float32)}]
        res = eval_nuscenes_map(gt, dt, NUSCENES_CLASSES)
        assert res["car_AP"] > 95.0
        assert res["mAP"] > 0

    def test_distance_thresholds(self):
        gt = [{"boxes_3d": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32),
               "labels": np.array([0])}]
        # 1.5m off: matches at 2m and 4m thresholds only -> AP ~ 2/4
        dt = [{"boxes_3d": np.array([[1.5, 0, 0, 4, 2, 1.5, 0.0]], np.float32),
               "labels": np.array([0]), "score": np.array([0.9], np.float32)}]
        res = eval_nuscenes_map(gt, dt, NUSCENES_CLASSES)
        assert 40.0 < res["car_AP"] < 60.0

    def test_wrong_class_no_credit(self):
        gt = [{"boxes_3d": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32),
               "labels": np.array([0])}]
        dt = [{"boxes_3d": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32),
               "labels": np.array([3]), "score": np.array([0.9], np.float32)}]
        res = eval_nuscenes_map(gt, dt, NUSCENES_CLASSES)
        assert res["car_AP"] == 0.0


class TestCenterPointPlan:
    def test_plan_step_bitwise_equal(self):
        from robustpointclouds_tpu.train.centerpoint_loop import CenterPointTrainer

        tr = CenterPointTrainer(model_cfg=tiny_cp_cfg())
        batch, vel = tiny_cp_batch(np.random.RandomState(11))
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        plan = tr.make_plan_builder()(
            np.asarray(batch.points), np.asarray(batch.points_mask),
            np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
            np.asarray(batch.gt_mask), np.asarray(vel),
        )
        assert "targets" in plan
        sa, la = jax.jit(tr._step_impl)(state, batch, vel, jnp.float32(5))
        sb, lb = jax.jit(tr._step_impl)(state, batch, vel, jnp.float32(5), plan)
        for k in la:
            assert bool(jnp.all(la[k] == lb[k])), k
        eq = jax.tree_util.tree_map(lambda x, y: bool(jnp.all(x == y)),
                                    sa.params, sb.params)
        assert all(jax.tree_util.tree_leaves(eq))


class TestCenterPointDDP:
    def test_ddp_sharded_plan_step_partitions_flops(self):
        """CenterPoint DDP (compile_sharded + per-device sub-plans): finite
        loss on an 8-device mesh and per-device compiled FLOPs ~1/8 of the
        single-device module (the round-3 replicated-plan defect, fixed for
        every trainer — see test_parallel.py for the flagship)."""
        from robustpointclouds_tpu.parallel import (
            make_mesh, replicate, shard_batch, shard_stacked, stack_plans,
        )
        from robustpointclouds_tpu.train.centerpoint_loop import CenterPointTrainer

        n = 8
        tr1 = CenterPointTrainer(model_cfg=tiny_cp_cfg())
        batch, vel = tiny_cp_batch(np.random.RandomState(3), B=n)
        state = tr1.init_state(jax.random.PRNGKey(0), batch)
        pb = tr1.make_plan_builder()
        args = (
            np.asarray(batch.points), np.asarray(batch.points_mask),
            np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
            np.asarray(batch.gt_mask), np.asarray(vel),
        )
        plan_g = pb(*args)
        tr1.compile(donate=False)
        cost1 = tr1._train_step.lower(
            state, batch, vel, jnp.float32(5),
            jax.device_put(plan_g, jax.devices()[0]),
        ).compile().cost_analysis()
        cost1 = cost1[0] if isinstance(cost1, (list, tuple)) else cost1
        flops_single = float(cost1.get("flops", 0.0))

        tr2 = CenterPointTrainer(model_cfg=tiny_cp_cfg())
        mesh = make_mesh(jax.devices()[:n])
        plans = [pb(*(a[i:i + 1] for a in args)) for i in range(n)]
        with mesh:
            state_r = replicate(state, mesh)
            batch_s = shard_batch(batch, mesh)
            vel_s = shard_batch(vel, mesh)
            plan_s = shard_stacked(stack_plans(plans), mesh)
            tr2.compile_sharded(mesh, donate=False)
            s2, logs2 = tr2.train_step(state_r, batch_s, vel_s, 5, plan=plan_s)
            cost = tr2._train_step.lower(
                state_r, batch_s, vel_s, jnp.float32(5), plan_s
            ).compile().cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops_dev = float(cost.get("flops", 0.0))

        assert np.isfinite(float(logs2["loss"]))
        assert int(s2.step) == 1
        assert flops_single > 0 and flops_dev > 0
        assert flops_dev / flops_single < 2.0 / n, (
            f"per-device FLOPs not partitioned: {flops_dev / flops_single:.3f}"
        )
