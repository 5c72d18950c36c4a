import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.data import synthetic_kitti_batch
from robustpointclouds_tpu.data.structures import PointCloudBatch
from robustpointclouds_tpu.models import (
    AdversarialVoxelNet,
    AnchorHeadConfig,
    VoxelNetConfig,
    anchor_head_loss,
    anchor_head_predict,
    adversary_direct_terms,
)
from robustpointclouds_tpu.ops.voxelize import VoxelizerConfig


def tiny_cfg(adversary=True):
    return VoxelNetConfig(
        voxelizer=VoxelizerConfig(
            point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
            voxel_size=(0.5, 0.5, 0.125),
            max_points_per_voxel=3,
            max_voxels=512,
        ),
        anchor_ranges=(
            (0, -8.0, -0.6, 16.0, 8.0, -0.6),
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
    return synthetic_kitti_batch(
        rng, batch_size=B, num_points=512, max_gt=8, num_objects=3,
        point_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
    )


def as_jnp(b):
    return PointCloudBatch(*(jnp.asarray(x) for x in b))


class TestModelForward:
    def test_shapes(self):
        cfg = tiny_cfg()
        model = AdversarialVoxelNet(cfg=cfg)
        batch = as_jnp(tiny_batch(np.random.RandomState(0)))
        variables = model.init(jax.random.PRNGKey(0), batch.points, batch.points_mask, True, 0)
        outs, _ = model.apply(
            variables, batch.points, batch.points_mask, True, 5, mutable=["batch_stats"]
        )
        ny, nx = cfg.bev_feature_size
        assert outs.cls_scores.shape == (2, ny, nx, 6, 3)
        assert outs.bbox_preds.shape == (2, ny, nx, 6, 7)
        assert outs.dir_preds.shape == (2, ny, nx, 6, 2)
        assert np.isfinite(np.asarray(outs.cls_scores)).all()
        assert float(outs.adv_aux["l2_norm"]) > 0  # adversary active at epoch 5

    def test_epoch_gate(self):
        cfg = tiny_cfg()
        model = AdversarialVoxelNet(cfg=cfg)
        batch = as_jnp(tiny_batch(np.random.RandomState(0)))
        variables = model.init(jax.random.PRNGKey(0), batch.points, batch.points_mask, True, 0)
        outs, _ = model.apply(
            variables, batch.points, batch.points_mask, True, 0, mutable=["batch_stats"]
        )
        assert float(outs.adv_aux["l2_norm"]) == 0.0  # gated before epoch 3

    def test_attack_bypasses_gate_in_eval(self):
        cfg = tiny_cfg()
        model = AdversarialVoxelNet(cfg=cfg)
        batch = as_jnp(tiny_batch(np.random.RandomState(0)))
        variables = model.init(jax.random.PRNGKey(0), batch.points, batch.points_mask, True, 0)
        outs = model.apply(variables, batch.points, batch.points_mask, False, 0, True)
        assert float(outs.adv_aux["l2_norm"]) > 0

    def test_no_adversary(self):
        cfg = tiny_cfg(adversary=False)
        model = AdversarialVoxelNet(cfg=cfg)
        batch = as_jnp(tiny_batch(np.random.RandomState(0)))
        variables = model.init(jax.random.PRNGKey(0), batch.points, batch.points_mask, True, 0)
        outs, _ = model.apply(
            variables, batch.points, batch.points_mask, True, 10, mutable=["batch_stats"]
        )
        assert float(outs.adv_aux["l2_norm"]) == 0.0
        assert "adversary" not in variables["params"]


class TestDetectionLoss:
    def _outputs_and_batch(self):
        cfg = tiny_cfg(adversary=False)
        model = AdversarialVoxelNet(cfg=cfg)
        batch = as_jnp(tiny_batch(np.random.RandomState(0)))
        variables = model.init(jax.random.PRNGKey(0), batch.points, batch.points_mask, True, 0)
        outs, _ = model.apply(
            variables, batch.points, batch.points_mask, True, 0, mutable=["batch_stats"]
        )
        return cfg, outs, batch

    def test_loss_finite_and_positive(self):
        cfg, outs, batch = self._outputs_and_batch()
        anchors, anchor_cls = cfg.make_anchors()
        det = anchor_head_loss(
            outs.cls_scores, outs.bbox_preds, outs.dir_preds,
            jnp.asarray(anchors), jnp.asarray(anchor_cls),
            batch.gt_boxes, batch.gt_labels, batch.gt_mask, cfg.head,
        )
        for k in ("loss_cls", "loss_bbox", "loss_dir"):
            v = float(det[k])
            assert np.isfinite(v) and v >= 0, (k, v)
        assert float(det["num_pos"]) > 0  # synthetic objects produce positives

    def test_empty_gt_zero_bbox_loss(self):
        cfg, outs, batch = self._outputs_and_batch()
        anchors, anchor_cls = cfg.make_anchors()
        det = anchor_head_loss(
            outs.cls_scores, outs.bbox_preds, outs.dir_preds,
            jnp.asarray(anchors), jnp.asarray(anchor_cls),
            batch.gt_boxes, batch.gt_labels,
            jnp.zeros_like(batch.gt_mask), cfg.head,
        )
        assert float(det["loss_bbox"]) == 0.0
        assert float(det["loss_cls"]) > 0  # background focal loss remains

    def test_predict_shapes(self):
        cfg, outs, batch = self._outputs_and_batch()
        anchors, _ = cfg.make_anchors()
        head = cfg.head._replace(nms_pre=32, max_num=16, score_thr=0.0)
        boxes, scores, labels, mask = anchor_head_predict(
            outs.cls_scores, outs.bbox_preds, outs.dir_preds, jnp.asarray(anchors), head
        )
        assert boxes.shape == (2, 16, 7)
        assert scores.shape == (2, 16)
        assert labels.shape == (2, 16)


class TestAdversaryObjective:
    def test_terms(self):
        det = {"loss_cls": jnp.float32(1.0), "loss_bbox": jnp.float32(2.0),
               "loss_dir": jnp.float32(0.5), "num_pos": jnp.float32(4)}
        aux = {"l2_norm": jnp.float32(0.02), "intensity_loss": jnp.float32(0.01),
               "bias_loss": jnp.float32(0.001), "imbalance_loss": jnp.float32(0.002)}
        total, logs = adversary_direct_terms(det, aux, epoch=5)
        assert np.isfinite(float(total))
        assert float(logs["perturbation_l2_norm"]) == pytest.approx(0.02)
        # loss_adversarial log = clamp(-det_total + l2_mag): det 3.5 -> -3.5 + 0.3
        assert float(logs["loss_adversarial"]) == pytest.approx(-3.5 + 0.3, abs=1e-4)

    def test_reg_weakness_adaptive(self):
        det = {"loss_cls": jnp.float32(1.0)}
        weak_aux = {"l2_norm": jnp.float32(0.0005), "intensity_loss": jnp.float32(0.0),
                    "bias_loss": jnp.float32(0.0), "imbalance_loss": jnp.float32(0.0)}
        strong_aux = {k: (jnp.float32(0.05) if k == "l2_norm" else v)
                      for k, v in weak_aux.items()}
        _, logs_w = adversary_direct_terms(det, weak_aux, epoch=0)
        _, logs_s = adversary_direct_terms(det, strong_aux, epoch=0)
        # reg per-unit-l2 must be ~100x smaller when perturbations are weak
        per_w = float(logs_w["loss_l2_regularization"]) / 0.0005
        per_s = float(logs_s["loss_l2_regularization"]) / 0.05
        assert per_w == pytest.approx(per_s * 0.01, rel=1e-3)
