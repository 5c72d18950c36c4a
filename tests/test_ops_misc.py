import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.ops import anchors as anchor_ops
from robustpointclouds_tpu.ops import assigner, box_coder, losses, nms


class TestBoxCoder:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        anchors = np.abs(rng.randn(10, 7)).astype(np.float32) + 0.5
        boxes = anchors + rng.randn(10, 7).astype(np.float32) * 0.1
        boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.5
        deltas = box_coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
        rec = np.asarray(box_coder.decode(deltas, jnp.asarray(anchors)))
        np.testing.assert_allclose(rec, boxes, rtol=1e-4, atol=1e-4)

    def test_zero_delta_is_anchor(self):
        a = jnp.array([[1, 2, 3, 4, 2, 1.5, 0.3]], jnp.float32)
        rec = np.asarray(box_coder.decode(jnp.zeros((1, 7)), a))
        np.testing.assert_allclose(rec, np.asarray(a), atol=1e-5)


class TestAnchors:
    def test_kitti_3class_shape(self):
        ranges = [[0, -40.0, -0.6, 70.4, 40.0, -0.6]] * 3
        sizes = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]
        a = anchor_ops.generate_anchors((200, 176), ranges, sizes)
        assert a.shape == (200, 176, 3, 2, 7)
        flat = anchor_ops.flatten_anchors(a)
        assert flat.shape == (200 * 176 * 6, 7)
        # edge alignment
        assert a[0, 0, 0, 0, 0] == pytest.approx(0.0)
        assert a[0, -1, 0, 0, 0] == pytest.approx(70.4)
        assert a[0, 0, 0, 0, 1] == pytest.approx(-40.0)
        assert a[-1, 0, 0, 0, 1] == pytest.approx(40.0)
        assert a[0, 0, 0, 1, 6] == pytest.approx(1.5707963)

    def test_class_ids(self):
        ids = anchor_ops.anchor_class_ids((2, 2), 3, 2)
        assert ids.shape == (24,)
        assert ids[:6].tolist() == [0, 0, 1, 1, 2, 2]

    def test_anchor_z_is_mmdet3d_effective_center(self):
        """mmdet3d's DeltaXYZWLHRBBoxCoder does za = za + ha/2 (range z is the
        anchor BOTTOM); this framework stores gravity-center z, so generated
        anchors must sit at range_z + dz/2 — otherwise zoo-converted models
        decode every box ~h/2 too low (ADVICE round 1)."""
        ranges = [[0, -40.0, -1.78, 70.4, 40.0, -1.78]]
        sizes = [[3.9, 1.6, 1.56]]
        a = anchor_ops.generate_anchors((4, 4), ranges, sizes)
        assert a[0, 0, 0, 0, 2] == pytest.approx(-1.78 + 1.56 / 2)

    def test_decode_parity_with_mmdet3d_semantics(self):
        """Numeric parity: decoding a known tz must reproduce mmdet3d's
        zg = tz*ha + (za_bottom + ha/2) - hg/2 ... expressed in bottom-z, i.e.
        identical gravity centers."""
        ha, hg = 1.56, 1.40
        za_bottom = -1.78
        tz = 0.25
        # mmdet3d: zg_bottom + hg/2 = tz*ha + (za_bottom + ha/2)
        expected_center = tz * ha + (za_bottom + ha / 2)
        a = anchor_ops.generate_anchors((1, 1), [[0, 0, za_bottom, 0, 0, za_bottom]],
                                        [[3.9, 1.6, ha]], rotations=(0.0,))
        anchor = jnp.asarray(anchor_ops.flatten_anchors(a))
        deltas = jnp.zeros((1, 7)).at[0, 2].set(tz).at[0, 5].set(float(np.log(hg / ha)))
        dec = np.asarray(box_coder.decode(deltas, anchor))
        assert dec[0, 2] == pytest.approx(expected_center, abs=1e-5)
        assert dec[0, 5] == pytest.approx(hg, abs=1e-5)


class TestLosses:
    def test_focal_matches_bce_at_gamma0_alpha_half(self):
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(4, 3).astype(np.float32))
        targets = jnp.asarray((rng.rand(4, 3) > 0.5).astype(np.float32))
        got = losses.sigmoid_focal_loss(logits, targets, gamma=0.0, alpha=0.5, avg_factor=1.0)
        p = jax.nn.sigmoid(logits)
        bce = -(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))
        np.testing.assert_allclose(float(got), float(0.5 * jnp.sum(bce)), rtol=1e-4)

    def test_focal_downweights_easy(self):
        easy = losses.sigmoid_focal_loss(jnp.array([[10.0]]), jnp.array([[1.0]]))
        hard = losses.sigmoid_focal_loss(jnp.array([[-10.0]]), jnp.array([[1.0]]))
        assert float(easy) < float(hard) * 1e-4

    def test_smooth_l1(self):
        beta = 1.0 / 9.0
        small = losses.smooth_l1_loss(jnp.array([0.05]), jnp.array([0.0]), beta=beta)
        assert float(small) == pytest.approx(0.5 * 0.05**2 / beta, rel=1e-5)
        large = losses.smooth_l1_loss(jnp.array([1.0]), jnp.array([0.0]), beta=beta)
        assert float(large) == pytest.approx(1.0 - 0.5 * beta, rel=1e-5)

    def test_sin_difference(self):
        pr, gr = jnp.array([0.3]), jnp.array([0.1])
        p2, g2 = losses.add_sin_difference(pr, gr)
        assert float((p2 - g2)[0]) == pytest.approx(np.sin(0.2), abs=1e-6)

    def test_gaussian_focal(self):
        pred = jnp.array([[0.9, 0.1]])
        target = jnp.array([[1.0, 0.0]])
        val = losses.gaussian_focal_loss(pred, target, avg_factor=1.0)
        assert np.isfinite(float(val)) and float(val) > 0

    def test_gaussian_focal_logits_matches_prob_form(self):
        logits = jnp.array([[2.0, -1.5, 0.3]])
        target = jnp.array([[1.0, 0.0, 0.4]])
        a = losses.gaussian_focal_loss_logits(logits, target, avg_factor=2.0)
        b = losses.gaussian_focal_loss(
            jax.nn.sigmoid(logits), target, avg_factor=2.0
        )
        assert float(a) == pytest.approx(float(b), rel=1e-5)

    def test_gaussian_focal_logits_saturation_proof(self):
        """The on-chip CenterPoint NaN (v5e 2026-08-19): saturated heatmap
        logits make sigmoid exactly 0/1 and the prob-form loss (or its VJP)
        non-finite. The logit form must stay finite — value AND grad — at any
        magnitude, including a bf16 upstream cast."""
        target = jnp.array([[1.0, 0.0, 0.0, 1.0]])

        def f(x):
            return losses.gaussian_focal_loss_logits(x, target, avg_factor=1.0)

        for mag in (30.0, 90.0):
            logits = jnp.array([[mag, mag, -mag, -mag]])
            val, grad = jax.value_and_grad(f)(logits)
            assert np.isfinite(float(val))
            assert np.isfinite(np.asarray(grad)).all()
        # bf16 logits (the head's compute dtype) round-trip without NaN too
        logits = jnp.array([[8.0, 8.0, -8.0, -8.0]], jnp.bfloat16)
        val, grad = jax.value_and_grad(lambda x: f(x.astype(jnp.float32)))(logits)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad, np.float32)).all()


class TestNMS:
    def test_rotated_suppression(self):
        boxes = jnp.array(
            [
                [0, 0, 2, 2, 0.0],
                [0.1, 0, 2, 2, 0.0],   # heavy overlap with first
                [10, 10, 2, 2, 0.0],   # far away
            ],
            jnp.float32,
        )
        keep = np.asarray(nms.rotated_nms(boxes, None, jnp.ones(3, bool), 0.3))
        assert keep.tolist() == [True, False, True]

    def test_circle(self):
        centers = jnp.array([[0.0, 0.0], [0.5, 0.0], [10.0, 0.0]])
        keep = np.asarray(nms.circle_nms(centers, jnp.ones(3, bool), radius=1.0))
        assert keep.tolist() == [True, False, True]

    def test_topk_pipeline(self):
        rng = np.random.RandomState(0)
        n = 20
        boxes = np.zeros((n, 7), np.float32)
        boxes[:, :2] = rng.uniform(0, 50, (n, 2))
        boxes[:, 3:6] = 2.0
        boxes[0, :2] = boxes[1, :2]  # duplicate pair
        scores = np.linspace(0.9, 0.2, n).astype(np.float32)
        labels = np.zeros(n, np.int32)
        b, s, l, m = nms.topk_nms_3d(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
            jnp.ones(n, bool), score_thr=0.1, nms_pre=16, iou_thr=0.1, max_num=8,
        )
        m = np.asarray(m)
        assert b.shape == (8, 7) and m.sum() <= 8
        # the duplicate (lower-scored box 1) must be suppressed
        kept_xy = np.asarray(b)[m][:, :2]
        d = np.linalg.norm(kept_xy[:, None] - kept_xy[None], axis=-1)
        np.fill_diagonal(d, 1e9)
        assert d.min() > 0.5

    def test_jit(self):
        fn = jax.jit(
            lambda b, s, l, v: nms.topk_nms_3d(b, s, l, v, nms_pre=8, max_num=4)
        )
        b = jnp.zeros((10, 7)).at[:, 3:6].set(1.0)
        out = fn(b, jnp.linspace(1, 0.2, 10), jnp.zeros(10, jnp.int32), jnp.ones(10, bool))
        assert out[0].shape == (4, 7)


class TestAssigner:
    def _setup(self):
        anchors = jnp.array(
            [
                [0, 0, 0, 4, 2, 1.5, 0],     # near gt0
                [20, 0, 0, 4, 2, 1.5, 0],    # background
                [0.5, 0.2, 0, 4, 2, 1.5, 0], # partial overlap with gt0
                [40, 0, 0, 0.8, 0.6, 1.7, 0],# near gt1 (ped)
            ],
            jnp.float32,
        )
        anchor_cls = jnp.array([0, 0, 0, 1], jnp.int32)
        gts = jnp.array(
            [
                [0, 0, 0, 4, 2, 1.5, 0],
                [40, 0.1, 0, 0.8, 0.6, 1.7, 0],
                [0, 0, 0, 0, 0, 0, 0],  # padding
            ],
            jnp.float32,
        )
        gt_labels = jnp.array([0, 1, -1], jnp.int32)
        gt_mask = jnp.array([True, True, False])
        return anchors, anchor_cls, gts, gt_labels, gt_mask

    def test_assignment(self):
        a, ac, g, gl, gm = self._setup()
        res = assigner.assign(
            a, ac, g, gl, gm,
            pos_iou_thr=[0.6, 0.35, 0.35],
            neg_iou_thr=[0.45, 0.2, 0.2],
            min_pos_iou=[0.45, 0.2, 0.2],
        )
        labels = np.asarray(res.labels)
        assert labels[0] == 0      # perfect match -> Car
        assert labels[1] == -1     # background
        assert labels[3] == 1      # pedestrian match
        assert np.asarray(res.matched_gt)[0] == 0
        assert np.asarray(res.matched_gt)[3] == 1

    def test_force_match_low_iou_gt(self):
        # gt that no anchor reaches pos_thr for still claims its best anchor
        anchors = jnp.array([[1.2, 0.8, 0, 4, 2, 1.5, 0]], jnp.float32)
        ac = jnp.zeros(1, jnp.int32)
        gts = jnp.array([[0, 0, 0, 4, 2, 1.5, 0]], jnp.float32)
        res = assigner.assign(
            anchors, ac, gts, jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
            pos_iou_thr=[0.9], neg_iou_thr=[0.05], min_pos_iou=[0.1],
        )
        assert np.asarray(res.pos_mask)[0]

    def test_ignore_band(self):
        anchors = jnp.array([[1.0, 0.5, 0, 4, 2, 1.5, 0]], jnp.float32)
        gts = jnp.array([[0, 0, 0, 4, 2, 1.5, 0]], jnp.float32)
        res = assigner.assign(
            anchors, jnp.zeros(1, jnp.int32), gts, jnp.zeros(1, jnp.int32),
            jnp.ones(1, bool),
            pos_iou_thr=[0.95], neg_iou_thr=[0.05], min_pos_iou=[0.99],
        )
        assert np.asarray(res.labels)[0] == -2  # in the ignore band
