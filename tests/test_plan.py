"""Host-prepared sparse plans must be EXACTLY equivalent to inline building.

The plan (models/voxelnet.build_plan) is the whole index side of the step —
voxelization, batch merge, submanifold relations, downsample site sets and
forward/inverse indices — computed in the input pipeline instead of on the
device. Because the same jax functions build it on either backend, plan-fed
and inline steps must agree BITWISE, not just approximately; these tests pin
that, plus the loader-facing HostPlanBuilder wrapper.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.data import synthetic_kitti_batch
from robustpointclouds_tpu.data.structures import PointCloudBatch
from robustpointclouds_tpu.models import AdversarialVoxelNet, VoxelNetConfig
from robustpointclouds_tpu.models.voxelnet import build_plan
from robustpointclouds_tpu.ops.voxelize import VoxelizerConfig
from robustpointclouds_tpu.train import TrainConfig, Trainer
from robustpointclouds_tpu.train.loop import HostPlanBuilder


def tiny_cfg():
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
        adversary={"sensor_error_bound": 0.2, "use_spatial_attention": True,
                   "hidden_channels": (8, 16, 8)},
    )


def tiny_batch(rng, B=2):
    b = synthetic_kitti_batch(
        rng, batch_size=B, num_points=512, max_gt=8, num_objects=3,
        point_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
    )
    return PointCloudBatch(*(jnp.asarray(x) for x in b))


def _tree_equal(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    return all(bool(jnp.all(x == y)) for x, y in zip(leaves_a, leaves_b))


class TestPlanEquivalence:
    def test_forward_bitwise_equal(self):
        cfg = tiny_cfg()
        model = AdversarialVoxelNet(cfg=cfg)
        batch = tiny_batch(np.random.RandomState(0))
        variables = jax.jit(lambda r, p, m: model.init(r, p, m, True, 5))(
            jax.random.PRNGKey(0), batch.points, batch.points_mask
        )
        fa = jax.jit(lambda v, p, m: model.apply(
            v, p, m, True, 5, False, -1.0, mutable=["batch_stats"]))
        fb = jax.jit(lambda v, p, m, pl: model.apply(
            v, p, m, True, 5, False, -1.0, pl, mutable=["batch_stats"]))
        outs_a, mut_a = fa(variables, batch.points, batch.points_mask)
        plan = jax.jit(lambda p, m: build_plan(p, m, cfg))(
            batch.points, batch.points_mask
        )
        outs_b, mut_b = fb(variables, batch.points, batch.points_mask, plan)
        assert bool(jnp.all(outs_a.cls_scores == outs_b.cls_scores))
        assert bool(jnp.all(outs_a.bbox_preds == outs_b.bbox_preds))
        assert bool(jnp.all(outs_a.dir_preds == outs_b.dir_preds))
        assert _tree_equal(outs_a.adv_aux, outs_b.adv_aux)
        assert _tree_equal(mut_a, mut_b)

    def test_plan_shapes_and_keys(self):
        cfg = tiny_cfg()
        batch = tiny_batch(np.random.RandomState(1))
        plan = jax.jit(lambda p, m: build_plan(p, m, cfg))(
            batch.points, batch.points_mask
        )
        enc = plan["enc"]
        assert sorted(enc.keys()) == [
            "down1", "down2", "down3", "out", "rel0", "rel1", "rel2", "rel3"
        ]
        n0 = plan["grid_ids"].shape[0]
        assert n0 == batch.points.shape[0] * cfg.voxelizer.max_voxels
        # width rule: 16/32ch grids ride the x-window form, 64ch dense
        assert "rows" in enc["rel0"] and "rows" in enc["rel1"]
        assert "idx" in enc["rel2"] and "idx" in enc["rel3"]
        # xwin downsamples don't ship the (unused) dense forward index
        assert "idx" not in enc["down1"] and "idx" not in enc["down2"]
        assert "idx" in enc["down3"] and "idx" in enc["out"]
        # every leaf is an array (jit-transportable): no static leaves inside
        for leaf in jax.tree_util.tree_leaves(plan):
            assert hasattr(leaf, "dtype")

    def test_train_step_bitwise_equal(self):
        cfg = tiny_cfg()
        trainer = Trainer(model_cfg=cfg, train_cfg=TrainConfig(warmup_iters=5))
        batch = tiny_batch(np.random.RandomState(2))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step_a = jax.jit(trainer._step_impl)
        step_b = jax.jit(trainer._step_impl)
        # full plan incl. the host-side anchor assignment
        plan = jax.jit(
            lambda p, m, gb, gl, gm: build_plan(p, m, cfg, gb, gl, gm)
        )(batch.points, batch.points_mask, batch.gt_boxes,
          batch.gt_labels, batch.gt_mask)
        assert "assign" in plan
        sa, logs_a = step_a(state, batch, jnp.float32(5))
        sb, logs_b = step_b(state, batch, jnp.float32(5), plan)
        assert _tree_equal(logs_a, logs_b)
        assert _tree_equal(sa.params, sb.params)
        assert _tree_equal(sa.batch_stats, sb.batch_stats)

    def test_scan_with_plan(self):
        """bench.py's timed-loop form: lax.scan over fused steps with the
        plan closed over and its voxels perturbed per iteration."""
        cfg = tiny_cfg()
        trainer = Trainer(model_cfg=cfg, train_cfg=TrainConfig(warmup_iters=5))
        batch = tiny_batch(np.random.RandomState(4))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        plan = jax.jit(
            lambda p, m, gb, gl, gm: build_plan(p, m, cfg, gb, gl, gm)
        )(batch.points, batch.points_mask, batch.gt_boxes,
          batch.gt_labels, batch.gt_mask)

        def scan_steps(state, batch, plan):
            def body(carry, _):
                st, eps = carry
                b = batch._replace(points=batch.points + eps * 1e-30)
                pl = dict(plan, voxels=plan["voxels"] + eps * 1e-30)
                st2, logs = trainer._step_impl(st, b, jnp.float32(5), pl)
                return (st2, logs["loss"]), logs["loss"]

            (st, _), losses = jax.lax.scan(
                body, (state, jnp.float32(0)), None, length=2
            )
            return st, losses

        st, losses = jax.jit(scan_steps)(state, batch, plan)
        assert np.isfinite(np.asarray(losses)).all()
        assert int(st.step) == 2

    def test_host_plan_builder(self):
        cfg = tiny_cfg()
        builder = HostPlanBuilder(cfg)
        batch = tiny_batch(np.random.RandomState(3))
        plan = builder(
            np.asarray(batch.points), np.asarray(batch.points_mask),
            np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
            np.asarray(batch.gt_mask),
        )
        ref = jax.jit(
            lambda p, m, gb, gl, gm: build_plan(p, m, cfg, gb, gl, gm)
        )(batch.points, batch.points_mask, batch.gt_boxes,
          batch.gt_labels, batch.gt_mask)
        assert _tree_equal(plan, ref)
        assert "assign" in plan


def test_dense_gather_matches_scatter():
    """Gather-form densification == scatter_to_dense, fwd and bwd."""
    from robustpointclouds_tpu.ops import sparse

    rng = np.random.RandomState(5)
    shape = (2, 3, 6, 7)
    total = int(np.prod(shape))
    flat = np.sort(rng.choice(total, 40, replace=False))
    coords = np.stack(np.unravel_index(flat, shape), axis=1).astype(np.int32)
    coords_full = np.full((64, 4), -1, np.int32)
    coords_full[:40] = coords
    mask = np.zeros(64, bool)
    mask[:40] = True
    grid = sparse.make_grid(jnp.asarray(coords_full), jnp.asarray(mask), shape)
    feats = jnp.where(grid.mask[:, None],
                      jnp.asarray(rng.randn(64, 5).astype(np.float32)), 0.0)
    dmap = sparse.dense_gather_map(grid)

    a = sparse.scatter_to_dense(feats, grid)
    b = sparse.scatter_to_dense_gather(feats, grid, dmap)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    g_out = jnp.asarray(rng.randn(*a.shape).astype(np.float32))
    ga = jax.grad(lambda f: jnp.sum(sparse.scatter_to_dense(f, grid) * g_out))(feats)
    gb = jax.grad(
        lambda f: jnp.sum(sparse.scatter_to_dense_gather(f, grid, dmap) * g_out)
    )(feats)
    m = np.asarray(grid.mask)
    np.testing.assert_array_equal(np.asarray(ga)[m], np.asarray(gb)[m])
    # padding rows must get zero gradient from the gather form
    assert not np.any(np.asarray(gb)[~m])


def test_dense_gather_step_matches(monkeypatch):
    """RPC_DENSE_GATHER: the native builder's dense map must equal
    ops/sparse.dense_gather_map on the out grid, and the plan-fed step must
    produce identical logs/params to the scatter-form step."""
    from robustpointclouds_tpu.nn import sparse_encoder as se
    from robustpointclouds_tpu.ops import sparse

    cfg = tiny_cfg()
    trainer = Trainer(model_cfg=cfg, train_cfg=TrainConfig(warmup_iters=5))
    batch = tiny_batch(np.random.RandomState(6))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    args = (np.asarray(batch.points), np.asarray(batch.points_mask),
            np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
            np.asarray(batch.gt_mask))

    plan_off = HostPlanBuilder(cfg)(*args)
    sa, la = jax.jit(trainer._step_impl)(state, batch, jnp.float32(5), plan_off)

    monkeypatch.setattr(se, "DENSE_GATHER", True)
    plan_on = HostPlanBuilder(cfg)(*args)
    st = plan_on["enc"]["out"]
    assert "dense" in st
    # cross-check the attached map against the jax builder's form
    b = batch.points.shape[0]
    shape = (b,) + tuple(cfg.voxelizer.sparse_shape)
    for i in (1, 2, 3):
        shape = se._down_shape(shape, *se._down_geom(4, i))
    shape = se._down_shape(shape, *se._OUT_GEOM)
    grid = sparse.SparseGrid(
        jnp.asarray(st["ids"]), jnp.asarray(st["coords"]),
        jnp.asarray(st["mask"]), shape,
    )
    ref_map = np.asarray(sparse.dense_gather_map(grid))
    np.testing.assert_array_equal(np.asarray(st["dense"]), ref_map)

    sb, lb = jax.jit(trainer._step_impl)(state, batch, jnp.float32(5), plan_on)
    assert _tree_equal(la, lb)
    assert _tree_equal(sa.params, sb.params)
