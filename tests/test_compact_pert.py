"""Compact-point adversary (RPC_COMPACT_PERT) equivalence tests.

The compact form runs the perturber MLP over the raw point list and gathers
the bounded deltas into voxel slots through the voxelizer's point<->slot
bijection (ops/voxelize slot_point/point_slot). The surviving points are in
bijection with the valid padded slots, so every masked statistic sees the
same multiset of rows — outputs must match the padded form to f32
reduction-order tolerance, and the plan-fed compact step must be BITWISE
equal to the inline compact step (same code path, bit-equal plan arrays).
"""
import numpy as np
import jax
import jax.numpy as jnp

from test_model import as_jnp, tiny_cfg, tiny_batch

import robustpointclouds_tpu.models.voxelnet as vx
import robustpointclouds_tpu.nn.perturber as prt
from robustpointclouds_tpu.models.voxelnet import build_plan
from robustpointclouds_tpu.train import TrainConfig, Trainer


def _losses_and_grads(trainer, state, batch, plan=None):
    def loss_fn(params):
        total, (_, logs, _) = trainer._loss_fn(
            params, state.batch_stats, batch, jnp.float32(5),
            state.adversary_enabled, plan)
        return total, logs

    (total, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    return total, logs, grads


def test_compact_matches_padded_and_plan_bitwise():
    cfg = tiny_cfg(adversary=True)
    trainer = Trainer(model_cfg=cfg, train_cfg=TrainConfig())
    rng = np.random.RandomState(3)
    batch = as_jnp(tiny_batch(rng, B=2))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    # f32 adversary for the comparison: the equivalence claim is about the
    # compact FORMULATION (same multiset of rows); under the bf16 default
    # the reduction-order deltas amplify past the f32 tolerances
    saved = (vx.COMPACT_PERT, prt.PERT_BF16)
    try:
        prt.PERT_BF16 = False
        vx.COMPACT_PERT = False
        t0, logs0, g0 = jax.jit(
            lambda s, b: _losses_and_grads(trainer, s, b))(state, batch)
        vx.COMPACT_PERT = True
        t1, logs1, g1 = jax.jit(
            lambda s, b: _losses_and_grads(trainer, s, b))(state, batch)
        # same multiset of rows -> equal up to f32 reduction order
        assert np.allclose(float(t0), float(t1), rtol=1e-4, atol=1e-5), (
            float(t0), float(t1))
        assert sorted(logs0) == sorted(logs1)
        for k in logs0:
            assert np.allclose(float(logs0[k]), float(logs1[k]),
                               rtol=2e-4, atol=1e-5), (k, logs0[k], logs1[k])
        flat0 = jax.tree_util.tree_leaves(g0)
        flat1 = jax.tree_util.tree_leaves(g1)
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-3, atol=2e-5)

        # plan-fed compact == inline compact BITWISE (same code path; the
        # plan's slot_point/point_slot are bit-equal to the inline build)
        plan = jax.jit(lambda p, m: build_plan(p, m, cfg))(
            batch.points, batch.points_mask)
        t2, logs2, g2 = jax.jit(
            lambda s, b, pl: _losses_and_grads(trainer, s, b, pl))(
                state, batch, plan)
        assert float(t1) == float(t2), (float(t1), float(t2))
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            assert np.array_equal(np.asarray(a), np.asarray(b))
    finally:
        vx.COMPACT_PERT, prt.PERT_BF16 = saved


def test_slot_maps_are_a_bijection():
    from robustpointclouds_tpu.ops.voxelize import voxelize_batch

    cfg = tiny_cfg(adversary=False)
    rng = np.random.RandomState(7)
    batch = tiny_batch(rng, B=2)
    res = voxelize_batch(
        jnp.asarray(batch.points[..., :4]), jnp.asarray(batch.points_mask),
        cfg.voxelizer)
    V, T = cfg.voxelizer.max_voxels, cfg.voxelizer.max_points_per_voxel
    P = batch.points.shape[1]
    for b in range(2):
        sp = np.asarray(res.slot_point[b]).reshape(-1)  # [V*T] -> point or P
        ps = np.asarray(res.point_slot[b])              # [P] -> slot or V*T
        pm = np.asarray(res.point_mask[b]).reshape(-1)
        # every valid slot holds a real point and the maps invert each other
        assert np.array_equal(sp < P, pm)
        slots = np.nonzero(pm)[0]
        assert np.array_equal(ps[sp[slots]], slots)
        # every surviving point's slot points back at it
        pts = np.nonzero(ps < V * T)[0]
        assert np.array_equal(sp[ps[pts]], pts)
        # survivor count == valid slot count (bijection)
        assert len(pts) == len(slots)
