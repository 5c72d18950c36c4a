import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.data.structures import PointCloudBatch
from robustpointclouds_tpu.models.strong import StrongVoxelNetConfig
from robustpointclouds_tpu.train import TrainConfig
from robustpointclouds_tpu.train.strong_loop import StrongTrainer

from test_model import tiny_batch, tiny_cfg


def as_jnp(b):
    return PointCloudBatch(*(jnp.asarray(x) for x in b))


def make_strong_trainer():
    model_cfg = StrongVoxelNetConfig(
        base=tiny_cfg(adversary=False),
        perturber={"sensor_error_bound": 0.18, "hidden_channels": (16, 32),
                   "dropout_rate": 0.1},
        anti_adaptation_prob=0.5,
    )
    return StrongTrainer(
        model_cfg=model_cfg,
        train_cfg=TrainConfig(warmup_iters=5, max_epochs=2, steps_per_epoch=4),
    ).compile(donate=False)


class TestStrongTrainer:
    def test_step_and_momentum_carry(self):
        tr = make_strong_trainer()
        batch = as_jnp(tiny_batch(np.random.RandomState(0)))
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        assert float(jnp.abs(state.momentum).sum()) == 0.0
        state1, logs = tr.train_step(state, batch)
        assert np.isfinite(float(logs["loss"]))
        # momentum buffer now carries this step's perturbations
        assert float(jnp.abs(state1.momentum).sum()) > 0.0
        state2, logs2 = tr.train_step(state1, batch)
        assert int(state2.step) == 2

    def test_dynamic_scaling_updates(self):
        tr = make_strong_trainer()
        batch = as_jnp(tiny_batch(np.random.RandomState(0)))
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        s0 = float(state.scale_factor)
        state = tr.update_dynamic_scaling(state, epoch=10)
        assert float(state.scale_factor) > s0 * 1.5  # epoch growth ~2x

    def test_scale_capped(self):
        tr = make_strong_trainer()
        batch = as_jnp(tiny_batch(np.random.RandomState(0)))
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        state = tr.update_dynamic_scaling(state, epoch=100)
        # cap applies before the multiplicative jitter (reference
        # strong_voxel_perturber.py:248-254), so allow the jitter band
        assert float(state.scale_factor) <= tr.model_cfg.max_scaling * 1.2

    def test_reset_momentum(self):
        tr = make_strong_trainer()
        batch = as_jnp(tiny_batch(np.random.RandomState(0)))
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        state, _ = tr.train_step(state, batch)
        state = tr.reset_momentum(state)
        assert float(jnp.abs(state.momentum).sum()) == 0.0


class TestProgressMonitor:
    def test_retention_verdict(self, tmp_path):
        from robustpointclouds_tpu.cli.train_kitti_adversarial_strong import (
            AdversarialProgressMonitor,
        )

        m = AdversarialProgressMonitor()
        for i in range(20):
            m.record(0, i, {"loss_adversarial": -5.0, "loss_cls": 1.0,
                            "perturbation_l2_norm": 0.1, "attack_scale": 1.0})
        assert m.strength_retention() == pytest.approx(1.0)
        assert "SUCCESSFUL" in m.verdict()
        m.save(str(tmp_path))
        assert (tmp_path / "adversarial_progress.json").exists()

    def test_weakened_attack_detected(self):
        from robustpointclouds_tpu.cli.train_kitti_adversarial_strong import (
            AdversarialProgressMonitor,
        )

        m = AdversarialProgressMonitor()
        for i in range(10):
            m.record(0, i, {"loss_adversarial": -10.0})
        for i in range(10):
            m.record(1, i, {"loss_adversarial": -1.0})
        assert m.strength_retention() < 0.8
        assert "WEAKENED" in m.verdict()


class TestStrongPlan:
    def test_plan_step_bitwise_equal(self):
        """Host-plan-fed strong step == inline step (same rngs, same state)."""
        tr = make_strong_trainer()
        batch = as_jnp(tiny_batch(np.random.RandomState(9)))
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        plan = tr.make_plan_builder()(
            np.asarray(batch.points), np.asarray(batch.points_mask),
            np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
            np.asarray(batch.gt_mask),
        )
        sa, la = jax.jit(tr._step_impl)(state, batch)
        sb, lb = jax.jit(tr._step_impl)(state, batch, plan)
        for k in la:
            assert bool(jnp.all(la[k] == lb[k])), k
        eq = jax.tree_util.tree_map(lambda x, y: bool(jnp.all(x == y)),
                                    sa.params, sb.params)
        assert all(jax.tree_util.tree_leaves(eq))
        assert bool(jnp.all(sa.momentum == sb.momentum))
