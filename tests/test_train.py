import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.data import synthetic_kitti_batch
from robustpointclouds_tpu.data.structures import PointCloudBatch
from robustpointclouds_tpu.train import NaNLadder, TrainConfig, Trainer
from robustpointclouds_tpu.train.hooks import reinit_adversary_params
from robustpointclouds_tpu.train.loop import split_adversary_mask

from test_model import tiny_batch, tiny_cfg


def as_jnp(b):
    return PointCloudBatch(*(jnp.asarray(x) for x in b))


def make_trainer():
    # donate=False: tests reuse the same TrainState across calls
    return Trainer(
        model_cfg=tiny_cfg(),
        train_cfg=TrainConfig(warmup_iters=5, max_epochs=2, steps_per_epoch=4),
    ).compile(donate=False)


class TestTrainStep:
    def test_losses_decrease_detector_params_move(self):
        tr = make_trainer()
        rng = np.random.RandomState(0)
        batch = as_jnp(tiny_batch(rng))
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        p0 = np.asarray(state.params["middle_encoder"]["conv_input"]["kernel"]).copy()
        logs = None
        for step in range(3):
            state, logs = tr.train_step(state, batch, epoch=0)
        assert int(state.step) == 3
        assert np.isfinite(float(logs["loss"]))
        p1 = np.asarray(state.params["middle_encoder"]["conv_input"]["kernel"])
        assert not np.allclose(p0, p1)

    def test_adversary_params_update_only_after_gate(self):
        tr = make_trainer()
        batch = as_jnp(tiny_batch(np.random.RandomState(0)))
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        adv0 = np.asarray(state.params["adversary"]["mlp_0"]["kernel"])

        # epoch 0: gate closed -> detector-loss grads to adversary are zero,
        # but its own aux terms (computed pre-gate... gated too) keep it still
        state1, logs = tr.train_step(state, batch, epoch=0)
        adv1 = np.asarray(state1.params["adversary"]["mlp_0"]["kernel"])
        np.testing.assert_allclose(adv0, adv1, atol=1e-7)

        # epoch 5: gate open -> adversary moves
        state2, logs = tr.train_step(state, batch, epoch=5)
        adv2 = np.asarray(state2.params["adversary"]["mlp_0"]["kernel"])
        assert not np.allclose(adv0, adv2)
        assert float(logs["perturbation_l2_norm"]) > 0

    def test_min_max_gradient_signs(self):
        """The same detection-loss gradient must flow with opposite effective
        sign into detector vs adversary params (gradient-reversal check)."""
        tr = make_trainer()
        batch = as_jnp(tiny_batch(np.random.RandomState(1)))
        state = tr.init_state(jax.random.PRNGKey(0), batch)

        grads, (_, logs, _) = jax.grad(tr._loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, jnp.float32(5.0), jnp.float32(1.0)
        )
        mask = split_adversary_mask(state.params)
        adv_norm = 0.0
        det_norm = 0.0
        for g, m in zip(jax.tree_util.tree_leaves(grads), jax.tree_util.tree_leaves(mask)):
            n = float(jnp.sum(jnp.abs(g)))
            if m:
                adv_norm += n
            else:
                det_norm += n
        assert adv_norm > 0, "adversary receives gradients"
        assert det_norm > 0, "detector receives gradients"

    def test_nan_batch_freezes_update(self):
        tr = make_trainer()
        batch = as_jnp(tiny_batch(np.random.RandomState(0)))
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        bad = batch._replace(points=batch.points.at[0, 0, 0].set(jnp.nan))
        state1, logs = tr.train_step(state, bad, epoch=5)
        # NaN flows into losses -> step counted, params frozen
        if not np.isfinite(float(logs["loss"])) or int(state1.nan_count) > 0:
            p0 = jax.tree_util.tree_leaves(state.params)[0]
            p1 = jax.tree_util.tree_leaves(state1.params)[0]
            np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))


class TestNaNLadder:
    def _mk_state(self, nan_count=0, consecutive=0):
        import collections
        tr = make_trainer()
        batch = as_jnp(tiny_batch(np.random.RandomState(0)))
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        return state._replace(
            nan_count=jnp.int32(nan_count), consecutive_nan=jnp.int32(consecutive)
        )

    def test_lr_reduction(self):
        ladder = NaNLadder(max_nan_count=10)
        state = self._mk_state(nan_count=12)
        state = ladder.update(state)
        assert float(state.lr_scale) == pytest.approx(0.1)
        assert ladder.lr_reduced

    def test_stop_on_consecutive(self):
        ladder = NaNLadder()
        state = self._mk_state(consecutive=60)
        ladder.update(state)
        assert ladder.should_stop

    def test_adversary_kill_switch(self):
        ladder = NaNLadder()
        state = self._mk_state(nan_count=150)
        state = ladder.update(state)
        assert float(state.adversary_enabled) == 0.0

    def test_reinit_adversary(self):
        state = self._mk_state()
        before = np.asarray(state.params["adversary"]["mlp_0"]["kernel"])
        params = reinit_adversary_params(state.params, jax.random.PRNGKey(7))
        after = np.asarray(params["adversary"]["mlp_0"]["kernel"])
        assert not np.allclose(before, after)
        # detector untouched
        np.testing.assert_allclose(
            np.asarray(state.params["middle_encoder"]["conv_input"]["kernel"]),
            np.asarray(params["middle_encoder"]["conv_input"]["kernel"]),
        )
