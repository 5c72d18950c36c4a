import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.data import synthetic_kitti_batch
from robustpointclouds_tpu.data.structures import PointCloudBatch
from robustpointclouds_tpu.train import NaNLadder, TrainConfig, Trainer
from robustpointclouds_tpu.train.hooks import device_nan_ladder, reinit_adversary_params
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

    def test_lr_reduction_on_device_exactly_once(self):
        # crossing 10 total NaNs reduces LR x0.1, exactly once
        lr, en = jnp.float32(1.0), jnp.float32(1.0)
        total = jnp.int32(9)
        total, lr, en = device_nan_ladder(total, jnp.int32(1), lr, en)
        assert float(lr) == pytest.approx(0.1)
        total, lr, en = device_nan_ladder(total, jnp.int32(1), lr, en)
        assert float(lr) == pytest.approx(0.1)  # not reduced again
        assert float(en) == 1.0

    def test_adversary_kill_switch_on_device(self):
        _, lr, en = device_nan_ladder(
            jnp.int32(100), jnp.int32(1), jnp.float32(0.1), jnp.float32(1.0)
        )
        assert float(en) == 0.0

    def test_stop_on_consecutive(self):
        ladder = NaNLadder()
        state = self._mk_state(consecutive=60)
        ladder.update(state)
        assert ladder.should_stop

    def test_host_reinit_once(self):
        ladder = NaNLadder(max_nan_count=10)
        state = self._mk_state(nan_count=12)
        calls = []

        def reinit(params):
            calls.append(1)
            return params

        state = ladder.update(state, adversary_reinit_fn=reinit)
        state = ladder.update(state, adversary_reinit_fn=reinit)
        assert len(calls) == 1

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


class TestNaNRecovery:
    """A NaN batch must leave params/opt-state clean and training must recover
    (VERDICT round-1 / ADVICE: 0*NaN=NaN in the VJP poisoned Adam forever)."""

    def test_nan_batch_freezes_then_recovers(self):
        tr = make_trainer()
        rng = np.random.RandomState(0)
        good = as_jnp(tiny_batch(rng))
        state = tr.init_state(jax.random.PRNGKey(0), good)

        bad_np = tiny_batch(rng)
        pts = np.array(bad_np.points)
        pts[0, :8, :3] = np.nan  # NaN points inside the mask -> NaN loss
        bad = as_jnp(bad_np._replace(points=jnp.asarray(pts)))

        p_before = jax.tree_util.tree_leaves(state.params)[0]
        state, logs = tr.train_step(state, bad, epoch=5)
        assert int(state.nan_count) == 1
        # params unchanged by the NaN step
        np.testing.assert_allclose(
            np.asarray(p_before),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        )
        # all params still finite
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert bool(jnp.all(jnp.isfinite(leaf)))

        # a following good step still learns: params move and stay finite
        state, logs = tr.train_step(state, good, epoch=5)
        assert bool(jnp.isfinite(logs["loss"]))
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert bool(jnp.all(jnp.isfinite(leaf)))
        assert not np.allclose(
            np.asarray(p_before),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        )


class TestAdversarialLossWeight:
    """adversarial_loss_weight must scale the adversary's det-loss gradient
    (reference freeze mode sets 0.5, train_kitti_3class_adversarial.py:208)."""

    def test_grl_scale_linear_in_weight(self, monkeypatch):
        # f32 adversary: this verifies the GRL weight ALGEBRA
        # (grad(w) = w*g_det + g_direct), which is dtype-independent; the
        # bf16-default MLP's rounding breaks the difference-of-differences
        # identity at the 1e-3 tolerance without invalidating the algebra
        import robustpointclouds_tpu.nn.perturber as prt
        monkeypatch.setattr(prt, "PERT_BF16", False)
        rng = np.random.RandomState(0)
        batch = as_jnp(tiny_batch(rng))

        def adv_grads(w):
            tr = Trainer(
                model_cfg=tiny_cfg(),
                train_cfg=TrainConfig(adversarial_loss_weight=w),
            )
            state = tr.init_state(jax.random.PRNGKey(0), batch)
            g = jax.grad(tr._loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch,
                jnp.float32(5.0), jnp.float32(1.0),
            )[0]
            return np.asarray(g["adversary"]["mlp_0"]["kernel"])

        g1, g05, g0 = adv_grads(1.0), adv_grads(0.5), adv_grads(0.0)
        # grad(w) = w * g_det + g_direct  ->  g1 - g05 == g05 - g0
        np.testing.assert_allclose(g1 - g05, g05 - g0, rtol=1e-3, atol=1e-6)
        # and the det-loss component is actually nonzero
        assert np.abs(g1 - g0).max() > 0
