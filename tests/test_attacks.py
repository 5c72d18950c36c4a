"""White-box gradient attack (PGD/FGSM) baselines — eval/attacks.py.

Same overfit scene + trainer config as test_attack_quantified (identical
shapes/functions -> the persistent XLA cache shares every compile), then:
the PGD-attacked evaluation must lose AP like the learned attack does, the
perturbation must respect the physical envelope exactly, and padding rows
must stay untouched.
"""
import numpy as np
import jax
import jax.numpy as jnp

from test_model import as_jnp, tiny_cfg
from test_attack_quantified import separated_car_batch

from robustpointclouds_tpu.eval.attacks import make_plan_attack
from robustpointclouds_tpu.nn.perturber import _bound_profile
from robustpointclouds_tpu.train import TrainConfig, Trainer


def _overfit_trainer_and_state():
    cfg = tiny_cfg(adversary=True)
    cfg = cfg._replace(
        head=cfg.head._replace(
            pos_iou_thr=(0.25, 0.1, 0.1),
            neg_iou_thr=(0.15, 0.05, 0.05),
            min_pos_iou=(0.1, 0.05, 0.05),
        )
    )
    trainer = Trainer(model_cfg=cfg, train_cfg=TrainConfig(learning_rate=1e-4))
    rng = np.random.RandomState(5)
    batch = as_jnp(separated_car_batch(rng))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    def chunk(state, batch, epoch):
        def body(st, _):
            st2, logs = trainer._step_impl(st, batch, epoch)
            return st2, (logs["loss"], logs["num_pos"])

        return jax.lax.scan(body, state, None, length=100)

    run = jax.jit(chunk)
    epoch = jnp.float32(5)
    for _ in range(7):
        state, (losses, npos) = run(state, batch, epoch)
    assert np.isfinite(np.asarray(losses)).all()
    assert float(npos[-1]) >= 8, float(npos[-1])
    return trainer, state, batch


def test_pgd_attack_drops_ap_and_respects_envelope():
    from robustpointclouds_tpu.cli.common import run_evaluation

    trainer, state, batch = _overfit_trainer_and_state()

    # --- direct envelope checks on the attack itself -----------------------
    builder = trainer.make_plan_builder()
    plan = builder(np.asarray(batch.points), np.asarray(batch.points_mask))
    plan = jax.tree_util.tree_map(np.asarray, plan)
    attack_fn = make_plan_attack(trainer, steps=3)
    attacked = attack_fn(state.params, state.batch_stats, batch, plan)

    delta = np.asarray(attacked["voxels"]) - np.asarray(plan["voxels"])
    bound = float(trainer.model_cfg.adversary["sensor_error_bound"])
    _, clamp = _bound_profile(delta.shape[-1], bound, attack=True)
    assert (np.abs(delta) <= clamp[None, None, None, :] + 1e-5).all()
    pm = np.asarray(plan["point_mask"]).astype(bool)
    assert np.abs(delta[~pm]).max() == 0.0  # padding rows untouched
    assert np.abs(delta[pm]).max() > 0.0  # and the attack actually moved

    # PGD maximizes the detection loss: the attacked forward must score the
    # GT worse than the clean one (loss strictly up on an overfit model)
    from robustpointclouds_tpu.models.detection import anchor_head_loss

    def det_loss(pl):
        outs = trainer.forward_eval(state, batch, attack=False, plan=pl)
        det = anchor_head_loss(
            outs.cls_scores, outs.bbox_preds, outs.dir_preds,
            trainer.anchors, trainer.anchor_cls,
            batch.gt_boxes, batch.gt_labels, batch.gt_mask,
            trainer.model_cfg.head,
        )
        return float(det["loss_cls"] + det["loss_bbox"] + det["loss_dir"])

    clean_loss, attacked_loss = det_loss(plan), det_loss(attacked)
    assert attacked_loss > clean_loss * 1.5, (clean_loss, attacked_loss)

    # --- end-to-end: AP under PGD through the real eval path ---------------
    clean = run_evaluation(trainer, state, iter([batch]), attack=False)
    pgd = run_evaluation(
        trainer, state, iter([batch]), attack=True, attack_method="pgd",
        attack_steps=10,
    )
    car = "Car_3d_moderate"
    # >= 3 matched GTs (5.0 = the 3-match recall quantum; was 7.5/4-match
    # under the f32 adversary — see test_attack_quantified for the note)
    assert clean[car] >= 5.0 - 1e-6, (clean[car], pgd[car])
    drop = clean[car] - pgd[car]
    assert drop >= 2.5 - 1e-6, (clean[car], pgd[car])

    # FGSM (1 signed step to the boundary) runs through the same path
    fgsm = run_evaluation(
        trainer, state, iter([batch]), attack=True, attack_method="fgsm",
    )
    assert np.isfinite(fgsm[car])


def test_pgd_adversarial_training():
    """PGD-AT (TrainConfig.pgd_steps): the step attacks the plan in-step —
    same params see a strictly harder batch — and the detector still learns
    on the attacked input."""
    import pytest

    cfg = tiny_cfg(adversary=False)
    cfg = cfg._replace(
        head=cfg.head._replace(
            pos_iou_thr=(0.25, 0.1, 0.1),
            neg_iou_thr=(0.15, 0.05, 0.05),
            min_pos_iou=(0.1, 0.05, 0.05),
        )
    )
    at = Trainer(model_cfg=cfg,
                 train_cfg=TrainConfig(learning_rate=1e-4, pgd_steps=2))
    plain = Trainer(model_cfg=cfg, train_cfg=TrainConfig(learning_rate=1e-4))
    rng = np.random.RandomState(5)
    batch = as_jnp(separated_car_batch(rng))
    state = at.init_state(jax.random.PRNGKey(0), batch)

    builder = at.make_plan_builder()
    plan = builder(
        np.asarray(batch.points), np.asarray(batch.points_mask),
        np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
        np.asarray(batch.gt_mask),
    )
    plan = jax.tree_util.tree_map(jnp.asarray, plan)

    # plan-fed is REQUIRED for PGD-AT
    with pytest.raises(ValueError, match="plan"):
        at._step_impl(state, batch, jnp.float32(5), None)

    # at identical params, the attacked step sees a strictly higher loss
    _, logs_at = jax.jit(at._step_impl)(state, batch, jnp.float32(5), plan)
    _, logs_pl = jax.jit(plain._step_impl)(state, batch, jnp.float32(5), plan)
    assert float(logs_at["loss"]) > float(logs_pl["loss"]), (
        float(logs_at["loss"]), float(logs_pl["loss"]))

    # and training on the attacked input converges (robust overfit)
    def chunk(state, batch, plan):
        def body(st, _):
            st2, logs = at._step_impl(st, batch, jnp.float32(5), plan)
            return st2, logs["loss"]

        return jax.lax.scan(body, state, None, length=100)

    run = jax.jit(chunk)
    state, first = run(state, batch, plan)
    for _ in range(2):
        state, losses = run(state, batch, plan)
    assert np.isfinite(np.asarray(losses)).all()
    # PGD-AT converges against a moving target with an irreducible floor
    # (the attacker can always displace points +-1 m = 2 voxel cells on this
    # tiny grid), so demand steady learning, not collapse: measured 0.54x
    # after 300 steps
    assert float(np.mean(np.asarray(losses))) < 0.7 * float(
        np.mean(np.asarray(first))
    ), (float(np.mean(np.asarray(first))), float(np.mean(np.asarray(losses))))


def test_pgd_at_improves_robustness():
    """The point of adversarial training, measured: a PGD-AT model must be
    strictly more robust under the SAME PGD-10 attack than a clean-trained
    model of identical architecture/budget. (The reference never tests this
    — its scripts only measure attack effectiveness.) Heavy tier."""
    import os
    import pytest

    if not os.environ.get("RPC_HEAVY_TESTS"):
        pytest.skip("heavy tier (RPC_HEAVY_TESTS=1)")

    from robustpointclouds_tpu.models.detection import anchor_head_loss

    cfg = tiny_cfg(adversary=False)
    cfg = cfg._replace(
        head=cfg.head._replace(
            pos_iou_thr=(0.25, 0.1, 0.1),
            neg_iou_thr=(0.15, 0.05, 0.05),
            min_pos_iou=(0.1, 0.05, 0.05),
        )
    )
    rng = np.random.RandomState(5)
    batch = as_jnp(separated_car_batch(rng))

    def train(train_cfg, seed):
        tr = Trainer(model_cfg=cfg, train_cfg=train_cfg)
        st = tr.init_state(jax.random.PRNGKey(seed), batch)
        builder = tr.make_plan_builder()
        plan = builder(
            np.asarray(batch.points), np.asarray(batch.points_mask),
            np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
            np.asarray(batch.gt_mask),
        )
        plan = jax.tree_util.tree_map(jnp.asarray, plan)

        def chunk(st, batch, plan):
            def body(s, _):
                s2, logs = tr._step_impl(s, batch, jnp.float32(5), plan)
                return s2, logs["loss"]

            return jax.lax.scan(body, st, None, length=100)

        run = jax.jit(chunk)
        for _ in range(5):
            st, losses = run(st, batch, plan)
        assert np.isfinite(np.asarray(losses)).all()
        return tr, st, plan

    clean_tr, clean_st, plan = train(TrainConfig(learning_rate=1e-4), 0)
    at_tr, at_st, _ = train(TrainConfig(learning_rate=1e-4, pgd_steps=2), 0)

    def det_loss(tr, st, pl):
        outs = tr.forward_eval(st, batch, attack=False, plan=pl)
        det = anchor_head_loss(
            outs.cls_scores, outs.bbox_preds, outs.dir_preds,
            tr.anchors, tr.anchor_cls,
            batch.gt_boxes, batch.gt_labels, batch.gt_mask, cfg.head,
        )
        return float(det["loss_cls"] + det["loss_bbox"] + det["loss_dir"])

    attack10 = make_plan_attack(clean_tr, steps=10)
    clean_attacked = det_loss(
        clean_tr, clean_st,
        attack10(clean_st.params, clean_st.batch_stats, batch, plan),
    )
    at_attacked = det_loss(
        at_tr, at_st,
        attack10(at_st.params, at_st.batch_stats, batch, plan),
    )
    # the AT model must hold up materially better under its own white-box
    # attack than the undefended model does under its
    assert at_attacked < 0.7 * clean_attacked, (at_attacked, clean_attacked)


def test_pgd_steps_rejected_by_non_anchor_trainers():
    """pgd_steps on a trainer family that does not implement PGD-AT must
    fail loudly, not silently train clean."""
    import pytest

    from robustpointclouds_tpu.train.centerpoint_loop import CenterPointTrainer
    from robustpointclouds_tpu.train.strong_loop import StrongTrainer

    with pytest.raises(NotImplementedError, match="pgd"):
        CenterPointTrainer(train_cfg=TrainConfig(pgd_steps=2))
    with pytest.raises(NotImplementedError, match="pgd"):
        StrongTrainer(train_cfg=TrainConfig(pgd_steps=2))
