"""End-to-end attack effectiveness: the reference's core claim, heavy form.

Train the tiny adversarial model to overfit one batch with PER-DISPATCH
steps (the production train_step path, vs the fused-scan form the default
tier uses in test_attack_quantified.py), then measure clean vs attack-mode
AP on that same batch (the evaluate_kitti_adversarial_attack scenario:
eval-profile bounds are ~10-25x the training envelope,
voxel_perturber.py:215-238).

Scene: the same deterministic separated-car grid as the default tier —
under the devkit-exact R40 metric k matched GTs read AP (k-1)/40*100, so
randomly placed (colliding) synthetic GTs would read AP 0 no matter how
well the model trained.

Heavy tier (hundreds of per-dispatch steps): RPC_HEAVY_TESTS=1.
"""
import os

import numpy as np
import pytest

if not os.environ.get("RPC_HEAVY_TESTS"):
    pytest.skip("heavy tier (RPC_HEAVY_TESTS=1)", allow_module_level=True)

import jax
import jax.numpy as jnp

from test_model import as_jnp, tiny_cfg
from test_attack_quantified import separated_car_batch


def test_attack_degrades_overfit_model():
    from robustpointclouds_tpu.cli.common import run_evaluation
    from robustpointclouds_tpu.train import TrainConfig, Trainer

    cfg = tiny_cfg(adversary=True)
    cfg = cfg._replace(
        head=cfg.head._replace(
            pos_iou_thr=(0.25, 0.1, 0.1),
            neg_iou_thr=(0.15, 0.05, 0.05),
            min_pos_iou=(0.1, 0.05, 0.05),
        )
    )
    trainer = Trainer(
        model_cfg=cfg,
        train_cfg=TrainConfig(learning_rate=1e-4),
    )
    rng = np.random.RandomState(5)
    batch = as_jnp(separated_car_batch(rng))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer.compile(donate=False)
    # past the epoch-3 gate so the adversary trains too
    for step in range(700):
        state, logs = trainer.train_step(state, batch, epoch=5)
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["num_pos"]) >= 8, float(logs["num_pos"])

    # freeze-detector phase (reference --freeze-detector: detector lr off,
    # adversary lr x20) — strengthens the attacker decisively; the frozen
    # detector keeps clean AP bit-identical
    frz = Trainer(
        model_cfg=cfg,
        train_cfg=TrainConfig(
            learning_rate=1e-4, freeze_detector=True, adversary_lr_mult=20.0,
            adversarial_loss_weight=0.5, regularization_weight=1e-5,
        ),
    )
    fstate = frz.init_state(jax.random.PRNGKey(1), batch)
    fstate = fstate._replace(params=state.params, batch_stats=state.batch_stats)
    frz.compile(donate=False)
    for step in range(500):
        fstate, flogs = frz.train_step(fstate, batch, epoch=5)
    assert np.isfinite(float(flogs["loss"]))

    # the freeze phase still updates BN running stats from perturbed
    # forwards; restore phase-1 stats so the CLEAN detector is exactly the
    # overfit one (params were frozen by lr 0)
    fstate = fstate._replace(batch_stats=state.batch_stats)

    clean = run_evaluation(frz, fstate, iter([batch]), attack=False)
    attacked = run_evaluation(frz, fstate, iter([batch]), attack=True)

    car = "Car_3d_moderate"
    # >= 4 matched of the 12 cars (2.5-pt small-sample quanta)
    assert clean[car] >= 7.5 - 1e-6, (clean[car], attacked[car])
    drop = clean[car] - attacked[car]
    # the reference's stated intent is a 15-25% mAP drop under attack
    # (adversarial-second_...-3class.py:70-76); require at least the low end
    # of that band relative AND one full recall quantum absolute
    assert drop / max(clean[car], 1e-9) >= 0.15, (clean[car], attacked[car])
    assert drop >= 2.5 - 1e-6, (clean[car], attacked[car])
