"""End-to-end attack effectiveness: the reference's core claim.

Train the tiny adversarial model to overfit one batch, then measure clean vs
attack-mode AP on that same batch (the evaluate_kitti_adversarial_attack
scenario: eval-profile bounds are ~10-25x the training envelope,
voxel_perturber.py:215-238). The attack must not IMPROVE detection, and on
an overfit model it should measurably degrade it.

Heavy tier (hundreds of fused steps): RPC_HEAVY_TESTS=1.
"""
import os

import numpy as np
import pytest

if not os.environ.get("RPC_HEAVY_TESTS"):
    pytest.skip("heavy tier (RPC_HEAVY_TESTS=1)", allow_module_level=True)

import jax
import jax.numpy as jnp

from test_model import as_jnp, tiny_batch, tiny_cfg


def test_attack_degrades_overfit_model():
    from robustpointclouds_tpu.cli.common import run_evaluation
    from robustpointclouds_tpu.train import TrainConfig, Trainer

    trainer = Trainer(
        model_cfg=tiny_cfg(adversary=True),
        train_cfg=TrainConfig(learning_rate=1e-4),
    )
    rng = np.random.RandomState(5)
    batch = as_jnp(tiny_batch(rng, B=2))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer.compile(donate=False)
    # past the epoch-3 gate so the adversary trains too
    for step in range(700):
        state, logs = trainer.train_step(state, batch, epoch=5)
    assert np.isfinite(float(logs["loss"]))

    clean = run_evaluation(trainer, state, iter([batch]), attack=False)
    attacked = run_evaluation(trainer, state, iter([batch]), attack=True)

    # compare on the best-detected class: the tiny config's 4 m anchor
    # stride starves some classes of positive anchors (verify-skill note),
    # so the mean over classes is not the right overfit signal. Devkit R40
    # small-sample AP steps in 2.5-point quanta (one matched GT).
    keys = [k for k in clean if k.endswith("_3d_moderate") and k != "mAP_3d_moderate"]
    best = max(keys, key=lambda k: clean[k])
    assert clean[best] >= 2.5 - 1e-6, clean
    # the reference's stated intent is a 15-25% mAP drop under attack
    # (adversarial-second_...-3class.py:70-76); require at least the low end
    # of that band relative AND one full matched GT absolute
    drop = clean[best] - attacked[best]
    assert drop / max(clean[best], 1e-9) >= 0.15, (best, clean[best], attacked[best])
    assert drop >= 2.5 - 1e-6, (best, clean[best], attacked[best])
