"""Failure-detection hooks: the NaN escalation ladder and adversary recovery.

Functional port of the reference's failure-detection subsystem
(custom_hook.py:77-151 `NaNDetectionHook` + the perturber's weight-reset,
voxel_perturber.py:477-497), re-shaped for a jit train loop. The reference
checks every iteration on the host; here the *exact per-iteration* mitigations
are traced arithmetic INSIDE the compiled step (`device_nan_ladder`, called
from train/loop.py):

  * every NaN step contributes a zero parameter update (loss zeroed, grads
    sanitized, update scaled by 0);
  * LR x0.1 exactly once when total NaN steps crosses `max_nan_count` (10);
  * adversarial training disabled once total exceeds 100.

Only the actions a compiled step cannot take stay on the host (`NaNLadder`,
consulted at logging boundaries): re-initializing the adversary's weights
(needs fresh rng + init functions) and stopping the run after 50 consecutive
NaN steps. The stop can lag by up to one logging interval, but every lagged
step was already a frozen no-op update on device, so nothing corrupts.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def device_nan_ladder(
    nan_count: jnp.ndarray,
    nan_step: jnp.ndarray,
    lr_scale: jnp.ndarray,
    adversary_enabled: jnp.ndarray,
    max_nan_count: int = 10,
    disable_adversary_after_total: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-iteration NaN mitigations as traced ops (reference custom_hook.py:119-142).

    Args:
        nan_count: total NaN steps so far (before this step), int32.
        nan_step: 1 if this step's loss was NaN/Inf else 0, int32.
        lr_scale: current ladder LR multiplier.
        adversary_enabled: 1.0/0.0 kill switch.
    Returns:
        (new_total, new_lr_scale, new_adversary_enabled).
    """
    new_total = nan_count + nan_step
    crossed = (nan_count < max_nan_count) & (new_total >= max_nan_count)
    new_lr_scale = jnp.where(crossed, lr_scale * 0.1, lr_scale)
    new_enabled = adversary_enabled * (
        new_total <= disable_adversary_after_total
    ).astype(jnp.float32)
    return new_total, new_lr_scale, new_enabled


@dataclasses.dataclass
class NaNLadder:
    """Host-side remainder of the ladder: adversary re-init + hard stop."""

    max_nan_count: int = 10
    stop_after_consecutive: int = 50
    should_stop: bool = False
    reinit_done: bool = False

    def update(self, state, adversary_reinit_fn: Optional[callable] = None):
        """Inspect on-device counters; return a (possibly) modified state.

        Call at logging boundaries. `adversary_reinit_fn(params) -> params`
        re-initializes adversary weights (the reference's
        `_reset_problematic_weights`, voxel_perturber.py:477-497).
        """
        total = int(state.nan_count)
        consecutive = int(state.consecutive_nan)

        if consecutive >= self.stop_after_consecutive:
            self.should_stop = True
            return state

        if total >= self.max_nan_count and not self.reinit_done:
            self.reinit_done = True
            if adversary_reinit_fn is not None:
                state = state._replace(params=adversary_reinit_fn(state.params))
        return state


def reinit_adversary_params(params, rng: jax.Array):
    """Fresh random weights for the 'adversary' subtree (NaN recovery)."""
    leaves_with_path = jax.tree_util.tree_flatten_with_path(params)[0]

    def fresh(path, leaf):
        in_adv = any(getattr(k, "key", None) == "adversary" for k in path)
        if not in_adv:
            return leaf
        key = jax.random.fold_in(rng, hash(jax.tree_util.keystr(path)) % (2**31))
        if leaf.ndim >= 2:
            return jax.nn.initializers.xavier_uniform()(key, leaf.shape, leaf.dtype) * 0.001
        return jnp.zeros_like(leaf)

    return jax.tree_util.tree_map_with_path(fresh, params)
