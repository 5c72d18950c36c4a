"""Host-side training hooks: the NaN escalation ladder and epoch tracking.

Functional port of the reference's failure-detection subsystem
(custom_hook.py:77-151 `NaNDetectionHook` + the perturber's weight-reset,
voxel_perturber.py:477-497), re-shaped for a jit train loop: per-step NaN
zeroing and counting happen ON DEVICE inside the compiled step (train/loop.py);
this ladder runs at logging boundaries on the host and mutates coarse state
(LR scale, adversary kill switch, weight re-init) that feeds back into the
step as traced scalars — no recompilation, no per-step host sync.

Escalation (reference thresholds):
  * >= max_nan_count NaN steps  -> LR x0.1 (once) + adversary weight reset
  * > 100 total NaN steps       -> disable adversarial training
  * >= 50 consecutive NaN steps -> stop training
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class NaNLadder:
    max_nan_count: int = 10
    stop_after_consecutive: int = 50
    disable_adversary_after_total: int = 100
    lr_reduced: bool = False
    should_stop: bool = False
    _last_total: int = 0
    _soft_count: int = 0

    def update(self, state, adversary_reinit_fn: Optional[callable] = None):
        """Inspect on-device counters; return a (possibly) modified state.

        Call at logging boundaries. `adversary_reinit_fn(params) -> params`
        re-initializes adversary weights (the reference's
        `_reset_problematic_weights`).
        """
        total = int(state.nan_count)
        consecutive = int(state.consecutive_nan)
        new_nans = total - self._last_total
        self._last_total = total
        # mimic the reference's gradual decay of the soft counter on stable runs
        self._soft_count = max(0, self._soft_count - 1) if new_nans == 0 else (
            self._soft_count + new_nans
        )

        if consecutive >= self.stop_after_consecutive:
            self.should_stop = True
            return state

        if self._soft_count >= self.max_nan_count and not self.lr_reduced:
            self.lr_reduced = True
            self._soft_count = 0
            state = state._replace(lr_scale=state.lr_scale * 0.1)
            if adversary_reinit_fn is not None:
                state = state._replace(params=adversary_reinit_fn(state.params))

        if total > self.disable_adversary_after_total:
            state = state._replace(adversary_enabled=jnp.float32(0.0))
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
