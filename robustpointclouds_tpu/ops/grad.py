"""Gradient-surgery primitives for single-backward min-max training."""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def grad_scale(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Identity in the forward pass; scales the cotangent by `scale` in the
    backward pass (scale = -1 gives the classic gradient-reversal layer).

    Used on the adversary's perturbation delta so that ONE backward pass
    yields both sides of the min-max: the detector's parameters never flow
    through the delta, so reversing its gradient flips only the adversary's
    view of the detection loss (SURVEY.md §2d.1 — the clean equivalent of the
    reference's single-optimizer sign trick).
    """
    return x


def _fwd(x, scale):
    return x, scale


def _bwd(scale, g):
    return (g * scale, None)


grad_scale.defvjp(_fwd, _bwd)
