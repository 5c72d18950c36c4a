"""Shared NN building blocks: mask-aware statistics and batch norm.

Sparse voxel tensors are padded to static shapes, so every normalization has
to ignore padding rows — the reference gets this implicitly from dynamic
shapes (BN1d over `[num_valid, C]`, e.g. models/adversarial/voxel_perturber.py:85),
we get it explicitly from masks.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=0, keepdims: bool = True):
    """Mean of x over `axis` counting only mask=True rows. mask broadcasts."""
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    total = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    count = jnp.maximum(jnp.sum(m, axis=axis, keepdims=keepdims), 1.0)
    return total / count


def masked_std(x: jnp.ndarray, mask: jnp.ndarray, axis=0, keepdims: bool = True, eps: float = 1e-6):
    mu = masked_mean(x, mask, axis, keepdims=True)
    var = masked_mean((x - mu) ** 2, mask, axis, keepdims=True)
    if not keepdims:
        var = jnp.squeeze(var, axis)
    return jnp.sqrt(var + eps)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the row axis of [N, C] with a validity mask.

    Matches torch BN1d semantics on the *valid* rows: batch statistics in
    training (running stats updated with `momentum`), running stats in eval.
    Padding rows are normalized too (harmless — downstream masks them) but
    never contribute to statistics.
    """

    momentum: float = 0.9
    eps: float = 1e-3
    # compute/output dtype; statistics, running stats, and params are always
    # f32 regardless (bf16 means/vars drift badly over long runs)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))

        xs = x.astype(jnp.float32)
        if train:
            mu = masked_mean(xs, mask, axis=0, keepdims=False)
            var = masked_mean((xs - mu[None, :]) ** 2, mask, axis=0, keepdims=False)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mu
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mu, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var[None, :] + self.eps)
        y = (xs - mu[None, :]) * inv
        return (y * scale[None, :] + bias[None, :]).astype(self.dtype)
