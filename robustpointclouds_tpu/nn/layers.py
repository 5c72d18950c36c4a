"""Shared NN building blocks: mask-aware statistics and batch norm.

Sparse voxel tensors are padded to static shapes, so every normalization has
to ignore padding rows — the reference gets this implicitly from dynamic
shapes (BN1d over `[num_valid, C]`, e.g. models/adversarial/voxel_perturber.py:85),
we get it explicitly from masks.
"""
from __future__ import annotations

import os as _os

import flax.linen as nn
import jax
import jax.numpy as jnp

# A/B gate: when the module's compute dtype is bf16, read the activations in
# bf16 for the batch statistics and let the REDUCTION accumulate in f32
# (jnp.sum dtype=f32), instead of materializing an f32 copy of the whole
# [N, C] tensor first. Statistics, running stats and params stay f32; only
# the per-element read width changes. Halves the BN stats traffic on the
# 3M-row pillar PFN / perturber stacks (trace attribution, PARITY.md
# round-5); bf16-level rounding on the per-element terms is within the BN
# eps (1e-3) regime these stacks run at.
BN_BF16_STATS = _os.environ.get("RPC_BN_BF16_STATS", "0") == "1"


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

        lowp = BN_BF16_STATS and x.dtype != jnp.float32
        xs = x if lowp else x.astype(jnp.float32)
        if train:
            if lowp:
                m = mask.astype(x.dtype)[:, None]
                cnt = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
                mu = jnp.sum(x * m, axis=0, dtype=jnp.float32) / cnt
                d = x - mu[None, :].astype(x.dtype)
                var = jnp.sum(d * d * m, axis=0, dtype=jnp.float32) / cnt
            else:
                mu = masked_mean(xs, mask, axis=0, keepdims=False)
                var = masked_mean((xs - mu[None, :]) ** 2, mask, axis=0, keepdims=False)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mu
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mu, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var[None, :] + self.eps)
        if lowp:
            # keep the elementwise path in the input dtype end to end; the
            # per-channel scalars fold to (inv*scale, bias - mu*inv*scale)
            a = (inv * scale[None, :]).astype(x.dtype)
            b = (bias[None, :] - mu[None, :] * inv * scale[None, :]).astype(x.dtype)
            return (x * a + b).astype(self.dtype)
        y = (xs - mu[None, :]) * inv
        return (y * scale[None, :] + bias[None, :]).astype(self.dtype)
