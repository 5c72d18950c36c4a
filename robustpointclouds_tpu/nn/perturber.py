"""Learned adversarial perturbation generators (VoxelPerturber family).

TPU-native re-design of the reference's adversary MLPs:

  * `VoxelPerturber` — encoder-decoder MLP over per-point features with
    optional sigmoid spatial attention, per-feature std normalization,
    sensor-error-bounded tanh output and asymmetric train/attack bound
    profiles (reference models/adversarial/voxel_perturber.py:19-386).
  * `StrongVoxelPerturber` — deeper configurable variant with dropout,
    bottleneck, selectable activation and momentum/dynamic scaling hooks
    (reference models/adversarial/strong_voxel_perturber.py:36-370).

Differences from the reference, by design (SURVEY.md §2d):
  * Feature dim is static config (4 = KITTI, 5 = NuScenes) instead of lazy
    first-forward model building — JAX traces once.
  * The train/eval bound asymmetry is an explicit `attack` flag rather than a
    monkeypatched `self.training` (the principled version of
    evaluate_kitti_adversarial_attack.py:23-62).
  * NaN guards are branch-free (`nan_to_num` == the reference's
    fall-back-to-identity) and the return contract is always
    `(perturbed_or_deltas, loss_dict)` — the reference drifted between tuple
    shapes (SURVEY.md §2d.5).
"""
from __future__ import annotations

import os as _os
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import ADVERSARIES
from .layers import MaskedBatchNorm, masked_mean

# A/B gate: run the adversary MLP (Dense/BN/activation stack) in bf16 like
# the rest of the encoder stack. Params, BN statistics, the bound math
# (tanh/scale/clamp) and the regularizer losses stay f32. The MLP runs over
# every padded point row (480k at KITTI B=6; 3.07M for the pillar family) —
# trace attribution measured its f32 dot_generals + elementwise at ~51 ms of
# the 226 ms pillar step (PARITY.md round-5). Perturbation deltas are bounded
# at +-0.2 m, so bf16's ~3 significant digits on the *delta* are below
# sensor noise; the perturbed features themselves stay f32.
# DEFAULT ON since round 5: measured −5.6 ms on the SECOND plan step
# (193.4 vs 199.0) and part of the pillar −30% (PARITY.md round-5 table).
PERT_BF16 = _os.environ.get("RPC_PERT_BF16", "1") == "1"


def _bound_profile(
    num_features: int,
    sensor_error_bound: float,
    attack: bool,
) -> Tuple[np.ndarray, np.ndarray]:
    """(scale_bounds, clamp_bounds) per feature, matching the reference.

    KITTI (F=4) scaling (voxel_perturber.py:211-250):
      train:  x0.8 overall, spatial x1.3, intensity 0.2
      attack: x2.5 * avg(2.0, 1.5, 1.2) overall, spatial x2, intensity 1.5
    KITTI hard clamps (voxel_perturber.py:338-350):
      train:  x0.9, spatial x1.2, intensity 0.1
      attack: x5, spatial x5, intensity 2.0
    NuScenes (F=5): bounds = sensor_error_bound, timestamp channel zeroed.
    """
    e = sensor_error_bound
    scale = np.full(num_features, e, np.float32)
    clamp = np.full(num_features, e, np.float32)
    if num_features == 4:
        if attack:
            avg_boost = (2.0 + 1.5 + 1.2) / 3.0
            scale *= 2.5 * avg_boost
            scale[:3] *= 2.0
            scale[3] = 1.5
            clamp *= 5.0
            clamp[:3] *= 5.0
            clamp[3] = 2.0
        else:
            scale *= 0.8
            scale[:3] *= 1.3
            scale[3] = 0.2
            clamp *= 0.9
            clamp[:3] *= 1.2
            clamp[3] = 0.1
    elif num_features > 4:
        scale[4:] = 0.0
        clamp[4:] = 0.0
    return scale, clamp


def perturbation_losses(
    perturbations: jnp.ndarray, features: jnp.ndarray, mask: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """The paper's regularizer terms over valid rows.

    l2_norm: mean per-point L2 norm; intensity_loss: mean |delta intensity|;
    bias_loss: |mean offset| averaged over dims; imbalance_loss: std of the
    per-dim stds (reference voxel_perturber.py:267-317).
    """
    m = mask.astype(perturbations.dtype)
    count = jnp.maximum(jnp.sum(m), 1.0)
    row_norm = jnp.sqrt(jnp.sum(perturbations**2, axis=1) + 1e-12)
    l2_norm = jnp.sum(row_norm * m) / count
    ref_norm = jnp.sum(jnp.sqrt(jnp.sum(features**2, axis=1) + 1e-12) * m) / count
    l2_percentage = l2_norm / (ref_norm + 1e-8) * 100.0

    nf = perturbations.shape[1]
    intensity = (
        jnp.sum(jnp.abs(perturbations[:, 3]) * m) / count if nf >= 4 else jnp.float32(0.0)
    )
    mean_per_dim = jnp.sum(perturbations * m[:, None], axis=0) / count
    bias = jnp.mean(jnp.abs(mean_per_dim))
    var_per_dim = (
        jnp.sum((perturbations - mean_per_dim[None, :]) ** 2 * m[:, None], axis=0) / count
    )
    std_per_dim = jnp.sqrt(var_per_dim + 1e-12)
    imbalance = jnp.std(std_per_dim)
    abs_pert = jnp.abs(perturbations) * m[:, None]
    mean_abs = jnp.sum(abs_pert) / (count * nf)
    # std over all valid perturbation entries (reference _track_metrics,
    # voxel_perturber.py:388-409, feeds the _detailed.csv companion)
    mean_all = jnp.sum(perturbations * m[:, None]) / (count * nf)
    std_all = jnp.sqrt(
        jnp.sum(((perturbations - mean_all) * m[:, None]) ** 2) / (count * nf)
        + 1e-12
    )
    return {
        "l2_norm": l2_norm,
        "l2_percentage": l2_percentage,
        "intensity_loss": intensity,
        "bias_loss": bias,
        "imbalance_loss": imbalance,
        "max_perturbation": jnp.max(abs_pert),
        "mean_perturbation": mean_abs,
        "std_perturbation": std_all,
    }


@ADVERSARIES.register_module()
class VoxelPerturber(nn.Module):
    """Bounded learned perturbations on raw point features [N, F]."""

    num_features: int = 4
    sensor_error_bound: float = 0.2
    voxel_size: Sequence[float] = (0.05, 0.05, 0.1)
    use_spatial_attention: bool = True
    hidden_channels: Sequence[int] = (8, 16, 32)

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        mask: jnp.ndarray,
        train: bool,
        attack: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """
        Args:
            features: [N, F] point/voxel features (padding rows arbitrary).
            mask: [N] validity.
            train: batch-norm mode AND selects the conservative bound profile
                unless `attack` overrides.
            attack: use the aggressive evaluation-attack bounds.
        Returns:
            (perturbed_features [N, F], loss_dict).
        """
        f = self.num_features
        assert features.shape[-1] == f, (features.shape, f)
        out_std = 0.025 if f == 4 else 0.01

        # per-feature std normalization over valid rows, clamp +-10
        std = jnp.sqrt(
            masked_mean(
                (features - masked_mean(features, mask)) ** 2, mask
            )
            + 1e-6
        )
        x = jnp.clip(features / (std + 1e-6), -10.0, 10.0)
        x = jnp.where(mask[:, None], x, 0.0)

        mlp_dtype = jnp.bfloat16 if PERT_BF16 else jnp.float32
        chans = list(self.hidden_channels)
        h = x.astype(mlp_dtype)
        for i, c in enumerate(chans + chans[-2::-1]):  # encoder + mirrored decoder
            h = nn.Dense(c, name=f"mlp_{i}", dtype=mlp_dtype)(h)
            h = MaskedBatchNorm(name=f"bn_{i}", dtype=mlp_dtype)(h, mask, train)
            h = nn.relu(h)
        raw = nn.Dense(
            f,
            kernel_init=nn.initializers.normal(out_std),
            bias_init=nn.initializers.normal(out_std),
            name="mlp_out",
            dtype=mlp_dtype,
        )(h)
        raw = jnp.tanh(raw.astype(jnp.float32))

        if self.use_spatial_attention:
            a = nn.Dense(max(f // 2, 1), name="attn_0", dtype=mlp_dtype)(
                x.astype(mlp_dtype)
            )
            a = nn.relu(a)
            a = nn.Dense(1, name="attn_1", dtype=mlp_dtype)(a)
            raw = raw * jax.nn.sigmoid(a.astype(jnp.float32))

        scale_b, clamp_b = _bound_profile(f, self.sensor_error_bound, attack)
        pert = raw * jnp.asarray(scale_b)[None, :]
        pert = jnp.clip(pert, -jnp.asarray(clamp_b)[None, :], jnp.asarray(clamp_b)[None, :])
        # branch-free NaN guard == reference's fallback-to-identity
        pert = jnp.nan_to_num(pert, nan=0.0, posinf=0.0, neginf=0.0)
        pert = jnp.where(mask[:, None], pert, 0.0)

        loss_dict = perturbation_losses(pert, features, mask)
        return features + pert, loss_dict


@ADVERSARIES.register_module()
class StrongVoxelPerturber(nn.Module):
    """Deeper adversary with dropout, bottleneck and dynamic scaling hooks.

    The reference's epoch/effectiveness/magnitude scaling state lives in the
    train loop (host side, like its python lists); the compiled module takes
    the combined `scale_factor` as a traced scalar. Momentum over the previous
    step's perturbations is carried by the caller (shape-stable [N, F]).
    """

    num_features: int = 4
    sensor_error_bound: float = 0.18
    use_spatial_attention: bool = True
    hidden_channels: Sequence[int] = (64, 128, 256, 128)
    dropout_rate: float = 0.1
    activation: str = "ReLU"  # ReLU | LeakyReLU | ELU
    use_batch_norm: bool = True
    momentum_alpha: float = 0.9

    def _act(self, x):
        if self.activation == "LeakyReLU":
            return nn.leaky_relu(x, 0.2)
        if self.activation == "ELU":
            return nn.elu(x)
        return nn.relu(x)

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        mask: jnp.ndarray,
        train: bool,
        scale_factor: jnp.ndarray | float = 1.0,
        last_perturbations: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Returns (perturbation deltas [N, F], loss_dict) — deltas, not
        perturbed features: this variant is applied post-encoder by
        StrongAdversarialVoxelNet (reference strong_adversarial_voxelnet.py:141-192).
        """
        f = self.num_features
        mean = masked_mean(features, mask)
        std = jnp.sqrt(masked_mean((features - mean) ** 2, mask) + 1e-6)
        x = jnp.clip((features - mean) / std, -5.0, 5.0)
        x = jnp.where(mask[:, None], x, 0.0)

        mlp_dtype = jnp.bfloat16 if PERT_BF16 else jnp.float32
        h = x.astype(mlp_dtype)
        for i, c in enumerate(self.hidden_channels):
            h = nn.Dense(c, name=f"enc_{i}", dtype=mlp_dtype)(h)
            if self.use_batch_norm:
                h = MaskedBatchNorm(name=f"enc_bn_{i}", dtype=mlp_dtype)(h, mask, train)
            h = self._act(h)
            if i < len(self.hidden_channels) - 1 and self.dropout_rate > 0:
                h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)

        bottleneck = max(self.hidden_channels[-1] // 2, 16)
        h = nn.Dense(bottleneck, name="bottleneck", dtype=mlp_dtype)(h)
        if self.use_batch_norm:
            h = MaskedBatchNorm(name="bottleneck_bn", dtype=mlp_dtype)(h, mask, train)
        h = self._act(h)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate * 1.5, deterministic=deterministic)(h)

        for i, c in enumerate(reversed(self.hidden_channels)):
            h = nn.Dense(c, name=f"dec_{i}", dtype=mlp_dtype)(h)
            if i < len(self.hidden_channels) - 1:
                if self.use_batch_norm:
                    h = MaskedBatchNorm(name=f"dec_bn_{i}", dtype=mlp_dtype)(h, mask, train)
                h = self._act(h)
                if self.dropout_rate > 0:
                    h = nn.Dropout(self.dropout_rate * 0.5, deterministic=deterministic)(h)

        raw = jnp.tanh(nn.Dense(f, name="out", dtype=mlp_dtype)(h).astype(jnp.float32))

        if self.use_spatial_attention:
            ah = max(f // 2, 8)
            a = self._act(nn.Dense(ah, name="attn_0", dtype=mlp_dtype)(
                x.astype(mlp_dtype)))
            a = nn.Dense(1, name="attn_1", dtype=mlp_dtype)(a)
            raw = raw * jax.nn.sigmoid(a.astype(jnp.float32))

        if last_perturbations is not None:
            raw = raw + 0.1 * (self.momentum_alpha * jax.lax.stop_gradient(last_perturbations))

        e = self.sensor_error_bound
        bounds = np.full(f, e, np.float32)
        if f == 4:
            class_boost = (2.5 + 1.8 + 1.2) / 3.0
            if train:
                mult, spatial, intensity = 1.2, 1.5, 0.8
            else:
                mult, spatial, intensity = 2.0, 2.5, 1.5
            bounds *= mult
            bounds[:3] *= spatial
            bounds[3] = intensity
            bounds *= class_boost
            pert = raw * jnp.asarray(bounds)[None, :] * scale_factor
        else:
            pert = raw * jnp.asarray(bounds)[None, :] * scale_factor

        pert = jnp.nan_to_num(pert, nan=0.0, posinf=0.0, neginf=0.0)
        pert = jnp.where(mask[:, None], pert, 0.0)
        loss_dict = perturbation_losses(pert, features, mask)
        return pert, loss_dict


def strong_dynamic_scale(
    epoch: float,
    effectiveness_recent: float | None,
    magnitude_recent: float | None,
    jitter: float = 0.0,
    max_scale: float = 5.0,
) -> float:
    """Host-side dynamic scaling (reference strong_voxel_perturber.py:214-254).

    epoch_scale = 1 + 0.1*epoch; weak-attack boost x1.5/x2; small-perturbation
    boost x1.8; capped at 5.0 with multiplicative jitter >= 0.8.
    """
    epoch_scale = 1.0 + 0.1 * epoch
    if effectiveness_recent is None:
        eff = 1.0
    elif effectiveness_recent < 0.1:
        eff = 2.0
    elif effectiveness_recent < 0.3:
        eff = 1.5
    else:
        eff = 1.0
    mag = 1.8 if (magnitude_recent is not None and magnitude_recent < 0.1) else 1.0
    scale = min(epoch_scale * eff * mag, max_scale)
    return scale * max(1.0 + jitter, 0.8)
