"""Strong-variant trainer: momentum carry, dynamic scaling, anti-adaptation.

Drives StrongAdversarialVoxelNet with the reference's training dynamics
(train_kitti_adversarial_strong.py recipe: batch 1, 10 epochs, val every 2;
dynamic scaling updated from attack-effectiveness history,
strong_voxel_perturber.py:214-254; anti-adaptation with probability p scaling
detector losses x0.1, strong_adversarial_voxelnet.py:251-255). The
perturbation-momentum buffer and the scale factor live in the train state, so
the step remains one compiled program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from ..data.structures import PointCloudBatch
from ..models.detection import anchor_head_loss
from ..models.strong import (
    StrongAdversarialVoxelNet,
    StrongVoxelNetConfig,
    strong_adversary_terms,
)
from ..nn.perturber import strong_dynamic_scale
from .hooks import device_nan_ladder
from .loop import TrainConfig, make_optimizers, split_adversary_mask


class StrongTrainState(NamedTuple):
    params: any
    batch_stats: any
    opt_state_det: any
    opt_state_adv: any
    step: jnp.ndarray
    momentum: jnp.ndarray       # [N, C] last perturbations
    scale_factor: jnp.ndarray   # dynamic scaling (host-updated)
    rng: jax.Array
    nan_count: jnp.ndarray
    consecutive_nan: jnp.ndarray
    lr_scale: jnp.ndarray
    adversary_enabled: jnp.ndarray


class StrongTrainer:
    def __init__(
        self,
        model_cfg: StrongVoxelNetConfig = StrongVoxelNetConfig(),
        train_cfg: TrainConfig = TrainConfig(),
    ):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        if getattr(train_cfg, "pgd_steps", 0):
            # fail loudly rather than silently training without PGD-AT
            raise NotImplementedError(
                "pgd_steps (PGD adversarial training) is implemented for the "
                "anchor-head Trainer only; StrongTrainer does not run it"
            )
        self.model = StrongAdversarialVoxelNet(cfg=model_cfg)
        anchors, anchor_cls = model_cfg.base.make_anchors()
        self.anchors = jnp.asarray(anchors)
        self.anchor_cls = jnp.asarray(anchor_cls)
        self.det_tx, self.adv_tx = make_optimizers(train_cfg)
        self._train_step = None
        # host-side attack-effectiveness history (reference keeps python lists)
        self.effectiveness_history = []
        self.magnitude_history = []
        self._np_rng = np.random.RandomState(0)

    def init_state(self, rng: jax.Array, batch: PointCloudBatch) -> StrongTrainState:
        init_fn = jax.jit(
            lambda r, p, m: self.model.init(r, p, m, True, 1.0, None)
        )
        variables = init_fn(rng, batch.points, batch.points_mask)
        params = variables["params"]
        B = batch.points.shape[0]
        n = B * self.model_cfg.base.voxelizer.max_voxels
        return StrongTrainState(
            params=params,
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state_det=self.det_tx.init(params),
            opt_state_adv=self.adv_tx.init(params),
            step=jnp.int32(0),
            momentum=jnp.zeros((n, 4), jnp.float32),
            scale_factor=jnp.float32(1.0),
            rng=rng,
            nan_count=jnp.int32(0),
            consecutive_nan=jnp.int32(0),
            lr_scale=jnp.float32(1.0),
            adversary_enabled=jnp.float32(1.0),
        )

    def _loss_fn(self, params, state, batch, dropout_rng, anti_rng, plan=None):
        cfg = self.model_cfg
        # curriculum factor min(1 + iter/10000, 2) folds into the scale
        curriculum = jnp.minimum(1.0 + state.step.astype(jnp.float32) / 10000.0, 2.0)
        scale = jnp.minimum(state.scale_factor * curriculum, cfg.max_scaling)
        outs, mutated = self.model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch.points,
            batch.points_mask,
            True,
            scale,
            state.momentum,
            -cfg.adversarial_loss_weight * state.adversary_enabled * scale,
            plan=plan,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        det = anchor_head_loss(
            outs.cls_scores, outs.bbox_preds, outs.dir_preds,
            self.anchors, self.anchor_cls,
            batch.gt_boxes, batch.gt_labels, batch.gt_mask,
            cfg.base.head,
            assign=None if plan is None else plan.get("assign"),
        )
        det_total = det["loss_cls"] + det["loss_bbox"] + det["loss_dir"]
        # anti-adaptation: occasionally starve the detector (x0.1)
        anti = jax.random.bernoulli(anti_rng, cfg.anti_adaptation_prob)
        det_total = det_total * jnp.where(anti, 0.1, 1.0)
        adv_direct, adv_logs = strong_adversary_terms(
            outs.adv_aux, outs.perturbations, state.momentum,
            cfg.momentum_loss_weight,
        )
        total = det_total + state.adversary_enabled * adv_direct
        is_nan = ~jnp.isfinite(total)
        total = jnp.where(is_nan, 0.0, total)
        logs = {
            "loss": det_total,
            "loss_cls": det["loss_cls"],
            "loss_bbox": det["loss_bbox"],
            "loss_dir": det["loss_dir"],
            "loss_adversarial": -jax.lax.stop_gradient(det_total),
            "attack_scale": scale,
            "anti_adaptation": anti.astype(jnp.float32),
            **adv_logs,
        }
        return total, (mutated.get("batch_stats", state.batch_stats), logs,
                       outs.perturbations, is_nan)

    def _step_impl(self, state: StrongTrainState, batch: PointCloudBatch,
                   plan=None):
        rng, dropout_rng, anti_rng = jax.random.split(state.rng, 3)
        grads, (new_stats, logs, pert, is_nan) = jax.grad(
            self._loss_fn, has_aux=True
        )(state.params, state, batch, dropout_rng, anti_rng, plan)
        # sanitize BEFORE the optimizers — a NaN leaf would poison Adam's
        # moments permanently (see train/loop.py for the full rationale)
        grads_finite = jax.tree_util.tree_reduce(
            lambda acc, g: acc & jnp.all(jnp.isfinite(g)), grads, jnp.bool_(True)
        )
        is_nan = is_nan | ~grads_finite
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
        )
        adv_mask = split_adversary_mask(state.params)
        det_up, new_det = self.det_tx.update(grads, state.opt_state_det, state.params)
        adv_up, new_adv = self.adv_tx.update(grads, state.opt_state_adv, state.params)
        updates = jax.tree_util.tree_map(
            lambda m, d, a: jnp.where(m, a, d), adv_mask, det_up, adv_up
        )
        new_stats = jax.tree_util.tree_map(
            lambda n, o: jnp.where(is_nan, o, n), new_stats, state.batch_stats
        )
        freeze = state.lr_scale * (1.0 - is_nan.astype(jnp.float32))
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(jnp.isfinite(u), u * freeze, 0.0), updates
        )
        new_params = optax.apply_updates(state.params, updates)
        nan_i = is_nan.astype(jnp.int32)
        new_total, new_lr_scale, new_enabled = device_nan_ladder(
            state.nan_count, nan_i, state.lr_scale, state.adversary_enabled
        )
        new_state = state._replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state_det=new_det,
            opt_state_adv=new_adv,
            step=state.step + 1,
            momentum=jax.lax.stop_gradient(pert),
            rng=rng,
            nan_count=new_total,
            consecutive_nan=(state.consecutive_nan + nan_i) * nan_i,
            lr_scale=new_lr_scale,
            adversary_enabled=new_enabled,
        )
        return new_state, logs

    def compile(self, donate: bool = True):
        kwargs = dict(donate_argnums=(0,)) if donate else {}
        self._train_step = jax.jit(self._step_impl, **kwargs)
        return self

    def train_step(self, state, batch, plan=None):
        if self._train_step is None:
            self.compile()
        return self._train_step(state, batch, plan)

    def make_plan_builder(self):
        """Sparse plans are built against the BASE detector config (the strong
        variant shares its voxelizer/encoder geometry and anchors)."""
        from .loop import HostPlanBuilder

        return HostPlanBuilder(self.model_cfg.base)

    # -- eval -----------------------------------------------------------------
    def forward_eval(self, state: StrongTrainState, batch: PointCloudBatch,
                     attack: bool = False):
        """Clean eval (no perturbation) or attack eval (perturbation forced at
        the current dynamic scale — the strong variant's analogue of the
        reference's forced-perturbation attack eval)."""
        if getattr(self, "_eval_step", None) is None:
            self._eval_step = jax.jit(
                lambda p, bs, pts, m: self.model.apply(
                    {"params": p, "batch_stats": bs}, pts, m, False,
                    1.0, None, 0.0, False,
                )
            )
            self._attack_step = jax.jit(
                lambda p, bs, pts, m, scale, mom: self.model.apply(
                    {"params": p, "batch_stats": bs}, pts, m, False,
                    scale, mom, 0.0, True,
                )
            )
        if attack:
            return self._attack_step(
                state.params, state.batch_stats, batch.points, batch.points_mask,
                state.scale_factor, state.momentum,
            )
        return self._eval_step(
            state.params, state.batch_stats, batch.points, batch.points_mask
        )

    # -- host-side dynamic scaling (reference update_dynamic_scaling) --------
    def update_dynamic_scaling(self, state: StrongTrainState, epoch: int, logs=None):
        if logs is not None:
            self.effectiveness_history.append(abs(float(logs["loss_adversarial"])) /
                                              max(float(logs["loss"]), 1e-6) - 1.0)
            self.magnitude_history.append(float(logs["perturbation_l2_norm"]))
            self.effectiveness_history = self.effectiveness_history[-1000:]
            self.magnitude_history = self.magnitude_history[-1000:]
        eff = (
            float(np.mean(self.effectiveness_history[-20:]))
            if len(self.effectiveness_history) > 20 else None
        )
        mag = (
            float(np.mean(self.magnitude_history[-50:]))
            if len(self.magnitude_history) > 50 else None
        )
        jitter = float(self._np_rng.normal(0, 0.05))
        scale = strong_dynamic_scale(epoch, eff, mag, jitter, self.model_cfg.max_scaling)
        return state._replace(scale_factor=jnp.float32(scale))

    def reset_momentum(self, state: StrongTrainState) -> StrongTrainState:
        return state._replace(momentum=jnp.zeros_like(state.momentum))
