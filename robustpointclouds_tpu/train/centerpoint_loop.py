"""CenterPoint min-max trainer (NuScenes path).

Same fused-step construction as train/loop.py but with CenterPoint's loss
stack and the reference's epoch-ramped adversarial weight
(-min(w*epoch/10, w), models/detectors/adversarial_centerpoint.py:160-163)
carried by the gradient-reversal scale. Reference recipe: batch 1, AdamW
lr=5e-5, clip 1.0, warm start from a pretrained checkpoint
(configs/adversarial/adversarial-centerpoint_voxel-nuscenes.py:52-88).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..data.structures import PointCloudBatch
from ..models.center_detection import centerpoint_loss
from ..models.centerpoint import (
    AdversarialCenterPoint,
    CenterPointConfig,
    centerpoint_adversary_terms,
)
from .hooks import device_nan_ladder
from .loop import (
    CpuBoundBuilder,
    TrainConfig,
    TrainState,
    make_optimizers,
    split_adversary_mask,
)


class CenterPointPlanBuilder(CpuBoundBuilder):
    """Host plan builder for the CenterPoint family (5-feature voxels +
    gaussian heatmap targets riding along; native C++ core when present)."""

    def __init__(self, cfg):
        super().__init__()
        from ..models.center_detection import centerpoint_targets_single
        from ..models.centerpoint import build_centerpoint_plan

        self._cfg = cfg
        self._fn = jax.jit(lambda p, m: build_centerpoint_plan(p, m, cfg))
        self._fn_gt = jax.jit(
            lambda p, m, gb, gl, gm, gv: build_centerpoint_plan(
                p, m, cfg, gb, gl, gm, gv
            )
        )
        feat = cfg.bev_feature_size
        self._tgt_fn = jax.jit(jax.vmap(
            lambda b, l, m, v: centerpoint_targets_single(
                b, l, m, v, feat, cfg.head
            )
        ))
        self._native = self._native_fn()
        if self._native is not None:
            self.backend = "native"

    def __call__(self, points, points_mask, gt_boxes=None, gt_labels=None,
                 gt_mask=None, gt_vel=None):
        import numpy as np

        cfg = self._cfg
        if self._native is not None:
            plan = self._native(
                np.asarray(points), np.asarray(points_mask),
                cfg.voxelizer, cfg.num_point_features,
            )
            if gt_boxes is not None:
                plan["targets"] = self._on_cpu(
                    lambda: self._tgt_fn(gt_boxes, gt_labels, gt_mask, gt_vel)
                )
            return plan
        if gt_boxes is None:
            return self._on_cpu(lambda: self._fn(points, points_mask))
        return self._on_cpu(
            lambda: self._fn_gt(points, points_mask, gt_boxes,
                                gt_labels, gt_mask, gt_vel)
        )


class CenterPointTrainer:
    def __init__(
        self,
        model_cfg: CenterPointConfig = CenterPointConfig(),
        train_cfg: TrainConfig = TrainConfig(
            learning_rate=5e-5, grad_clip_norm=1.0, adversary_lr_mult=1.0
        ),
    ):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        if getattr(train_cfg, "pgd_steps", 0):
            # fail loudly: silently training clean while the config asks for
            # PGD-AT would produce a fake "robust" checkpoint
            raise NotImplementedError(
                "pgd_steps (PGD adversarial training) is implemented for the "
                "anchor-head Trainer only; CenterPointTrainer does not run it"
            )
        self.model = AdversarialCenterPoint(cfg=model_cfg)
        self.det_tx, self.adv_tx = make_optimizers(train_cfg)
        self._train_step = None
        self._eval_step = None
        self._attack_step = None

    def init_state(self, rng: jax.Array, sample_batch: PointCloudBatch) -> TrainState:
        init_fn = jax.jit(lambda r, p, m: self.model.init(r, p, m, True, 0))
        variables = init_fn(rng, sample_batch.points, sample_batch.points_mask)
        params = variables["params"]
        return TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state_det=self.det_tx.init(params),
            opt_state_adv=self.adv_tx.init(params),
            step=jnp.int32(0),
            nan_count=jnp.int32(0),
            consecutive_nan=jnp.int32(0),
            lr_scale=jnp.float32(1.0),
            adversary_enabled=jnp.float32(1.0),
        )

    def _loss_fn(self, params, batch_stats, batch, gt_vel, epoch, adv_enabled,
                 plan=None):
        # epoch-ramped GRL scale (reference's adaptive_weight)
        w = self.model_cfg.adversarial_loss_weight
        ramp = jnp.minimum(w * jnp.asarray(epoch, jnp.float32) / 10.0, w)
        outs, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch.points,
            batch.points_mask,
            True,
            epoch,
            False,
            -ramp * adv_enabled,
            plan,
            mutable=["batch_stats"],
        )
        det = centerpoint_loss(
            outs.task_preds, batch.gt_boxes, batch.gt_labels, batch.gt_mask,
            gt_vel, self.model_cfg.head,
            targets=None if plan is None else plan.get("targets"),
        )
        det_total = det["loss_heatmap"] + det["loss_bbox"]
        adv_direct, _, adv_logs = centerpoint_adversary_terms(
            det, outs.adv_aux, epoch,
            self.model_cfg.adversarial_loss_weight,
            self.model_cfg.regularization_weight,
        )
        total = det_total + adv_enabled * adv_direct
        is_nan = ~jnp.isfinite(total)
        total = jnp.where(is_nan, 0.0, total)
        logs = {
            "loss": det_total,
            "loss_heatmap": det["loss_heatmap"],
            "loss_bbox": det["loss_bbox"],
            **adv_logs,
        }
        return total, (mutated.get("batch_stats", batch_stats), logs, is_nan)

    def _grads(self, state: TrainState, batch: PointCloudBatch, gt_vel, epoch,
               plan=None):
        """Gradient half (split from :meth:`_apply` so the shard_map'd DDP
        step can pmean between the two — same structure as train/loop.py).

        Grads are sanitized BEFORE the optimizers exactly like the flagship
        Trainer (train/loop.py): zeroing the loss scalar does not stop
        NaN/Inf gradients, and one non-finite leaf would poison
        clip_by_global_norm and Adam's moments permanently — the first
        on-chip CenterPoint bench (work_dirs/BENCH_centerpoint.err,
        2026-08-19) hit exactly this cascade. The reference's
        NaNDetectionHook recovers and continues (custom_hook.py:113-116);
        a non-finite gradient anywhere counts as a NaN step for the ladder.
        """
        grads, (new_stats, logs, is_nan) = jax.grad(
            self._loss_fn, has_aux=True
        )(
            state.params, state.batch_stats, batch, gt_vel, epoch,
            state.adversary_enabled, plan,
        )
        grads_finite = jax.tree_util.tree_reduce(
            lambda acc, g: acc & jnp.all(jnp.isfinite(g)), grads, jnp.bool_(True)
        )
        is_nan = is_nan | ~grads_finite
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
        )
        return grads, (new_stats, logs, is_nan)

    def _apply(self, state: TrainState, grads, new_stats, logs, is_nan):
        adv_mask = split_adversary_mask(state.params)
        det_up, new_det = self.det_tx.update(grads, state.opt_state_det, state.params)
        adv_up, new_adv = self.adv_tx.update(grads, state.opt_state_adv, state.params)
        updates = jax.tree_util.tree_map(
            lambda m, d, a: jnp.where(m, a, d), adv_mask, det_up, adv_up
        )
        # a NaN forward also taints BN running stats — keep the old ones
        # (same recover-and-continue semantics as train/loop.py:_apply)
        new_stats = jax.tree_util.tree_map(
            lambda n, o: jnp.where(is_nan, o, n), new_stats, state.batch_stats
        )
        scale = state.lr_scale * (1.0 - is_nan.astype(jnp.float32))
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(jnp.isfinite(u), u * scale, 0.0), updates
        )
        new_params = optax.apply_updates(state.params, updates)
        nan_i = is_nan.astype(jnp.int32)
        new_total, new_lr_scale, new_enabled = device_nan_ladder(
            state.nan_count, nan_i, state.lr_scale, state.adversary_enabled
        )
        return (
            TrainState(
                params=new_params,
                batch_stats=new_stats,
                opt_state_det=new_det,
                opt_state_adv=new_adv,
                step=state.step + 1,
                nan_count=new_total,
                consecutive_nan=(state.consecutive_nan + nan_i) * nan_i,
                lr_scale=new_lr_scale,
                adversary_enabled=new_enabled,
            ),
            logs,
        )

    def _step_impl(self, state: TrainState, batch: PointCloudBatch, gt_vel,
                   epoch, plan=None):
        grads, aux = self._grads(state, batch, gt_vel, epoch, plan)
        return self._apply(state, grads, *aux)

    def _sharded_step_impl(self, state: TrainState, batch: PointCloudBatch,
                           gt_vel, epoch, plan=None):
        """Per-device DDP body (inside shard_map): local sub-batch + this
        device's own sub-plan, then reference-DDP reductions (mean grads/BN
        stats/logs, any-device NaN is a global NaN step)."""
        local_plan = None if plan is None else jax.tree_util.tree_map(
            lambda x: x[0], plan
        )
        grads, (new_stats, logs, is_nan) = self._grads(
            state, batch, gt_vel, epoch, local_plan
        )
        grads = jax.lax.pmean(grads, "data")
        new_stats = jax.lax.pmean(new_stats, "data")
        logs = jax.lax.pmean(logs, "data")
        is_nan = jax.lax.psum(is_nan.astype(jnp.int32), "data") > 0
        return self._apply(state, grads, new_stats, logs, is_nan)

    def compile(self, donate: bool = True):
        kwargs = dict(donate_argnums=(0,)) if donate else {}
        self._train_step = jax.jit(self._step_impl, **kwargs)
        return self

    def compile_sharded(self, mesh, donate: bool = True, axis_name: str = "data"):
        """True data-parallel CenterPoint step (see train/loop.py
        compile_sharded for the rationale: replicated merged-batch plans pin
        GSPMD to replicated compute; per-device sub-plans partition it)."""
        from jax.sharding import PartitionSpec as P

        step = jax.shard_map(
            self._sharded_step_impl,
            mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name), P(), P(axis_name)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        kwargs = dict(donate_argnums=(0,)) if donate else {}
        self._train_step = jax.jit(step, **kwargs)
        return self

    def train_step(self, state, batch, gt_vel, epoch: int, plan=None):
        if self._train_step is None:
            self.compile()
        return self._train_step(
            state, batch, jnp.asarray(gt_vel), jnp.float32(epoch), plan
        )

    def make_plan_builder(self):
        return CenterPointPlanBuilder(self.model_cfg)

    def forward_eval(self, state, batch, attack: bool = False, plan=None):
        """`plan`: optional host-built sparse plan (build_centerpoint_plan,
        no targets needed) — sort-free device forward for serving too."""
        if self._eval_step is None:
            self._eval_step = jax.jit(
                lambda p, bs, pts, m, pl: self.model.apply(
                    {"params": p, "batch_stats": bs}, pts, m, False, 100, False,
                    -1.0, pl,
                )
            )
            self._attack_step = jax.jit(
                lambda p, bs, pts, m, pl: self.model.apply(
                    {"params": p, "batch_stats": bs}, pts, m, False, 100, True,
                    -1.0, pl,
                )
            )
        fn = self._attack_step if attack else self._eval_step
        return fn(state.params, state.batch_stats, batch.points,
                  batch.points_mask, plan)
