"""jit-compiled min-max training: one fused step, two optimizers, DP sharding.

Replaces the reference's mmengine Runner + single AdamW with lr_mult trick
(reference configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:130-139,
train loop train.py:117-128). Everything per step — voxelization, adversary,
detector forward, loss, single fused backward (gradient reversal handles the
min-max, see models/voxelnet.py), both optimizer updates — is one XLA program.

Data parallelism: the step is jitted under a `jax.sharding.Mesh` with the batch
sharded over the 'data' axis; XLA inserts the gradient psum over ICI (no
NCCL/DDP equivalent needed — SURVEY.md §2c).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..data.structures import PointCloudBatch
from ..models.detection import anchor_head_loss
from ..models.voxelnet import AdversarialVoxelNet, VoxelNetConfig, adversary_direct_terms
from .hooks import device_nan_ladder


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (reference recipe: BASELINE.md table)."""

    learning_rate: float = 1e-4
    adversary_lr_mult: float = 2.0  # reference paramwise_cfg lr_mult
    weight_decay: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    grad_clip_norm: float = 0.5
    adversary_grad_clip_value: float = 0.1  # reference per-param hook clamp
    warmup_iters: int = 2000
    warmup_start_factor: float = 0.1
    max_epochs: int = 30
    steps_per_epoch: int = 1000
    eta_min_factor: float = 0.01
    # Multiplies the gradient-reversal scale on the perturbation delta, i.e.
    # the adversary's -detection-loss objective. Default 1.0 = the reference's
    # effective behavior: AdversarialVoxelNet stores adversarial_loss_weight
    # (default 1.0, adversarial_voxelnet.py:26) but its forward applies a bare
    # -1.0 (adversarial_voxelnet.py:284); freeze mode sets 0.5
    # (train_kitti_3class_adversarial.py:208) and here that knob is live.
    adversarial_loss_weight: float = 1.0
    regularization_weight: float = 0.02
    # reference --freeze-detector mode (train_kitti_3class_adversarial.py:198-211):
    # detector learning off, adversary lr_mult 20
    freeze_detector: bool = False
    # PGD adversarial training (Madry, arXiv:1706.06083) — beyond the
    # reference's learned-adversary recipe: >0 runs a pgd_steps-step white-box
    # attack on the plan's raw voxels (eval/attacks.make_plan_attack, same
    # physical envelope as the learned attack) INSIDE the train step and
    # trains the detector on the attacked input. Requires the plan-fed path;
    # typically combined with model adversary=None. The attack is treated as
    # a constant w.r.t. params (standard AT: no second-order term — jax.grad
    # at the loss boundary never differentiates the outer delta computation).
    pgd_steps: int = 0
    pgd_rel_step: float = 2.5


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state_det: Any
    opt_state_adv: Any
    step: jnp.ndarray
    # on-device failure counters (host reads them at log boundaries)
    nan_count: jnp.ndarray
    consecutive_nan: jnp.ndarray
    lr_scale: jnp.ndarray          # reduced by the NaN ladder
    adversary_enabled: jnp.ndarray  # kill switch (1.0 / 0.0)


def _is_adversary_path(path: Tuple) -> bool:
    return any(getattr(k, "key", None) == "adversary" for k in path)


def split_adversary_mask(params) -> Any:
    """Pytree mask: True on adversary params, False on detector params."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_adversary_path(path), params
    )


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Linear warmup (factor 0.1 over 2000 iters) + cosine to 1% over training
    (reference param_scheduler, ...kitti-3d-3class.py:142-159)."""
    total = cfg.max_epochs * cfg.steps_per_epoch
    warmup = optax.linear_schedule(
        cfg.learning_rate * cfg.warmup_start_factor, cfg.learning_rate, cfg.warmup_iters
    )
    cosine = optax.cosine_decay_schedule(
        cfg.learning_rate, max(total - cfg.warmup_iters, 1), alpha=cfg.eta_min_factor
    )
    return optax.join_schedules([warmup, cosine], [cfg.warmup_iters])


def make_optimizers(cfg: TrainConfig):
    sched = make_lr_schedule(cfg)
    det_scale = 0.0 if cfg.freeze_detector else 1.0
    det_tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-8),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_schedule(lambda i: sched(i) * det_scale),
        optax.scale(-1.0),
    )
    adv_tx = optax.chain(
        optax.zero_nans(),
        optax.clip(cfg.adversary_grad_clip_value),
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-8),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_schedule(lambda i: sched(i) * cfg.adversary_lr_mult),
        optax.scale(-1.0),
    )
    return det_tx, adv_tx


class CpuBoundBuilder:
    """Shared plumbing for host plan builders: CPU-device probe, CPU-pinned
    execution, and native-library detection (one place to change the
    fallback/gating policy for every family's builder)."""

    def __init__(self):
        try:
            # local_devices, not devices: in a multi-process (multi-host) run
            # global CPU device 0 belongs to process 0 — pinning to it from
            # another process commits plan arrays to a non-addressable device
            self._cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            self._cpu = None  # no CPU backend registered: plans build on the
            # default device (functional, but the host-overlap claim is off —
            # bench.py reports plan_backend so the numbers stay honest)
        self.backend = "cpu" if self._cpu is not None else jax.default_backend()

    def _on_cpu(self, fn):
        if self._cpu is None:
            return fn()
        with jax.default_device(self._cpu):
            return fn()

    @staticmethod
    def _native_fn(use_native: bool = None):
        """The native C++ core builder when available and enabled, else None.
        RPC_NATIVE_PLAN=0 forces the jax builder."""
        import os

        if use_native is None:
            use_native = os.environ.get("RPC_NATIVE_PLAN", "1") == "1"
        if not use_native:
            return None
        try:
            from ..data.native_plan import build_plan_native, native_plan_available

            return build_plan_native if native_plan_available() else None
        except Exception:
            return None


class HostPlanBuilder(CpuBoundBuilder):
    """Builds sparse plans (models/voxelnet.build_plan) on the CPU backend.

    The plan — voxelization plus every encoder neighbor/downsample index — is
    a pure function of the input points, so the input pipeline computes it on
    the host CPU (in the prefetch thread, overlapping the device step) and the
    device step runs sort-free. The SAME jax code builds the plan on either
    backend, so plan-fed and inline steps are numerically identical
    (tests/test_plan.py).

    Thread-safe: jax jit dispatch is; each prefetch worker may call this
    concurrently. Returns CPU-committed arrays — `device_put` them (the train
    CLIs do) so the H2D copy overlaps like any other input transfer.
    """

    def __init__(self, model_cfg: VoxelNetConfig, use_native: bool = None):
        super().__init__()
        from ..models.voxelnet import anchor_assign_plan, build_plan

        self._cfg = model_cfg
        self._fn = jax.jit(
            lambda p, m, gb, gl, gm: build_plan(p, m, model_cfg, gb, gl, gm)
        )
        self._fn_noassign = jax.jit(lambda p, m: build_plan(p, m, model_cfg))
        self._assign_fn = jax.jit(
            lambda gb, gl, gm: anchor_assign_plan(gb, gl, gm, model_cfg)
        )
        # native C++ index builder (csrc/plan.cpp): bit-equal, ~20x less host
        # time than the XLA-CPU jit — only the float anchor assignment stays
        # on the jax path.
        self._native = self._native_fn(use_native)
        if self._native is not None:
            self.backend = "native"

    def __call__(self, points, points_mask, gt_boxes=None, gt_labels=None,
                 gt_mask=None):
        import numpy as np

        if self._native is not None:
            plan = self._native(
                np.asarray(points), np.asarray(points_mask),
                self._cfg.voxelizer, 4,
            )
            from ..nn import sparse_encoder as _se

            if _se.DENSE_GATHER:
                # dense-cell -> sparse-row map for the gather-form densify
                # (matches ops/sparse.dense_gather_map on the out grid)
                shape = (points.shape[0],) + tuple(self._cfg.voxelizer.sparse_shape)
                for i in (1, 2, 3):
                    shape = _se._down_shape(shape, *_se._down_geom(4, i))
                shape = _se._down_shape(shape, *_se._OUT_GEOM)
                size = int(np.prod(shape))
                st = plan["enc"]["out"]
                n = st["ids"].shape[0]
                dmap = np.full((size,), n, np.int32)
                m = st["mask"]
                dmap[st["ids"][m]] = np.nonzero(m)[0].astype(np.int32)
                st["dense"] = dmap
            if gt_boxes is not None:
                plan["assign"] = self._on_cpu(
                    lambda: self._assign_fn(gt_boxes, gt_labels, gt_mask)
                )
            return plan
        if gt_boxes is None:
            return self._on_cpu(lambda: self._fn_noassign(points, points_mask))
        return self._on_cpu(
            lambda: self._fn(points, points_mask, gt_boxes, gt_labels, gt_mask)
        )


class PillarPlanBuilder(CpuBoundBuilder):
    """Host plan builder for the pillar family: voxelize + BEV grid + dense
    gather map (models/pointpillars.build_pillar_plan) plus the anchor
    assignment — the whole structure side of the pillar step, on CPU."""

    def __init__(self, model_cfg):
        super().__init__()
        from ..models.pointpillars import build_pillar_plan
        from ..models.voxelnet import anchor_assign_plan

        self._cfg = model_cfg
        self._fn = jax.jit(lambda p, m: build_pillar_plan(p, m, model_cfg))
        self._assign_fn = jax.jit(
            lambda gb, gl, gm: anchor_assign_plan(gb, gl, gm, model_cfg)
        )
        self._native = None
        if model_cfg.voxelizer.grid_size[2] == 1:  # single-z pillar grid only
            fn = self._native_fn()
            if fn is not None:
                from ..data.native_plan import build_pillar_plan_native

                self._native = build_pillar_plan_native
                self.backend = "native"

    def __call__(self, points, points_mask, gt_boxes=None, gt_labels=None,
                 gt_mask=None):
        import numpy as np

        if self._native is not None:
            plan = self._native(
                np.asarray(points), np.asarray(points_mask),
                self._cfg.voxelizer,
            )
        else:
            plan = dict(self._on_cpu(lambda: self._fn(points, points_mask)))
        if gt_boxes is not None:
            plan["assign"] = self._on_cpu(
                lambda: self._assign_fn(gt_boxes, gt_labels, gt_mask)
            )
        return plan


class Trainer:
    """Owns the model, optimizers and the compiled train/eval steps."""

    def __init__(
        self,
        model_cfg: VoxelNetConfig = VoxelNetConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        if isinstance(model_cfg, VoxelNetConfig):
            self.model = AdversarialVoxelNet(cfg=model_cfg)
        else:
            # duck-typed anchor-head families (e.g. PointPillarsConfig):
            # same __call__/loss contract, different encoder
            from ..models.pointpillars import (
                AdversarialPointPillars,
                PointPillarsConfig,
            )

            assert isinstance(model_cfg, PointPillarsConfig), type(model_cfg)
            self.model = AdversarialPointPillars(cfg=model_cfg)
        anchors, anchor_cls = model_cfg.make_anchors()
        self.anchors = jnp.asarray(anchors)
        self.anchor_cls = jnp.asarray(anchor_cls)
        self.det_tx, self.adv_tx = make_optimizers(train_cfg)
        self.mesh = mesh
        self._train_step = None
        self._eval_step = None
        self._pgd_fn = None

    # -- initialization -----------------------------------------------------
    def init_state(self, rng: jax.Array, sample_batch: PointCloudBatch) -> TrainState:
        # jit the init: eager init dispatches every op separately, which is
        # pathological over a remote-device tunnel at full KITTI scale
        init_fn = jax.jit(
            lambda r, p, m: self.model.init(r, p, m, True, 0)
        )
        variables = init_fn(
            rng,
            jnp.asarray(sample_batch.points),
            jnp.asarray(sample_batch.points_mask),
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state_det=self.det_tx.init(params),
            opt_state_adv=self.adv_tx.init(params),
            step=jnp.int32(0),
            nan_count=jnp.int32(0),
            consecutive_nan=jnp.int32(0),
            lr_scale=jnp.float32(1.0),
            adversary_enabled=jnp.float32(1.0),
        )

    # -- the fused step -------------------------------------------------------
    def _loss_fn(self, params, batch_stats, batch: PointCloudBatch, epoch,
                 adv_enabled, plan=None):
        outs, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch.points,
            batch.points_mask,
            True,
            epoch,
            False,
            # GRL factor: -w (the adversary's -det objective), kill switch
            # zeroes it entirely (reference disable_adversarial_training)
            -self.train_cfg.adversarial_loss_weight * adv_enabled,
            plan,
            mutable=["batch_stats"],
        )
        det = anchor_head_loss(
            outs.cls_scores, outs.bbox_preds, outs.dir_preds,
            self.anchors, self.anchor_cls,
            batch.gt_boxes, batch.gt_labels, batch.gt_mask,
            self.model_cfg.head,
            assign=None if plan is None else plan.get("assign"),
        )
        det_total = det["loss_cls"] + det["loss_bbox"] + det["loss_dir"]
        adv_total, adv_logs = adversary_direct_terms(
            det, outs.adv_aux, epoch, self.train_cfg.regularization_weight
        )
        # NaN guard on the scalar: a NaN loss contributes zero gradient this
        # step and bumps the on-device counter (reference NaNDetectionHook
        # zeroes NaN losses, custom_hook.py:113-116)
        total = det_total + adv_enabled * adv_total
        is_nan = ~jnp.isfinite(total)
        total = jnp.where(is_nan, 0.0, total)
        logs = {
            "loss": det_total,
            "loss_cls": det["loss_cls"],
            "loss_bbox": det["loss_bbox"],
            "loss_dir": det["loss_dir"],
            "num_pos": det["num_pos"],
            **adv_logs,
        }
        return total, (mutated.get("batch_stats", batch_stats), logs, is_nan)

    def _grads(self, state: TrainState, batch: PointCloudBatch, epoch,
               plan=None):
        """Gradient half of the step: loss backward + NaN sanitation. Split
        from :meth:`_apply` so the shard_map'd DDP step can insert its
        cross-device pmean between the two."""
        grads, (new_stats, logs, is_nan) = jax.grad(self._loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, epoch,
            state.adversary_enabled, plan,
        )
        # Sanitize grads BEFORE the optimizers: zeroing the loss scalar does
        # not stop NaN/Inf gradients (0*NaN=NaN in the VJP), and one NaN leaf
        # would poison clip_by_global_norm and Adam's moments permanently —
        # the opposite of the reference NaNDetectionHook's recover-and-continue
        # (custom_hook.py:113-116). A non-finite gradient anywhere also counts
        # as a NaN step for the ladder.
        grads_finite = jax.tree_util.tree_reduce(
            lambda acc, g: acc & jnp.all(jnp.isfinite(g)), grads, jnp.bool_(True)
        )
        is_nan = is_nan | ~grads_finite
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
        )
        return grads, new_stats, logs, is_nan

    def _apply(self, state: TrainState, grads, new_stats, logs, is_nan):
        """Optimizer half of the step (deterministic given grads, so every
        DDP replica computes the identical update from the pmean'd grads)."""
        adv_mask = split_adversary_mask(state.params)

        det_updates, new_opt_det = self.det_tx.update(
            grads, state.opt_state_det, state.params
        )
        adv_updates, new_opt_adv = self.adv_tx.update(
            grads, state.opt_state_adv, state.params
        )
        updates = jax.tree_util.tree_map(
            lambda m, d, a: jnp.where(m, a, d), adv_mask, det_updates, adv_updates
        )
        # a NaN forward also taints BN running stats — keep the old ones
        new_stats = jax.tree_util.tree_map(
            lambda n, o: jnp.where(is_nan, o, n), new_stats, state.batch_stats
        )
        # NaN-ladder LR scale + freeze everything on a NaN step
        not_nan = 1.0 - is_nan.astype(jnp.float32)
        scale = state.lr_scale * not_nan
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(jnp.isfinite(u), u * scale, 0.0), updates
        )
        new_params = optax.apply_updates(state.params, updates)

        # per-iteration NaN ladder on device (LR x0.1 once at 10 total, kill
        # the adversary past 100 total — reference custom_hook.py:119-142)
        nan_i = is_nan.astype(jnp.int32)
        new_total, new_lr_scale, new_enabled = device_nan_ladder(
            state.nan_count, nan_i, state.lr_scale, state.adversary_enabled
        )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state_det=new_opt_det,
            opt_state_adv=new_opt_adv,
            step=state.step + 1,
            nan_count=new_total,
            consecutive_nan=(state.consecutive_nan + nan_i) * nan_i,
            lr_scale=new_lr_scale,
            adversary_enabled=new_enabled,
        )
        return new_state, logs

    def _step_impl(self, state: TrainState, batch: PointCloudBatch, epoch,
                   plan=None):
        plan = self._maybe_pgd(state, batch, plan)
        return self._apply(state, *self._grads(state, batch, epoch, plan))

    def _maybe_pgd(self, state: TrainState, batch: PointCloudBatch, plan):
        """PGD adversarial training: rewrite the plan's voxels with a K-step
        white-box attack at the current params before the gradient step."""
        if not self.train_cfg.pgd_steps:
            return plan
        if plan is None:
            raise ValueError(
                "pgd_steps > 0 needs the plan-fed path (the attack perturbs "
                "the plan's raw voxels) — feed train_step a host plan"
            )
        if self._pgd_fn is None:
            from ..eval.attacks import make_plan_attack

            self._pgd_fn = make_plan_attack(
                self, steps=self.train_cfg.pgd_steps,
                rel_step=self.train_cfg.pgd_rel_step, jit=False,
            )
        return self._pgd_fn(state.params, state.batch_stats, batch, plan)

    def _sharded_step_impl(self, state: TrainState, batch: PointCloudBatch,
                           epoch, plan=None):
        """Per-device body of the DDP step (runs inside shard_map).

        `batch` leaves are this device's batch rows; `plan` (if any) carries
        a leading device axis of local size 1 — each device consumes its OWN
        sub-plan, so the merged-batch index arrays (which have no batch axis
        and therefore cannot be GSPMD-sharded) partition by construction.
        """
        local_plan = None if plan is None else jax.tree_util.tree_map(
            lambda x: x[0], plan
        )
        # PGD-AT under DDP: each device attacks its OWN sub-plan (the attack
        # is per-frame, so this is exactly the global-batch attack partitioned)
        local_plan = self._maybe_pgd(state, batch, local_plan)
        grads, new_stats, logs, is_nan = self._grads(state, batch, epoch, local_plan)
        # Reference-DDP reductions (train.py:57-60 / torch DistributedDataParallel):
        # mean gradients; BN running stats and scalar logs are likewise
        # averaged so checkpoints/logs stay replica-consistent (per-device
        # normalization within the forward is the reference's non-sync-BN DDP
        # semantic). Any device's NaN counts as a global NaN step so the
        # ladder and the update freeze act identically on every replica.
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
        """True data-parallel train step over `mesh` (the production multi-chip
        path): each device runs the full step on its batch shard with its own
        host-built sub-plan (parallel.stack_plans + shard_stacked), then
        grads/BN-stats/logs are pmean'd over ICI. This partitions the work —
        per-device compiled FLOPs are ~1/n of the global step
        (tests/test_parallel.py asserts the ratio) — unlike replicating the
        plan under plain GSPMD jit, where the merged-batch index arrays (no
        batch axis) pin the whole encoder to replicated sharding. Semantics
        match the reference's DDP (train.py:57-60): per-rank index builds,
        per-rank batch statistics, gradient all-reduce.

        Works with plan=None too: each device then traces the inline index
        build on its local sub-batch.
        """
        from jax.sharding import PartitionSpec as P

        step = jax.shard_map(
            self._sharded_step_impl,
            mesh=mesh,
            in_specs=(P(), P(axis_name), P(), P(axis_name)),
            out_specs=(P(), P()),
            # the custom-VJP sparse conv ops defeat the replication checker;
            # replication of the outputs is guaranteed by the pmeans above
            check_vma=False,
        )
        kwargs = dict(donate_argnums=(0,)) if donate else {}
        self._train_step = jax.jit(step, **kwargs)
        return self

    def train_step(self, state: TrainState, batch: PointCloudBatch, epoch: int,
                   plan=None):
        if self._train_step is None:
            self.compile()
        return self._train_step(state, batch, jnp.float32(epoch), plan)

    def make_plan_builder(self):
        """Host-side plan builder for the input pipeline (run_training calls
        this and threads the plans into train_step)."""
        if isinstance(self.model_cfg, VoxelNetConfig):
            return HostPlanBuilder(self.model_cfg)
        from ..models.pointpillars import PointPillarsConfig

        if isinstance(self.model_cfg, PointPillarsConfig):
            return PillarPlanBuilder(self.model_cfg)
        return None

    # -- eval ---------------------------------------------------------------
    def forward_eval(self, state: TrainState, batch: PointCloudBatch,
                     attack: bool = False, plan=None):
        """Inference forward. `plan`: optional host-built sparse plan (no
        assignment needed) so serving keeps the device step sort-free too."""
        if self._eval_step is None:
            self._eval_step = jax.jit(
                lambda p, bs, pts, m, pl: self.model.apply(
                    {"params": p, "batch_stats": bs}, pts, m, False, 100, False,
                    -1.0, pl,
                ),
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
