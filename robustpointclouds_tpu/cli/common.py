"""Shared CLI machinery: training driver, evaluation driver, metric logging.

The reference spreads this across mmengine's Runner plus per-script
monkeypatching (train.py:117-132, train_kitti_3class_adversarial.py:57-274);
here it is one explicit loop: data -> fused jit step -> NaN ladder -> periodic
val/checkpoint, with the perturbation-metrics CSV dump matching the
reference's `save_l2_norms` schema (voxel_perturber.py:411-432).
"""
from __future__ import annotations

import csv
import json
import os
import time
from typing import Callable, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import synthetic_kitti_batch
from ..data.structures import PointCloudBatch
from ..eval import KittiMetric
from ..models import anchor_head_predict
from ..train import NaNLadder, Trainer
from ..train.checkpoint import CheckpointManager
from ..train.hooks import reinit_adversary_params


class MetricsLogger:
    """Accumulates per-step scalars; dumps the reference-compatible CSVs and
    (by default) TensorBoard scalar events — the reference's TensorBoard
    backend (adversarial-second_strong_v2.py:207-213)."""

    def __init__(self, work_dir: str, tensorboard: bool = True):
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.l2_norms: List[float] = []
        self.l2_percentages: List[float] = []
        self.rows: List[Dict[str, float]] = []
        self._tb = None
        if tensorboard:
            from ..core.tensorboard import TensorBoardWriter

            self._tb = TensorBoardWriter(os.path.join(work_dir, "tf_logs"))
        self._step = 0

    def log_step(self, logs: Dict, step: Optional[int] = None):
        row = {k: float(v) for k, v in logs.items() if jnp.ndim(v) == 0}
        self.rows.append(row)
        if "perturbation_l2_norm" in row:
            self.l2_norms.append(row["perturbation_l2_norm"])
            self.l2_percentages.append(row.get("l2_percentage", 0.0))
        if self._tb is not None:
            s = step if step is not None else self._step
            for k, v in row.items():
                self._tb.add_scalar(f"train/{k}", v, s)
            self._tb.flush()
        self._step = (step if step is not None else self._step) + 1

    def save_l2_norms(self, filename: str = "l2_norms.csv"):
        path = os.path.join(self.work_dir, filename)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["L2 Norm", "L2 Percentage", "Constraint Violations"])
            for i, n in enumerate(self.l2_norms):
                pct = self.l2_percentages[i] if i < len(self.l2_percentages) else 0.0
                w.writerow([n, pct, 0.0])
        # detailed companion (reference voxel_perturber.py:421-426 writes a
        # *_detailed.csv with the per-step perturbation statistics)
        detailed = [
            r for r in self.rows if "perturbation_l2_norm" in r
        ]
        if detailed:
            fields = [
                "l2_norm", "l2_percentage", "max_perturbation",
                "mean_perturbation", "std_perturbation", "constraint_violation",
            ]
            dpath = path.replace(".csv", "_detailed.csv")
            with open(dpath, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=fields)
                w.writeheader()
                for r in detailed:
                    w.writerow({
                        "l2_norm": r.get("perturbation_l2_norm", 0.0),
                        "l2_percentage": r.get("l2_percentage", 0.0),
                        "max_perturbation": r.get("max_perturbation", 0.0),
                        "mean_perturbation": r.get("mean_perturbation", 0.0),
                        "std_perturbation": r.get("std_perturbation", 0.0),
                        "constraint_violation": 0.0,
                    })
        return path

    def save_history(self, filename: str = "train_log.jsonl"):
        path = os.path.join(self.work_dir, filename)
        with open(path, "w") as f:
            for r in self.rows:
                f.write(json.dumps(r) + "\n")
        return path


def synthetic_loader(
    batch_size: int, steps_per_epoch: int, num_points: int = 20000, seed: int = 0,
    point_range=(0.0, -40.0, -3.0, 70.4, 40.0, 1.0),
) -> Callable[[int], Iterator[PointCloudBatch]]:
    def epoch_iter(epoch: int):
        rng = np.random.RandomState(seed * 10007 + epoch)
        for _ in range(steps_per_epoch):
            b = synthetic_kitti_batch(
                rng, batch_size=batch_size, num_points=num_points,
                point_range=point_range,
            )
            yield PointCloudBatch(*(jnp.asarray(x) for x in b))

    return epoch_iter


def prefetch_iterator(it: Iterator, depth: int = 2) -> Iterator:
    """Run an iterator in a background thread with a small bounded queue.

    JAX dispatch is async, but the HOST work of producing the next batch
    (file IO, augmentation, padding, h2d feed) would otherwise serialize with
    enqueueing the next step. The reference gets this from torch DataLoader
    workers (num_workers=4); a single thread + queue(depth) is enough here
    because the heavy per-sample work already happens in the native threaded
    loader (data/native.py).
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        # a producer failure (loader IO, plan build) must SURFACE in the
        # consumer, not silently end the epoch after k steps — ship the
        # exception through the queue and re-raise it on the main thread
        try:
            for item in it:
                q.put(item)
            q.put(sentinel)
        except BaseException as e:  # noqa: BLE001 - transported, not handled
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def tiny_voxelnet_cfg():
    """Shrunken-grid smoke config shared by the CLIs' --tiny flags: real
    SECOND channel widths on a 16 m grid (compiles in seconds on CPU)."""
    from ..models import VoxelNetConfig
    from ..ops.voxelize import VoxelizerConfig

    return VoxelNetConfig(
        voxelizer=VoxelizerConfig(
            point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
            voxel_size=(0.5, 0.5, 0.125), max_points_per_voxel=3,
            max_voxels=512,
        ),
        anchor_ranges=tuple(
            (0, -8.0, -0.6, 16.0, 8.0, -0.6) for _ in range(3)
        ),
    )


_PLAN_POOLS: Dict[int, object] = {}


def _shared_plan_pool(workers: int):
    """Process-lifetime thread pool for per-device sub-plan builds: one pool
    per size, reused across run_training calls so an exception out of a
    training loop never strands a dead pool's worker threads (there is no
    per-run shutdown to miss)."""
    pool = _PLAN_POOLS.get(workers)
    if pool is None:
        from concurrent.futures import ThreadPoolExecutor

        pool = _PLAN_POOLS[workers] = ThreadPoolExecutor(max_workers=workers)
    return pool


def run_training(
    trainer: Trainer,
    epoch_loader: Callable[[int], Iterator[PointCloudBatch]],
    work_dir: str,
    max_epochs: int,
    val_interval: int = 5,
    val_loader: Optional[Callable[[], Iterator[PointCloudBatch]]] = None,
    resume: bool = False,
    log_interval: int = 50,
    checkpoint_interval: int = 5,
    max_keep: int = 10,
    seed: int = 0,
    profile_dir: Optional[str] = None,
    load_from: Optional[str] = None,
    mesh=None,
) -> Dict:
    """The full training loop (reference scenario:
    train_kitti_3class_adversarial.py --validate).

    `load_from`: warm start params/batch_stats from a zoo checkpoint (.pth,
    converted on the fly) or an orbax dir — the reference's `load_from` config
    key. `mesh`: a jax.sharding.Mesh with a 'data' axis — batches are sharded
    over it and params replicated; XLA inserts the gradient psum over ICI
    (the reference's DDP/NCCL `--launcher` equivalent, SURVEY.md §2c).
    """
    os.makedirs(work_dir, exist_ok=True)
    logger = MetricsLogger(work_dir)
    ladder = NaNLadder()

    # multi-host (multi-process) run: every process executes this loop with
    # the same seed; batches are sliced to this host's rows and assembled
    # into global arrays (parallel/multihost.py; reference slurm/mpi/pytorch
    # launchers, train.py:56-64)
    n_proc = jax.process_count()
    multihost = mesh is not None and n_proc > 1
    is_primary = jax.process_index() == 0

    ckpt = CheckpointManager(work_dir, max_to_keep=max_keep,
                             save_interval_epochs=checkpoint_interval,
                             single_process_io=multihost)

    shard = None
    if mesh is not None:
        from ..parallel.mesh import (
            replicate,
            shard_batch,
            shard_stacked,
            stack_plans,
        )

        if multihost:
            from ..parallel.multihost import globalize, host_rows

            def shard(batch):
                rows = host_rows(batch.points.shape[0])
                local = jax.tree_util.tree_map(
                    lambda x: np.asarray(x)[rows], batch
                )
                return globalize(local, mesh)
        else:
            def shard(batch):
                return shard_batch(batch, mesh)

    # DDP over the mesh (reference --launcher pytorch, train.py:57-60): each
    # device gets its own host-built sub-plan and the shard_map'd step pmeans
    # grads — true work partitioning. Trainers without compile_sharded fall
    # back to the GSPMD global-view step with a replicated plan.
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    use_ddp = n_dev > 1 and hasattr(trainer, "compile_sharded")

    # Host-side sparse-plan pipeline: the plan (voxelization + every encoder
    # index — the step's structure sorts) is a pure function of the points,
    # so the prefetch thread builds it on the CPU backend and device_puts it;
    # the device step then runs sort-free (models/voxelnet.build_plan).
    plan_builder = getattr(trainer, "make_plan_builder", lambda: None)()
    plan_ms = {"last": 0.0}  # input-pipeline observability (logged below)
    # Per-device sub-plans are independent pure functions of disjoint batch
    # rows, and both builder backends release the GIL (ctypes native / XLA-CPU
    # execute), so a thread pool builds them concurrently — serial builds
    # would scale the prefetch latency by n_dev and break the "plan build
    # hides under one step" overlap on real multi-core hosts. On a 1-core
    # host this degrades gracefully to sequential.
    plan_pool = None
    if plan_builder is not None and use_ddp:
        plan_pool = _shared_plan_pool(
            max(1, min(n_dev, (os.cpu_count() or 1)))
        )

    def _with_plans(it):
        for batch in it:
            plan = None
            if plan_builder is not None:
                # timed span = the BUILD only (the device_put below is an
                # async transfer that overlaps like any input); the logged
                # value lags the consumed step by the prefetch queue depth
                t0 = time.time()
                args = (
                    np.asarray(batch.points), np.asarray(batch.points_mask),
                    np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
                    np.asarray(batch.gt_mask),
                )
                if use_ddp:
                    # one sub-plan per device (reference DDP: every rank runs
                    # its own index build on its local batch)
                    b = args[0].shape[0]
                    if b % n_dev:
                        raise ValueError(
                            f"batch size {b} not divisible by the {n_dev}-device"
                            " mesh — pick batch_size = k * n_devices"
                        )
                    k = b // n_dev

                    def _sub_plan(i):
                        return plan_builder(
                            *(a[i * k:(i + 1) * k] for a in args)
                        )

                    if multihost:
                        # build only this host's devices' sub-plans, then
                        # assemble the global stacked plan across processes
                        from ..parallel.multihost import (
                            globalize_stacked_plans,
                        )

                        my = jax.process_index()
                        my_rows = [
                            i for i, d in enumerate(mesh.devices.flat)
                            if d.process_index == my
                        ]
                        local_plans = list(plan_pool.map(_sub_plan, my_rows))
                        plan_ms["last"] = (time.time() - t0) * 1000
                        plan = globalize_stacked_plans(local_plans, mesh)
                    else:
                        plan = stack_plans(
                            list(plan_pool.map(_sub_plan, range(n_dev)))
                        )
                        plan_ms["last"] = (time.time() - t0) * 1000
                        plan = shard_stacked(plan, mesh)
                else:
                    plan = plan_builder(*args)
                    plan_ms["last"] = (time.time() - t0) * 1000
                    if mesh is not None:
                        plan = replicate(plan, mesh)
                    else:
                        plan = jax.device_put(plan, jax.devices()[0])
            yield batch, plan

    rng = jax.random.PRNGKey(seed)
    first_batch = next(iter(epoch_loader(0)))
    state = trainer.init_state(rng, first_batch)
    if load_from:
        from ..train.checkpoint import load_pretrained

        state = load_pretrained(state, load_from)
    if mesh is not None:
        if multihost:
            from ..parallel.multihost import replicate_multihost

            state = replicate_multihost(
                jax.tree_util.tree_map(np.asarray, state), mesh
            )
        else:
            state = replicate(state, mesh)
    start_epoch = 0
    if resume:
        latest = ckpt.latest_epoch()
        if latest is not None:
            state = ckpt.restore(state)
            start_epoch = latest + 1
            print(f"[resume] restored epoch {latest} from {work_dir}")
        else:
            print(f"[resume] no checkpoint in {work_dir}, starting fresh")
    if use_ddp:
        # the stacked per-device sub-plans built above only make sense to the
        # shard_map'd DDP step (each device peels its own sub-plan)
        trainer.compile_sharded(mesh, donate=False)
    else:
        trainer.compile(donate=False)

    if multihost:
        # Gloo (the CPU cross-process collective backend) gives rendezvous a
        # fixed ~30 s timeout, but each process compiles the step
        # independently and the skew on a shared host exceeds that: the first
        # process to finish would block in rendezvous and die while its peer
        # still compiles. AOT-compile here (fills the persistent compile
        # cache; no collectives run during compilation), then barrier on the
        # coordination service — which has a configurable timeout — so every
        # process enters the first collective together. On TPU pods the same
        # ordering is harmless.
        warm_b, warm_p = next(iter(_with_plans(epoch_loader(start_epoch))))
        if shard is not None:
            warm_b = shard(warm_b)
        trainer._train_step.lower(
            state, warm_b, jnp.float32(start_epoch), warm_p
        ).compile()
        from jax._src import distributed as _jax_dist

        _jax_dist.global_state.client.wait_at_barrier(
            "rpc_train_step_compiled", timeout_in_ms=3_600_000
        )
        print(f"[multihost] process {jax.process_index()}: step compiled, "
              "barrier passed")

    history = {}
    t_start = time.time()
    for epoch in range(start_epoch, max_epochs):
        epoch_t0 = time.time()
        n_frames = 0
        for i, (batch, plan) in enumerate(
            prefetch_iterator(_with_plans(epoch_loader(epoch)))
        ):
            if shard is not None:
                batch = shard(batch)
            # device-level trace of steps 10-13 of the first epoch (the
            # reference's IterTimerHook equivalent, plus full XLA timelines)
            if profile_dir and epoch == start_epoch and i == 10:
                jax.profiler.start_trace(profile_dir)
            state, logs = trainer.train_step(state, batch, epoch=epoch, plan=plan)
            if profile_dir and epoch == start_epoch and i == 13:
                jax.block_until_ready(logs["loss"])
                jax.profiler.stop_trace()
                print(f"[profile] wrote trace to {profile_dir}")
            n_frames += batch.points.shape[0]
            if (i + 1) % log_interval == 0 or i == 0:
                logs = {k: float(v) for k, v in logs.items()}
                if plan_builder is not None:
                    # host plan build (prefetch-thread) time: must sit below
                    # the step time for the input pipeline to be free
                    logs["plan_build_ms"] = round(plan_ms["last"], 1)
                logger.log_step(logs)
                state = ladder.update(
                    state,
                    adversary_reinit_fn=lambda p: reinit_adversary_params(
                        p, jax.random.fold_in(rng, epoch)
                    ),
                )
                print(
                    f"[epoch {epoch} iter {i + 1}] "
                    + " ".join(f"{k}={v:.4f}" for k, v in sorted(logs.items()))
                )
                if ladder.should_stop:
                    print("[NaN ladder] too many consecutive NaNs — stopping")
                    break
        dt = time.time() - epoch_t0
        print(f"[epoch {epoch}] done in {dt:.1f}s ({n_frames / max(dt, 1e-9):.2f} frames/s)")
        # multihost: state is replicated, so process 0 holds the full copy —
        # it alone writes checkpoints/metrics (reference: rank-0 CheckpointHook)
        ckpt_state = (
            jax.tree_util.tree_map(np.asarray, state) if multihost else state
        )
        if is_primary:
            ckpt.maybe_save(epoch, ckpt_state)
        if val_loader is not None and (epoch + 1) % val_interval == 0:
            if multihost:
                # validation is a single-process forward; the skeleton runs
                # it on process 0 with the host-materialized state while the
                # other processes proceed to the next epoch's collectives
                if is_primary:
                    print("[val] multihost: validation runs on process 0 only")
                    metrics = run_evaluation(
                        trainer, ckpt_state, val_loader(), attack=False
                    )
                else:
                    metrics = None
            else:
                metrics = run_evaluation(trainer, state, val_loader(), attack=False)
            if metrics is not None:
                history[f"val_epoch{epoch}"] = metrics
                print(f"[val epoch {epoch}] {metrics}")
                # keep the best-mAP checkpoint (reference CheckpointHook
                # save_best='...mAP', adversarial-centerpoint_voxel-nuscenes.py:98)
                key = "mAP_3d_moderate" if "mAP_3d_moderate" in metrics else "mAP"
                if key in metrics and ckpt.save_best(metrics[key], ckpt_state, epoch):
                    print(f"[ckpt] new best {key}={metrics[key]:.2f} (epoch {epoch})")
        if ladder.should_stop:
            break

    state_final = (
        jax.tree_util.tree_map(np.asarray, state) if multihost else state
    )
    if is_primary:
        ckpt.save(max_epochs - 1, state_final)
    logger.save_l2_norms()
    logger.save_history()
    if multihost:
        # exit together: process 0 writes checkpoints/metrics after the last
        # step, and a process that returns early trips the coordination
        # service's (short) shutdown barrier for everyone
        from jax._src import distributed as _jax_dist

        _jax_dist.global_state.client.wait_at_barrier(
            "rpc_train_done", timeout_in_ms=3_600_000
        )
    history["wall_time_s"] = time.time() - t_start
    history["final_epoch"] = epoch
    return {"state": state, "history": history, "work_dir": work_dir}


def _tta_merge_fn(nms_thr: float):
    """Merge original + unflipped-flip detections: concat, score-sort, and
    class-aware rotated-BEV NMS (mmdet3d merge_aug_bboxes_3d semantics)."""
    import jax.numpy as jnp

    from ..ops import boxes as box_ops
    from ..ops.nms import _suppression_sweep

    def one(boxes, scores, labels, valid):
        order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
        b, s, l, v = boxes[order], scores[order], labels[order], valid[order]
        bev = box_ops.boxes3d_to_bev(b)
        iou = box_ops.rotated_bev_iou(bev, bev)
        same = l[:, None] == l[None, :]
        keep = _suppression_sweep(jnp.where(same, iou, 0.0), v, nms_thr)
        return b, s, l, v & keep

    return jax.jit(jax.vmap(one))


def run_evaluation(
    trainer: Trainer,
    state,
    batches: Iterator[PointCloudBatch],
    attack: bool = False,
    dump_path: Optional[str] = None,
    tta: bool = False,
    attack_method: str = "learned",
    attack_steps: int = 10,
) -> Dict[str, float]:
    """Clean or attack-mode evaluation -> KITTI AP dict.

    attack=True forces the adversary with eval-attack bounds at test time —
    the reference's `evaluate_kitti_adversarial_attack` measurement
    (patch_model_for_adversarial_eval, evaluate_kitti_adversarial_attack.py:23-62).
    attack_method: "learned" (the reference's amortized adversary), or the
    white-box gradient baselines "pgd"/"fgsm" (eval/attacks.py) under the
    same physical envelope — these need a plan-fed anchor-head trainer.
    dump_path: write per-frame detections (frame_id, boxes_3d, scores,
    labels) as a pickle — the reference's `pklfile_prefix` result dump
    (testUpdated.bat:12) used for offline analysis / KITTI submission prep.
    tta=True runs the y-flip test-time augmentation: a second forward on the
    mirrored cloud, detections unflipped and merged by class-aware rotated
    NMS — the reference test pipeline's MultiScaleFlipAug3D with actual
    flipping enabled (configs/_base_/kitti-3d-car.py:89-103 wraps the test
    pipeline in it; the committed config runs it with flip=False).
    """
    # StrongTrainer wraps the base detector config under .base
    cfg = getattr(trainer.model_cfg, "base", trainer.model_cfg)
    # 2d/aos compute only when the loader supplies image-plane metas (calib,
    # GT 2D boxes); synthetic/LiDAR-only runs degrade to 3d/bev
    metric = KittiMetric(
        classes=tuple(cfg.class_names), metrics=("3d", "bev", "2d", "aos")
    )
    head = cfg.head
    predict = jax.jit(
        lambda cls, box, d: anchor_head_predict(cls, box, d, trainer.anchors, head)
    )
    # serving-path plans: same sort-free device forward as training (no GT
    # needed); only for trainers whose forward_eval takes a plan
    plan_builder = None
    if isinstance(trainer, Trainer):
        plan_builder = trainer.make_plan_builder()

    attack_fn = None
    if attack and attack_method != "learned":
        if plan_builder is None:
            raise ValueError(
                f"attack_method={attack_method!r} needs a plan-fed anchor-head "
                "trainer (gradients are taken w.r.t. the plan's voxels)"
            )
        from ..eval.attacks import make_plan_attack

        if attack_method == "fgsm":
            attack_fn = make_plan_attack(trainer, steps=1, rel_step=1.0)
        elif attack_method == "pgd":
            attack_fn = make_plan_attack(trainer, steps=attack_steps)
        else:
            raise ValueError(f"unknown attack_method {attack_method!r}")

    def _eval_plan(b):
        if plan_builder is None:
            return None
        plan = plan_builder(np.asarray(b.points), np.asarray(b.points_mask))
        # keep leaves UNCOMMITTED (numpy) so the eval jit is free to place
        # them against however params are laid out (replicated under a mesh)
        return jax.tree_util.tree_map(np.asarray, plan)
    merge = _tta_merge_fn(getattr(head, "nms_iou_threshold", 0.01)) if tta else None
    n = 0
    dumped = []
    for item in batches:
        # loaders may yield (batch, metas) with per-row gt difficulty and a
        # validity flag (False on rows padding the last short batch — those
        # must not be scored twice), or a bare PointCloudBatch (itself a
        # NamedTuple, so isinstance(tuple) alone can't distinguish the two)
        if isinstance(item, PointCloudBatch):
            batch, metas = item, None
        else:
            batch, metas = item
        kw = {}
        if plan_builder is not None:
            kw["plan"] = _eval_plan(batch)
        if attack_fn is not None:
            # gradient attack rewrites the plan's voxels; the forward itself
            # then runs CLEAN (the perturbation is already in the input)
            kw["plan"] = attack_fn(state.params, state.batch_stats, batch,
                                   kw["plan"])
            outs = trainer.forward_eval(state, batch, attack=False, **kw)
        else:
            outs = trainer.forward_eval(state, batch, attack=attack, **kw)
        boxes, scores, labels, mask = predict(outs.cls_scores, outs.bbox_preds, outs.dir_preds)
        if tta:
            flipped = batch._replace(
                points=batch.points.at[..., 1].multiply(-1.0)
            )
            kw_f = {}
            if plan_builder is not None:
                kw_f["plan"] = _eval_plan(flipped)
            if attack_fn is not None:
                # the attack loss needs GT in the flipped frame (clean TTA
                # never reads GT, so the flip above only mirrors the points)
                flipped_gt = flipped._replace(
                    gt_boxes=jnp.asarray(batch.gt_boxes)
                    .at[..., 1].multiply(-1.0).at[..., 6].multiply(-1.0)
                )
                kw_f["plan"] = attack_fn(state.params, state.batch_stats,
                                         flipped_gt, kw_f["plan"])
                outs_f = trainer.forward_eval(state, flipped, attack=False, **kw_f)
            else:
                outs_f = trainer.forward_eval(state, flipped, attack=attack, **kw_f)
            bf, sf, lf, mf = predict(
                outs_f.cls_scores, outs_f.bbox_preds, outs_f.dir_preds
            )
            bf = bf.at[..., 1].multiply(-1.0).at[..., 6].multiply(-1.0)
            boxes, scores, labels, mask = merge(
                jnp.concatenate([boxes, bf], axis=1),
                jnp.concatenate([scores, sf], axis=1),
                jnp.concatenate([labels, lf], axis=1),
                jnp.concatenate([mask, mf], axis=1),
            )
        for b in range(batch.points.shape[0]):
            meta = metas[b] if metas is not None else {}
            if not meta.get("valid", True):
                continue
            metric.update_from_arrays(
                gt_boxes=np.asarray(batch.gt_boxes[b]),
                gt_labels=np.asarray(batch.gt_labels[b]),
                gt_mask=np.asarray(batch.gt_mask[b]),
                dt_boxes=np.asarray(boxes[b]),
                dt_scores=np.asarray(scores[b]),
                dt_labels=np.asarray(labels[b]),
                dt_mask=np.asarray(mask[b]),
                gt_difficulty=meta.get("gt_difficulty"),
                meta=meta,
            )
            if dump_path is not None:
                m = np.asarray(mask[b], bool)
                dumped.append({
                    "frame_id": meta.get("frame_id", str(n)),
                    "boxes_3d": np.asarray(boxes[b])[m],
                    "scores": np.asarray(scores[b])[m],
                    "labels": np.asarray(labels[b])[m],
                })
            n += 1
    results = metric.compute()
    results["num_frames"] = n
    if dump_path is not None:
        import pickle

        os.makedirs(os.path.dirname(dump_path) or ".", exist_ok=True)
        with open(dump_path, "wb") as f:
            pickle.dump(dumped, f)
        print(f"[dump] wrote {len(dumped)} frames of detections to {dump_path}")
    return results
