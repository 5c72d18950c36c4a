"""Pillar-family step breakdown on real HW: where do 273 ms go?

First on-chip pillar number (work_dirs/BENCH_pillars_noplan.out, 2026-08-19):
21.97 f/s at B=6, 273 ms/step, MFU 0.0038 — yet the family exists BECAUSE its
compute is dense MXU work. XLA's own flop estimate (~200 GFLOP/step) at even
30% MFU would be ~3 ms, so ~270 ms of the step is in the non-MXU stack. This
bench separates the suspects in ONE process (bench.py scan methodology: jit
of lax.scan, inputs perturbed by a carry-dependent epsilon so no per-step
work can hoist or overlap across iterations):

  full      control — the full adversarial train step (cache hit from the
            suite's bench_pointpillars BENCH_NO_PLAN run)
  noadv     full step, adversary=None config: full - noadv = adversary cost
            (the perturber MLP + 2 masked BNs run on B*V*T = 3.07M rows of
            which only ~120k are real points — a ~25x padding-waste suspect)
  fwd       model.apply forward only (train=True): isolates fwd vs bwd+opt
  fwdloss   loss value only (fwd + on-device anchor assign + targets +
            focal/smooth-L1): fwdloss - fwd = assign+targets+losses;
            full - fwdloss = backward + both optimizers
  voxelize  voxelize_batch alone (the on-device 120k-point pillarization sort)
  trunk     dense backbone+FPN+head fwd+bwd alone on a carried BEV canvas —
            the MXU reality check for the architecture's intended cost

Usage: python -m robustpointclouds_tpu.tools.bench_pillar_breakdown
Env: BENCH_TINY=1 CPU smoke, PB_ITERS (default 10).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    print("backend:", jax.default_backend(), flush=True)

    from robustpointclouds_tpu.data import synthetic_kitti_batch
    from robustpointclouds_tpu.data.structures import PointCloudBatch
    from robustpointclouds_tpu.models import PointPillarsConfig
    from robustpointclouds_tpu.nn import Anchor3DHead, SECONDBackbone, SECONDFPN
    from robustpointclouds_tpu.ops.voxelize import voxelize_batch
    from robustpointclouds_tpu.train import TrainConfig, Trainer

    iters = int(os.environ.get("PB_ITERS", "10"))
    batch_size = 6
    model_cfg = PointPillarsConfig()
    num_points = 20000
    if os.environ.get("BENCH_TINY", "0") == "1":
        from robustpointclouds_tpu.ops.voxelize import VoxelizerConfig

        model_cfg = PointPillarsConfig(
            voxelizer=VoxelizerConfig(
                point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
                voxel_size=(0.5, 0.5, 4.0),
                max_points_per_voxel=8, max_voxels=128,
            ),
            anchor_ranges=(
                (0, -8.0, -1.78, 16.0, 8.0, -1.78),
                (0, -8.0, -0.6, 16.0, 8.0, -0.6),
                (0, -8.0, -0.6, 16.0, 8.0, -0.6),
            ),
        )
        num_points = 512

    rng = np.random.RandomState(0)
    batch_np = synthetic_kitti_batch(
        rng, batch_size=batch_size, num_points=num_points, max_gt=20,
        point_range=model_cfg.voxelizer.point_cloud_range,
    )
    batch = PointCloudBatch(*(jnp.asarray(x) for x in batch_np))

    trainer = Trainer(model_cfg=model_cfg, train_cfg=TrainConfig())
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    results = {}

    def timed(name, fn, *args, donate0=False):
        kw = dict(donate_argnums=(0,)) if donate0 else {}
        run = jax.jit(fn, **kw)
        out = run(*args)
        jax.block_until_ready(out)  # compile + warmup
        if donate0:
            # arg 0 (the train state) was donated by the warmup — feed the
            # warmup's output state to the timed call instead (bench.py form)
            args = (out[0],) + args[1:]
        t0 = time.time()
        out = run(*args)
        jax.block_until_ready(out)
        dt = time.time() - t0
        results[name] = round(1e3 * dt / iters, 1)
        print(json.dumps({name: results[name]}), flush=True)

    def scan_full(trn):
        def fn(state, batch):
            def body(carry, _):
                st, eps = carry
                b = batch._replace(points=batch.points + eps * 1e-30)
                st2, logs = trn._step_impl(st, b, jnp.float32(5), None)
                return (st2, logs["loss"]), logs["loss"]

            (st, _), losses = jax.lax.scan(
                body, (state, jnp.float32(0)), None, length=iters)
            return st, losses
        return fn

    # 1. full step (control — reproduces bench_pointpillars BENCH_NO_PLAN)
    timed("full", scan_full(trainer), state, batch, donate0=True)

    # 2. adversary off (separate params/opt trees — an independent model)
    cfg_noadv = model_cfg._replace(adversary=None)
    trainer2 = Trainer(model_cfg=cfg_noadv, train_cfg=TrainConfig())
    state2 = trainer2.init_state(jax.random.PRNGKey(0), batch)
    timed("noadv", scan_full(trainer2), state2, batch, donate0=True)

    # 3. forward only (train-mode apply, adversary active at epoch 5)
    def scan_fwd(params, batch_stats, batch):
        def body(eps, _):
            outs, _ = trainer.model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch.points + eps * 1e-30, batch.points_mask, True,
                jnp.float32(5), False, -1.0, None, mutable=["batch_stats"],
            )
            s = jnp.sum(outs.cls_scores.astype(jnp.float32))
            return s, s

        _, ys = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return ys

    timed("fwd", scan_fwd, state.params, state.batch_stats, batch)

    # 4. loss value only (fwd + on-device assign + targets + losses)
    def scan_fwdloss(params, batch_stats, batch):
        def body(eps, _):
            b = batch._replace(points=batch.points + eps * 1e-30)
            total, _ = trainer._loss_fn(
                params, batch_stats, b, jnp.float32(5), jnp.float32(1.0), None)
            return total, total

        _, ys = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return ys

    timed("fwdloss", scan_fwdloss, state.params, state.batch_stats, batch)

    # 5. voxelize alone (the on-device pillarization sort)
    def scan_vox(batch):
        def body(eps, _):
            res = voxelize_batch(
                batch.points[..., :4] + eps * 1e-30, batch.points_mask,
                model_cfg.voxelizer)
            s = jnp.sum(res.voxels)
            return s, s

        _, ys = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return ys

    timed("voxelize", scan_vox, batch)

    # 6. dense trunk fwd+bwd alone on a carried canvas (the MXU reality check)
    c = model_cfg
    dt_ = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
    backbone = SECONDBackbone(
        out_channels=tuple(c.backbone_channels),
        layer_nums=tuple(c.backbone_layers),
        layer_strides=tuple(c.backbone_strides), dtype=dt_)
    neck = SECONDFPN(out_channels=tuple(c.fpn_channels),
                     upsample_strides=tuple(c.fpn_strides), dtype=dt_)
    head = Anchor3DHead(
        num_classes=c.num_classes,
        num_anchors_per_loc=len(c.anchor_sizes) * len(c.anchor_rotations),
        dtype=dt_)
    nx, ny, _ = c.voxelizer.grid_size
    bev0 = jnp.asarray(
        rng.randn(batch_size, ny, nx, c.pfn_channels), jnp.float32)
    tp = {"backbone": state.params["backbone"], "neck": state.params["neck"],
          "bbox_head": state.params["bbox_head"]}
    tbs = {"backbone": state.batch_stats["backbone"],
           "neck": state.batch_stats["neck"]}

    def trunk_loss(p, bs, bev):
        outs, _ = backbone.apply(
            {"params": p["backbone"], "batch_stats": bs["backbone"]},
            bev.astype(dt_), True, mutable=["batch_stats"])
        fused, _ = neck.apply(
            {"params": p["neck"], "batch_stats": bs["neck"]},
            outs, True, mutable=["batch_stats"])
        cls_s, box_p, dir_p = head.apply({"params": p["bbox_head"]}, fused)
        return (jnp.sum(cls_s.astype(jnp.float32) ** 2)
                + jnp.sum(box_p.astype(jnp.float32) ** 2)
                + jnp.sum(dir_p.astype(jnp.float32) ** 2))

    def scan_trunk(p, bs, bev):
        def body(eps, _):
            g = jax.grad(trunk_loss)(p, bs, bev + eps * 1e-30)
            s = jnp.sum(g["bbox_head"]["conv_cls"]["bias"].astype(jnp.float32))
            return s, s

        _, ys = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return ys

    timed("trunk", scan_trunk, tp, tbs, bev0)

    d = results
    print(json.dumps({
        "all": d,
        "derived": {
            "adversary_ms": round(d["full"] - d["noadv"], 1),
            "assign_targets_losses_ms": round(d["fwdloss"] - d["fwd"], 1),
            "backward_opt_ms": round(d["full"] - d["fwdloss"], 1),
        },
    }))


if __name__ == "__main__":
    main()
