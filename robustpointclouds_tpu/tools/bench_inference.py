"""Serving-path bench: end-to-end detection latency/throughput on real HW.

Measures the full inference pipeline — (host sparse plan) -> forward ->
box decode -> per-class rotated NMS — as ONE jit region, timed with the
scan-carry methodology (each iteration's input is perturbed by a function of
the previous output, so iterations cannot overlap or hoist; per-dispatch
timing over the axon tunnel measures RPC latency, not the chip).

Reports per-frame device latency at B=1 (online serving) and B=6 (batched),
plan-fed (production input pipeline) and inline (standalone device).

Usage: python -m robustpointclouds_tpu.tools.bench_inference
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def measure(batch_size, plan_mode, iters=10):
    import jax
    import jax.numpy as jnp

    from robustpointclouds_tpu.data import synthetic_kitti_batch
    from robustpointclouds_tpu.data.structures import PointCloudBatch
    from robustpointclouds_tpu.models import VoxelNetConfig, anchor_head_predict
    from robustpointclouds_tpu.train import TrainConfig, Trainer
    from robustpointclouds_tpu.train.loop import HostPlanBuilder

    model_cfg = VoxelNetConfig()
    num_points = 20000
    if os.environ.get("BENCH_TINY", "0") == "1":
        from robustpointclouds_tpu.ops.voxelize import VoxelizerConfig

        model_cfg = VoxelNetConfig(
            voxelizer=VoxelizerConfig(
                point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
                voxel_size=(0.5, 0.5, 0.125),
                max_points_per_voxel=3, max_voxels=256,
            ),
            anchor_ranges=((0, -8.0, -0.6, 16.0, 8.0, -0.6),) * 3,
        )
        num_points = 512
    trainer = Trainer(model_cfg=model_cfg, train_cfg=TrainConfig())
    rng = np.random.RandomState(0)
    batch_np = synthetic_kitti_batch(
        rng, batch_size=batch_size, num_points=num_points,
        point_range=model_cfg.voxelizer.point_cloud_range,
    )
    batch = PointCloudBatch(*(jnp.asarray(x) for x in batch_np))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    plans = None
    host_ms = None
    if plan_mode:
        builder = HostPlanBuilder(model_cfg)
        plan_cpu = builder(batch_np.points, batch_np.points_mask)
        jax.block_until_ready(plan_cpu)
        t0 = time.time()
        plan_cpu = builder(batch_np.points, batch_np.points_mask)
        jax.block_until_ready(plan_cpu)
        host_ms = round((time.time() - t0) * 1000, 1)
        # steady-state xs form: one fresh plan per scan step (see bench.py —
        # a loop-INVARIANT plan operand measured 12-26 s/step on v5e)
        plans = jax.device_put(
            jax.tree_util.tree_map(
                lambda x: np.stack(
                    [np.asarray(x) * (1 + 1e-7 * i)
                     if np.issubdtype(np.asarray(x).dtype, np.floating)
                     else np.asarray(x) for i in range(iters)]),
                plan_cpu),
            jax.devices()[0])

    def predict_scan(params, batch_stats, batch, plans):
        def one(pts, pl):
            outs = trainer.model.apply(
                {"params": params, "batch_stats": batch_stats},
                pts, batch.points_mask, False, 100, False, -1.0, pl,
            )
            return anchor_head_predict(
                outs.cls_scores, outs.bbox_preds, outs.dir_preds,
                trainer.anchors, model_cfg.head,
            )

        def body(carry, pl):
            eps = carry
            boxes, scores, labels, mask = one(batch.points + eps * 1e-30, pl)
            return jnp.max(scores), jnp.sum(mask)

        eps0 = jnp.float32(0.0)
        _, counts = jax.lax.scan(body, eps0, plans, length=iters)
        return counts

    run = jax.jit(predict_scan)
    counts = run(state.params, state.batch_stats, batch, plans)
    np.asarray(counts)  # compile + warmup; fetch forces real completion
    t0 = time.time()
    counts = run(state.params, state.batch_stats, batch, plans)
    # time the host fetch, not block_until_ready — the latter signalled
    # ready before device completion on the axon tunnel (bench_centerpoint,
    # session 5); a to-host copy of the outputs cannot lie
    np.asarray(counts)
    dt = time.time() - t0
    r = {
        "B": batch_size, "plan": plan_mode,
        "latency_ms_per_batch": round(1e3 * dt / iters, 2),
        "frames_per_sec": round(batch_size * iters / dt, 2),
    }
    if host_ms is not None:
        r["host_plan_ms"] = host_ms
    return r


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    print("backend:", jax.default_backend(), flush=True)
    for b in (1, 6):
        for plan_mode in (False, True):
            print(json.dumps(measure(b, plan_mode)), flush=True)


if __name__ == "__main__":
    main()
