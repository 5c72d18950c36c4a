"""Isolated plan-step probe (round-4 follow-up to bench_plan_diag).

The diag run showed the SAME compiled plan-fed train step executing at
~222 ms/step inside the jax.profiler trace (work_dirs/diag_trace_plan) but
21-26 s/step in the timed probes earlier in that process — while inline forms
were stable at ~370 ms everywhere. Suspects: process memory pressure (several
loaded executables + 8.2 GB temp), or a runtime dispatch path that profiling
alters. This script runs a MINIMAL fresh process: build plan, jit ONE step,
time per-dispatch and a 5-iter scan, optionally under a trace — nothing else
loaded.

Usage: python -m robustpointclouds_tpu.tools.diag_plan_isolated
Env: ISO_TRACE=1 to also trace, BENCH_CPU=1 smoke.
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
    from robustpointclouds_tpu.models import VoxelNetConfig
    from robustpointclouds_tpu.train import TrainConfig, Trainer
    from robustpointclouds_tpu.train.loop import HostPlanBuilder

    iters = 5
    model_cfg = VoxelNetConfig()
    trainer = Trainer(model_cfg=model_cfg, train_cfg=TrainConfig())
    rng = np.random.RandomState(0)
    batch_np = synthetic_kitti_batch(
        rng, batch_size=6, num_points=20000, max_gt=20,
        point_range=model_cfg.voxelizer.point_cloud_range,
    )
    batch = PointCloudBatch(*(jnp.asarray(x) for x in batch_np))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    builder = HostPlanBuilder(model_cfg)
    plan_cpu = builder(batch_np.points, batch_np.points_mask, batch_np.gt_boxes,
                       batch_np.gt_labels, batch_np.gt_mask)
    jax.block_until_ready(plan_cpu)
    plan = jax.device_put(plan_cpu, jax.devices()[0])
    jax.block_until_ready(plan)

    # per-dispatch, plan resident, nothing else loaded in this process
    step1 = jax.jit(trainer._step_impl)
    st, logs = step1(state, batch, jnp.float32(5), plan)
    jax.block_until_ready(logs["loss"])
    t0 = time.time()
    for _ in range(iters):
        st, logs = step1(st, batch, jnp.float32(5), plan)
    jax.block_until_ready((st.params, logs["loss"]))
    print(json.dumps({"plan_dispatch_isolated_ms":
                      round(1e3 * (time.time() - t0) / iters, 1)}), flush=True)

    # scan form in the same minimal process
    def scan_steps(state, batch, plan):
        def body(carry, _):
            s, eps = carry
            b = batch._replace(points=batch.points + eps * 1e-30)
            s2, lg = trainer._step_impl(s, b, jnp.float32(5), plan)
            return (s2, lg["loss"]), lg["loss"]

        (s, _), losses = jax.lax.scan(
            body, (state, jnp.float32(0)), None, length=iters)
        return s, losses

    run = jax.jit(scan_steps)
    st2, losses = run(st, batch, plan)
    jax.block_until_ready(losses)
    t0 = time.time()
    st3, losses = run(st2, batch, plan)
    jax.block_until_ready((st3.params, losses))
    print(json.dumps({"plan_scan_isolated_ms":
                      round(1e3 * (time.time() - t0) / iters, 1)}), flush=True)

    if os.environ.get("ISO_TRACE", "0") == "1":
        tdir = os.path.join(here, "work_dirs", "diag_trace_iso")
        with jax.profiler.trace(tdir):
            st3, losses = run(st3, batch, plan)
            jax.block_until_ready(losses)
        print(json.dumps({"trace": tdir}), flush=True)


if __name__ == "__main__":
    main()
