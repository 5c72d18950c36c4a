"""Bisect the plan-fed train-scan pathology, one difference per process.

diag_plan_isolated measures the resident-plan scan at ~231 ms/step, while
bench.py's plan mode — the same step, same resident plan — measures
~11.2 s/step (work_dirs/BENCH_plan_xs.out, 2026-08-19, new resident form).
The bench differs from the fast probe in exactly three ways; this script
applies ONE configurable subset per process (DIAG_VARIANT env) so the
trigger is isolated rather than theorized:

  pure      — the fast probe's form verbatim (control, expect ~231 ms/step)
  vperturb  — + per-step plan-voxels perturbation in the scan body
  donate    — + donate_argnums=(0,) on the jitted scan
  builder4  — + 3 extra HostPlanBuilder invocations before the timed region
  predisp   — + a per-dispatch step executable loaded BEFORE the scan
              (the fast probe had this; bench does not — ordering control)
  full      — all of vperturb+donate+builder4 (bench.py's exact form,
              expect ~11 s/step)

Usage: DIAG_VARIANT=vperturb python -m robustpointclouds_tpu.tools.diag_plan_bisect
Driven by tools/run_plan_bisect.sh (one process per variant, sequential).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    variant = os.environ.get("DIAG_VARIANT", "pure")
    vperturb = variant in ("vperturb", "full")
    donate = variant in ("donate", "full")
    builder4 = variant in ("builder4", "full")
    predisp = variant == "predisp"

    if os.environ.get("BENCH_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    print("backend:", jax.default_backend(), "variant:", variant, flush=True)

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
    args = (batch_np.points, batch_np.points_mask, batch_np.gt_boxes,
            batch_np.gt_labels, batch_np.gt_mask)
    plan_cpu = builder(*args)
    jax.block_until_ready(plan_cpu)
    if builder4:
        for _ in range(3):
            plan_cpu = builder(*args)
            jax.block_until_ready(plan_cpu)
    plan = jax.device_put(plan_cpu, jax.devices()[0])
    jax.block_until_ready(plan)

    if predisp:
        step1 = jax.jit(trainer._step_impl)
        st, logs = step1(state, batch, jnp.float32(5), plan)
        jax.block_until_ready(logs["loss"])

    def scan_steps(state, batch, plan):
        def body(carry, _):
            s, eps = carry
            b = batch._replace(points=batch.points + eps * 1e-30)
            pl = plan
            if vperturb:
                pl = dict(plan, voxels=plan["voxels"] + eps * 1e-30)
            s2, lg = trainer._step_impl(s, b, jnp.float32(5), pl)
            return (s2, lg["loss"]), lg["loss"]

        (s, _), losses = jax.lax.scan(
            body, (state, jnp.float32(0)), None, length=iters)
        return s, losses

    run = jax.jit(scan_steps, donate_argnums=(0,)) if donate else jax.jit(scan_steps)
    st2, losses = run(state, batch, plan)
    jax.block_until_ready(losses)
    t0 = time.time()
    st3, losses = run(st2, batch, plan)
    jax.block_until_ready((st3.params, losses))
    print(json.dumps({
        "variant": variant,
        "scan_step_ms": round(1e3 * (time.time() - t0) / iters, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
