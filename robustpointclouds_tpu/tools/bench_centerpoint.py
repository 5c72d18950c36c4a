"""CenterPoint/NuScenes adversarial train-step throughput on the attached chip.

Same methodology as bench.py (one jit, lax.scan with the state carried, batch
perturbed per step) applied to the second model family — gives PARITY.md a
measured NuScenes datapoint next to the KITTI flagship number. Reference
recipe batch for adversarial-centerpoint_voxel-nuscenes is 4 per GPU
(reference config train_dataloader batch_size=4).

Run: python -m robustpointclouds_tpu.tools.bench_centerpoint [B]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Derived adversarial-CenterPoint V100 rate at B=4 — full derivation in
# BASELINE.md (mmdet3d centerpoint_voxel01 zoo logs ~0.3-0.45 s/iter at B=4
# => ~11 f/s clean, x0.8 adversary overhead). Deliberately generous to the
# GPU so vs_baseline understates the TPU advantage.
CP_REFERENCE_FPS_ESTIMATE = 9.0


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from robustpointclouds_tpu.data.nuscenes import synthetic_nuscenes_batch
    from robustpointclouds_tpu.data.structures import PointCloudBatch
    from robustpointclouds_tpu.train.centerpoint_loop import CenterPointTrainer

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    trainer = CenterPointTrainer()
    rng = np.random.RandomState(0)
    b, gt_vel = synthetic_nuscenes_batch(rng, batch_size=batch_size)
    batch_np = b
    batch = PointCloudBatch(*(jnp.asarray(x) for x in b))
    gt_vel_np = gt_vel
    gt_vel = jnp.asarray(gt_vel)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    print("backend:", jax.default_backend(), flush=True)

    iters = 10

    # plan-fed variant (VERDICT r4 item 4: the CP trainer always supported
    # the sort-free plan schedule but the bench never exercised it). ONE
    # resident plan; float features perturbed per scan step. Wall time over
    # the axon tunnel is a runtime artifact for resident-plan TRAIN scans
    # (PARITY.md round-4 bisect) — the device-plane trace is the measurement.
    plan = None
    host_ms = None
    if os.environ.get("BENCH_NO_PLAN", "0") != "1":
        builder = trainer.make_plan_builder()
        args = (batch_np.points, batch_np.points_mask, batch_np.gt_boxes,
                batch_np.gt_labels, batch_np.gt_mask, gt_vel_np)
        plan_cpu = builder(*args)
        jax.block_until_ready(plan_cpu)
        t0 = time.time()
        plan_cpu = builder(*args)
        jax.block_until_ready(plan_cpu)
        host_ms = round((time.time() - t0) * 1000, 1)
        plan = jax.device_put(plan_cpu, jax.devices()[0])

    def scan_steps(state, batch, gt_vel, plan):
        def body(carry, _):
            st, eps = carry
            bb = batch._replace(points=batch.points + eps * 1e-30)
            pl = plan
            if plan is not None:
                pl = dict(plan, voxels=plan["voxels"] + eps * 1e-30)
            st2, logs = trainer._step_impl(st, bb, gt_vel, jnp.float32(5), pl)
            return (st2, logs["loss"]), logs["loss"]

        (st, _), losses = jax.lax.scan(
            body, (state, jnp.float32(0)), None, length=iters
        )
        return st, losses

    run = jax.jit(scan_steps, donate_argnums=(0,))
    state2, losses = run(state, batch, gt_vel, plan)
    np.asarray(losses)  # device->host fetch: forces real completion
    t0 = time.time()
    state3, losses = run(state2, batch, gt_vel, plan)
    # time the HOST FETCH of the losses, not block_until_ready: the first
    # on-chip run (session 5) measured 1.3 ms/step for a full CenterPoint
    # train scan — block_until_ready over the axon tunnel signalled ready
    # before the device finished; the to-host copy below cannot lie
    losses_np = np.asarray(losses)
    dt = time.time() - t0
    assert np.isfinite(losses_np).all()
    r = {
        "model": "adversarial-centerpoint-nuscenes",
        "B": batch_size,
        "plan": plan is not None,
        "step_ms": round(1e3 * dt / iters, 1),
        "fps_per_chip": round(batch_size * iters / dt, 2),
        "vs_baseline": round(
            batch_size * iters / dt / CP_REFERENCE_FPS_ESTIMATE, 3),
    }
    if host_ms is not None:
        r["host_plan_ms"] = host_ms
    if os.environ.get("BENCH_TRACE", "0") == "1":
        from robustpointclouds_tpu.tools.parse_xplane import device_module_ms

        here = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        trace_dir = os.path.join(
            here, "work_dirs",
            "trace_centerpoint_plan" if plan is not None
            else "trace_centerpoint_inline")
        with jax.profiler.trace(trace_dir):
            state4, losses = run(state3, batch, gt_vel, plan)
            np.asarray(losses)
        dev_ms = device_module_ms(trace_dir, "scan_steps")
        if dev_ms is not None:
            r["device_step_ms"] = round(dev_ms / iters, 1)
            r["device_fps_per_chip"] = round(
                batch_size * iters / (dev_ms / 1e3), 2)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
