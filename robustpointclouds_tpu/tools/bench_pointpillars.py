"""Pillar-family train-step throughput (frames/s/chip) on real HW.

Same methodology as bench.py (ONE jit, lax.scan over ITERS fused adversarial
train steps, state carried, points perturbed per step) on the full
KITTI-scale AdversarialPointPillars. The pillar family is the all-dense
TPU-natural architecture (models/pointpillars.py) — this bench quantifies
how much throughput the architecture choice buys over the sparse-conv SECOND
flagship (bench.py) on the same chip. Reported separately from bench.py:
it is a DIFFERENT architecture, not an optimization of the reference's.

Usage: python -m robustpointclouds_tpu.tools.bench_pointpillars
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

# mmdet3d pointpillars_hv_secfpn_8xb6-160e_kitti-3d-3class published logs:
# ~0.18-0.25 s/iter at per-GPU batch 6 on V100 (~30 f/s clean midpoint),
# minus ~20% adversary overhead => ~24 f/s/GPU adversarial. Full derivation
# in BASELINE.md ("pillar-family denominator"); deliberately generous to the
# GPU so vs_baseline understates the TPU advantage.
PILLAR_REFERENCE_FPS_ESTIMATE = 24.0


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
    print("backend:", jax.default_backend(), flush=True)

    from robustpointclouds_tpu.data import synthetic_kitti_batch
    from robustpointclouds_tpu.data.structures import PointCloudBatch
    from robustpointclouds_tpu.models import PointPillarsConfig
    from robustpointclouds_tpu.train import TrainConfig, Trainer

    batch_size = int(os.environ.get("BENCH_BATCH", "6"))
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
    trainer = Trainer(model_cfg=model_cfg, train_cfg=TrainConfig())

    rng = np.random.RandomState(0)
    batch_np = synthetic_kitti_batch(
        rng, batch_size=batch_size, num_points=num_points, max_gt=20,
        point_range=model_cfg.voxelizer.point_cloud_range,
    )
    batch = PointCloudBatch(*(jnp.asarray(x) for x in batch_np))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    # production input pipeline (host plan: voxelize + BEV grid + dense map
    # + assign); BENCH_NO_PLAN=1 measures the everything-on-device step
    plan_cpu = None
    host_ms = None
    if os.environ.get("BENCH_NO_PLAN", "0") != "1":
        builder = trainer.make_plan_builder()
        args = (batch_np.points, batch_np.points_mask, batch_np.gt_boxes,
                batch_np.gt_labels, batch_np.gt_mask)
        plan_cpu = builder(*args)
        jax.block_until_ready(plan_cpu)
        t0 = time.time()
        plan_cpu = builder(*args)
        jax.block_until_ready(plan_cpu)
        host_ms = round((time.time() - t0) * 1000, 1)

    iters = 10

    # ONE resident plan, float features perturbed per scan step by a
    # carry-dependent epsilon (index arrays are loop-invariant BY DESIGN —
    # that work moved to the host). The earlier stacked-xs form measured
    # 7.1 s/step on v5e: an axon process-state artifact, not device time —
    # see bench.py and PARITY.md round-4 diagnosis (the resident-plan scan
    # in a minimal process is the fast, honest form).
    plan = None
    if plan_cpu is not None:
        plan = jax.device_put(plan_cpu, jax.devices()[0])

    def scan_steps(state, batch, plan):
        def body(carry, _):
            st, eps = carry
            b = batch._replace(points=batch.points + eps * 1e-30)
            pl = plan
            if plan is not None:
                pl = dict(plan, voxels=plan["voxels"] + eps * 1e-30)
            st2, logs = trainer._step_impl(st, b, jnp.float32(5), pl)
            return (st2, logs["loss"]), logs["loss"]

        (st, _), losses = jax.lax.scan(
            body, (state, jnp.float32(0)), None, length=iters)
        return st, losses

    run = jax.jit(scan_steps, donate_argnums=(0,))
    state2, losses = run(state, batch, plan)
    jax.block_until_ready(losses)
    t0 = time.time()
    state3, losses = run(state2, batch, plan)
    jax.block_until_ready((state3.params, losses))
    dt = time.time() - t0
    # MFU flop estimate AFTER the timed region (a duplicate .compile() is one
    # of the process perturbations behind the resident-plan slow path)
    flops_per_step = None
    try:
        cost = run.lower(state, batch, plan).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0)) / iters
    except Exception:
        pass
    assert np.isfinite(np.asarray(losses)).all()

    fps = batch_size * iters / max(len(jax.devices()), 1) / dt
    record = {
        "metric": "kitti_adv_pointpillars_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / PILLAR_REFERENCE_FPS_ESTIMATE, 3),
        "step_ms": round(1e3 * dt / iters, 1),
    }
    if flops_per_step:
        record["mfu"] = round(flops_per_step / (dt / iters) / 197e12, 4)
    if host_ms is not None:
        record["host_plan_ms"] = host_ms
    if os.environ.get("BENCH_TRACE", "0") == "1":
        # device-plane step time (wall over the axon tunnel can be a runtime
        # artifact for resident-plan train scans — PARITY round-4 bisect)
        from robustpointclouds_tpu.tools.parse_xplane import device_module_ms

        here = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        tdir = os.path.join(
            here, "work_dirs",
            "trace_pillars_plan" if plan is not None else "trace_pillars_inline")
        with jax.profiler.trace(tdir):
            state4, losses = run(state3, batch, plan)
            jax.block_until_ready((state4.params, losses))
        dev_ms = device_module_ms(tdir, "scan_steps")
        if dev_ms is not None:
            record["device_step_ms"] = round(dev_ms / iters, 1)
            record["device_fps_per_chip"] = round(
                batch_size * iters / (dev_ms / 1e3), 2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
