"""Round-4 step-level attribution bench on real TPU: the host-plan split.

Same methodology as bench_r3_step (ONE process, jit(lax.scan) over ITERS
fused steps, state carried, features perturbed per step by a carry-dependent
epsilon), plus the round-4 axis: the host-prepared sparse plan
(models/voxelnet.build_plan) that moves voxelization + every index sort off
the device. In plan mode the indices are loop-invariant BY DESIGN (that work
left the device); everything consuming them also consumes per-step-perturbed
features, so nothing else can hoist.

Levers re-measured under the new schedule (round-3 verdicts were taken with
the sorts still on device — the schedule changes wholesale without them):

  - plan: host plan on/off (off = round-2/3 baseline reproduction)
  - assign: host anchor assignment riding the plan vs on-device
  - subm_conv.SAVE_COL: forward col saved as VJP residual vs re-gathered
  - subm_conv.DW_FROM_GCOL: d_W from the backward's own g-col gather
  - XWIN_SPLIT/XWIN_MAX_CIN: channel-split xwin on 64ch layers

Usage: python -m robustpointclouds_tpu.tools.bench_r4_step
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def measure(batch_size, plan_mode, save_col, dw_gcol, xwin_max_cin=32,
            xwin_split=1 << 16, assign=True, dense_gather=False,
            fpn_d2s=False, iters=10, trace_dir=None, predispatch=False,
            col3=False, pert_bf16=False, fingerprint=False, compact=False):
    import jax
    import jax.numpy as jnp

    from robustpointclouds_tpu.data import synthetic_kitti_batch
    from robustpointclouds_tpu.data.structures import PointCloudBatch
    from robustpointclouds_tpu.models import VoxelNetConfig
    from robustpointclouds_tpu.models import voxelnet as vx
    from robustpointclouds_tpu.nn import perturber as prt
    from robustpointclouds_tpu.nn import second as snd
    from robustpointclouds_tpu.nn import sparse_encoder as se
    from robustpointclouds_tpu.ops import subm_conv as sc
    from robustpointclouds_tpu.train import TrainConfig, Trainer
    from robustpointclouds_tpu.train.loop import HostPlanBuilder

    saved = (se.XWIN_MAX_CIN, sc.DW_FROM_GCOL, sc.XWIN_SPLIT, sc.SAVE_COL,
             se.DENSE_GATHER, snd.FPN_D2S, sc.COL3, prt.PERT_BF16,
             vx.COMPACT_PERT)
    se.XWIN_MAX_CIN = xwin_max_cin
    sc.DW_FROM_GCOL = dw_gcol
    sc.XWIN_SPLIT = xwin_split
    sc.SAVE_COL = save_col
    se.DENSE_GATHER = dense_gather
    snd.FPN_D2S = fpn_d2s
    sc.COL3 = col3
    prt.PERT_BF16 = pert_bf16
    vx.COMPACT_PERT = compact
    try:
        num_points = 20000
        model_cfg = VoxelNetConfig()
        if os.environ.get("BENCH_TINY", "0") == "1":
            # CPU smoke mode: exercises every variant's code path in seconds
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
            rng, batch_size=batch_size, num_points=num_points, max_gt=20,
            point_range=model_cfg.voxelizer.point_cloud_range,
        )
        batch = PointCloudBatch(*(jnp.asarray(x) for x in batch_np))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)

        plans = None
        host_ms = None
        if plan_mode:
            # the native builder is fixed to the default XWIN_MAX_CIN=32
            # layout — variants that change the width rule must build their
            # plans with the jax builder or they'd measure the default plan
            builder = HostPlanBuilder(model_cfg, use_native=(xwin_max_cin == 32))
            args = (batch_np.points, batch_np.points_mask)
            if assign:
                args += (batch_np.gt_boxes, batch_np.gt_labels, batch_np.gt_mask)
            plan_cpu = builder(*args)
            jax.block_until_ready(plan_cpu)
            t0 = time.time()
            plan_cpu = builder(*args)
            jax.block_until_ready(plan_cpu)
            host_ms = round((time.time() - t0) * 1000, 1)
            # ONE resident plan; float features perturbed per scan step by a
            # carry-dependent epsilon inside the body (index arrays are
            # loop-invariant BY DESIGN). The earlier stacked-xs form was an
            # axon process-state pathology (11 s/step) — see PARITY.md
            # round-4 diagnosis; the resident-plan scan in a lean process is
            # the fast, honest form (diag_plan_isolated: 231 ms/step).
            plans = jax.device_put(plan_cpu, jax.devices()[0])

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
                body, (state, jnp.float32(0)), None, length=iters
            )
            return st, losses

        if predispatch:
            # run ONE per-dispatch step before loading the scan executable:
            # the plan-pathology bisect's ordering control (diag_plan_bisect
            # 'predisp') — exercises the axon runtime's fast resident-buffer
            # path before the scan touches the same buffers
            step1 = jax.jit(trainer._step_impl)
            st1, lg1 = step1(state, batch, jnp.float32(5), plans)
            jax.block_until_ready(lg1["loss"])

        run = jax.jit(scan_steps, donate_argnums=(0,))
        state2, losses = run(state, batch, plans)
        jax.block_until_ready(losses)
        t0 = time.time()
        state3, losses = run(state2, batch, plans)
        jax.block_until_ready((state3.params, losses))
        dt = time.time() - t0
        assert np.isfinite(np.asarray(losses)).all()
        fps = batch_size * iters / dt
        r = {"B": batch_size, "plan": plan_mode, "assign": assign and plan_mode,
             "save_col": save_col, "dw": dw_gcol, "max_cin": xwin_max_cin,
             "dense_gather": dense_gather, "fpn_d2s": fpn_d2s,
             "col3": col3, "pert_bf16": pert_bf16, "compact": compact,
             "step_ms": round(1e3 * dt / iters, 1),
             "fps_per_chip": round(fps, 2)}
        if host_ms is not None:
            r["host_plan_ms"] = host_ms
        if trace_dir:
            # wall time over the axon tunnel can be dominated by runtime
            # artifacts (PARITY.md round-4 pathology) — the trace's device
            # plane gives the scheduler-independent step time
            from robustpointclouds_tpu.tools.parse_xplane import device_module_ms

            with jax.profiler.trace(trace_dir):
                state4, losses = run(state3, batch, plans)
                jax.block_until_ready((state4.params, losses))
            dev_ms = device_module_ms(trace_dir, "scan_steps")
            if dev_ms is not None:
                r["device_step_ms"] = round(dev_ms / iters, 1)
                r["device_fps_per_chip"] = round(
                    batch_size * iters / (dev_ms / 1e3), 2)
        if fingerprint:
            # prove identical-looking variants compile DIFFERENT modules
            # (VERDICT r4 item 7): XLA FLOP estimate + a hash of the
            # optimized module text. AFTER all timing — .compile() loads a
            # duplicate executable (a known process-state perturbation).
            import hashlib

            try:
                compiled = run.lower(state, batch, plans).compile()
                cost = compiled.cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                r["module_flops_per_step"] = float(cost.get("flops", 0.0)) / iters
                h = hashlib.sha256()
                for mod in compiled.as_text().splitlines():
                    h.update(mod.encode())
                r["module_hash"] = h.hexdigest()[:16]
            except Exception as exc:  # fingerprint is best-effort
                r["module_hash_error"] = str(exc)[:120]
        return r
    finally:
        (se.XWIN_MAX_CIN, sc.DW_FROM_GCOL, sc.XWIN_SPLIT, sc.SAVE_COL,
         se.DENSE_GATHER, snd.FPN_D2S, sc.COL3, prt.PERT_BF16,
         vx.COMPACT_PERT) = saved


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

    # Round-4 session-4 revision. The first on-chip suite (work_dirs/
    # BENCH_plan_xs.out, 2026-08-19) showed EVERY lax.scan form of the
    # plan-fed step is pathological on v5e — the xs form that this sweep was
    # written for runs 11.3 s/step vs 361 ms inline — so the plan-schedule
    # lever sweep above would measure ±50 ms levers inside an 11 s step:
    # pure noise. (The inline-schedule lever verdicts were already measured
    # on-chip in round 3 — bench_r3_step, PARITY.md attribution table — and
    # remain valid for the inline production default.) Replaced with the
    # decision-relevant set:
    #   1. bench_plan_diag — per-dispatch device time of the sort-free step
    #      (the plan's real win, never isolated on-chip), pathology probes
    #      (unroll / donate / perturb / xs), HLO + trace dumps for offline
    #      per-op attribution of the inline step.
    #   2. inline B=12/16 — the wide-sort batch path under the current code.
    from robustpointclouds_tpu.tools import bench_plan_diag

    bench_plan_diag.main()
    results = []
    for b in (12, 16):
        r = measure(batch_size=b, plan_mode=False, save_col=False,
                    dw_gcol=False)
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
