"""Diagnose the plan-fed scan pathology measured on real TPU (round 4).

Measured facts (work_dirs/BENCH_plan.out, BENCH_r4_step.out, 2026-08-19):
  - inline scan step:            361 ms   (16.63 f/s, reproduces round 2)
  - plan-fed scan step:        12062 ms   (identical XLA flop estimate!)
  - plan-fed single dispatch:   ~945 ms   incl. fresh-plan H2D over the tunnel
So the pathology is specific to the while-loop (scan) form of the plan-fed
step, not to the step computation. This script separates the suspects in ONE
process (compile-cache friendly):

  inline_scan        control
  plan_scan          repro
  plan_dispatch      plan resident on device, per-step jit dispatch: isolates
                     the single-step device time (minus ~0.17 s RPC/dispatch)
  plan_scan_nopert   plan fully loop-invariant (no per-iter voxel epsilon):
                     tests whether the dict(plan, voxels=+eps) per-iteration
                     rebuild is what XLA mishandles
  plan_scan_unroll   lax.scan(unroll=iters): no while loop at all — if fast,
                     the while-loop state handling (e.g. 92 MB of plan arrays
                     threaded/copied through the loop state) is the problem
  plan_scan_nodonate same as repro without donate_argnums: donation/aliasing
                     interaction probe
  plan_scan_xs       K FRESH plans stacked on a leading axis, passed as the
                     scan's xs so each iteration slices its own plan — the
                     true steady-state schedule (prefetch K plans, consume
                     one per step) with NO loop-invariant plan operand at
                     all. If fast, this is the production bench form.

For inline_scan/plan_scan it also records XLA cost_analysis (flops, bytes
accessed) and memory_analysis (temp/argument bytes — spilling shows up here)
and writes the optimized HLO to work_dirs/diag_hlo_{inline,plan}.txt for
offline diffing (grep for copies, host transfers, layout changes).

Usage: python -m robustpointclouds_tpu.tools.bench_plan_diag
Env: DIAG_ITERS (default 5), BENCH_TINY=1 CPU smoke.
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

    iters = int(os.environ.get("DIAG_ITERS", "5"))
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
        rng, batch_size=6, num_points=num_points, max_gt=20,
        point_range=model_cfg.voxelizer.point_cloud_range,
    )
    batch = PointCloudBatch(*(jnp.asarray(x) for x in batch_np))
    state0 = trainer.init_state(jax.random.PRNGKey(0), batch)

    builder = HostPlanBuilder(model_cfg)
    plan_cpu = builder(batch_np.points, batch_np.points_mask, batch_np.gt_boxes,
                       batch_np.gt_labels, batch_np.gt_mask)
    jax.block_until_ready(plan_cpu)
    plan = jax.device_put(plan_cpu, jax.devices()[0])

    def make_scan(use_plan, perturb=True, unroll=1):
        def scan_steps(state, batch, plan):
            def body(carry, _):
                st, eps = carry
                b = batch._replace(points=batch.points + eps * 1e-30)
                pl = plan
                if use_plan and perturb:
                    pl = dict(plan, voxels=plan["voxels"] + eps * 1e-30)
                st2, logs = trainer._step_impl(st, b, jnp.float32(5), pl)
                return (st2, logs["loss"]), logs["loss"]

            (st, _), losses = jax.lax.scan(
                body, (state, jnp.float32(0)), None, length=iters, unroll=unroll)
            return st, losses
        return scan_steps

    results = {}

    def timed_scan(name, fn, pl, donate=True, analyze=None):
        kw = dict(donate_argnums=(0,)) if donate else {}
        run = jax.jit(fn, **kw)
        st = state0 if not donate else jax.tree_util.tree_map(jnp.copy, state0)
        if analyze is not None:
            try:
                comp = run.lower(st, batch, pl).compile()
                cost = comp.cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                mem = comp.memory_analysis()
                results[name + "_analysis"] = {
                    "flops_per_step": float(cost.get("flops", 0.0)) / iters,
                    "bytes_accessed_per_step":
                        float(cost.get("bytes accessed", 0.0)) / iters,
                    "temp_mb": getattr(mem, "temp_size_in_bytes", 0) / 1e6,
                    "arg_mb": getattr(mem, "argument_size_in_bytes", 0) / 1e6,
                    "out_mb": getattr(mem, "output_size_in_bytes", 0) / 1e6,
                    "alias_mb": getattr(mem, "alias_size_in_bytes", 0) / 1e6,
                }
                with open(os.path.join(here, "work_dirs",
                                       f"diag_hlo_{analyze}.txt"), "w") as f:
                    f.write(comp.as_text())
            except Exception as e:  # analysis is best-effort on axon
                results[name + "_analysis"] = {"error": repr(e)}
        st2, losses = run(st, batch, pl)
        jax.block_until_ready(losses)
        t0 = time.time()
        st3, losses = run(st2, batch, pl)
        jax.block_until_ready((st3.params, losses))
        dt = time.time() - t0
        assert np.isfinite(np.asarray(losses)).all()
        results[name] = {"step_ms": round(1e3 * dt / iters, 1)}
        print(json.dumps({name: results[name]}), flush=True)

    os.makedirs(os.path.join(here, "work_dirs"), exist_ok=True)
    timed_scan("inline_scan", make_scan(False), None, analyze="inline")
    timed_scan("plan_scan", make_scan(True), plan, analyze="plan")

    # Per-step dispatch for BOTH modes (plan resident — no H2D in the loop).
    # Real training is per-dispatch, so this pair is the production-relevant
    # comparison; both pay the same ~0.17 s tunnel RPC per step, so the
    # DIFFERENCE is pure device time.
    step1 = jax.jit(trainer._step_impl)
    for name, pl in (("plan_dispatch", plan), ("inline_dispatch", None)):
        st = state0
        st, logs = step1(st, batch, jnp.float32(5), pl)
        jax.block_until_ready(logs["loss"])
        t0 = time.time()
        for _ in range(iters):
            st, logs = step1(st, batch, jnp.float32(5), pl)
        jax.block_until_ready((st.params, logs["loss"]))
        results[name] = {"step_ms": round(1e3 * (time.time() - t0) / iters, 1)}
        print(json.dumps({name: results[name]}), flush=True)

    timed_scan("plan_scan_nopert", make_scan(True, perturb=False), plan)
    timed_scan("plan_scan_unroll", make_scan(True, unroll=iters), plan)
    timed_scan("plan_scan_nodonate", make_scan(True), plan, donate=False)

    # Steady-state schedule: K fresh plans stacked on a leading axis, passed
    # as the scan's xs — each iteration consumes its OWN plan slice, so there
    # is no loop-invariant plan operand for the while loop to mishandle. The
    # index arrays are identical across the stack (same points) but XLA
    # cannot know that; features differ per slice like a real loader's would.
    def stack_k(k):
        return jax.tree_util.tree_map(
            lambda x: np.stack(
                [np.asarray(x) * (1 + 1e-7 * i) if np.issubdtype(
                    np.asarray(x).dtype, np.floating) else np.asarray(x)
                 for i in range(k)]),
            plan_cpu)

    plans_xs = jax.device_put(stack_k(iters), jax.devices()[0])

    def scan_xs(state, batch, plans):
        def body(carry, pl):
            st, eps = carry
            b = batch._replace(points=batch.points + eps * 1e-30)
            st2, logs = trainer._step_impl(st, b, jnp.float32(5), pl)
            return (st2, logs["loss"]), logs["loss"]

        (st, _), losses = jax.lax.scan(body, (state, jnp.float32(0)), plans)
        return st, losses

    try:
        timed_scan("plan_scan_xs", scan_xs, plans_xs, analyze="plan_xs")
    except Exception as e:  # must not lose the profile capture below
        results["plan_scan_xs"] = {"error": repr(e)}
        print(json.dumps({"plan_scan_xs": results["plan_scan_xs"]}), flush=True)

    # Per-op attribution: one traced execution of each scan form. Parse with
    # tools/parse_xplane.py (tensorboard_plugin_profile is installed here).
    if os.environ.get("DIAG_PROFILE", "1") == "1":
        for name, use_plan in (("plan", True), ("inline", False)):
            run = jax.jit(make_scan(use_plan))
            pl = plan if use_plan else None
            st2, losses = run(state0, batch, pl)  # warm (cache hit)
            jax.block_until_ready(losses)
            tdir = os.path.join(here, "work_dirs", f"diag_trace_{name}")
            with jax.profiler.trace(tdir):
                st2, losses = run(state0, batch, pl)
                jax.block_until_ready(losses)
            print(json.dumps({"trace": tdir}), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
