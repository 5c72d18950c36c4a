"""On-chip CenterPoint NaN diagnosis (first seen: BENCH_centerpoint 2026-08-19,
non-finite losses after ~10-20 steps on v5e while the CPU tiers pass).

Runs K per-dispatch train steps and prints, per step, every loss component
plus the names of any gradient leaves that are non-finite BEFORE sanitation —
pinpointing which parameter's gradient blows up first and at which step.
Run once with the adversary on (default config) and once with it off
(DIAG_NOADV=1) to attribute the blow-up.

Usage: python -m robustpointclouds_tpu.tools.diag_centerpoint_nan
Env: DIAG_STEPS (default 20), DIAG_NOADV=1, BENCH_CPU=1 smoke.
"""
from __future__ import annotations

import json
import os

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

    from robustpointclouds_tpu.data.nuscenes import synthetic_nuscenes_batch
    from robustpointclouds_tpu.data.structures import PointCloudBatch
    from robustpointclouds_tpu.models.centerpoint import CenterPointConfig
    from robustpointclouds_tpu.train.centerpoint_loop import CenterPointTrainer

    steps = int(os.environ.get("DIAG_STEPS", "20"))
    cfg = CenterPointConfig()
    if os.environ.get("DIAG_NOADV", "0") == "1":
        cfg = cfg._replace(adversary=None)
    trainer = CenterPointTrainer(model_cfg=cfg)
    rng = np.random.RandomState(0)
    b, gt_vel = synthetic_nuscenes_batch(rng, batch_size=4)
    batch = PointCloudBatch(*(jnp.asarray(x) for x in b))
    gt_vel = jnp.asarray(gt_vel)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    def probe(state, batch, gt_vel):
        grads, (new_stats, logs, is_nan) = jax.grad(
            trainer._loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, gt_vel, jnp.float32(5),
          state.adversary_enabled, None)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        finite = {
            jax.tree_util.keystr(path): jnp.all(jnp.isfinite(leaf))
            for path, leaf in flat
        }
        gmax = {
            jax.tree_util.keystr(path): jnp.max(jnp.abs(leaf))
            for path, leaf in flat
        }
        return logs, finite, gmax, is_nan

    probe_j = jax.jit(probe)
    step_j = jax.jit(trainer._step_impl, donate_argnums=(0,))

    for i in range(steps):
        logs, finite, gmax, is_nan = probe_j(state, batch, gt_vel)
        bad = [k for k, v in finite.items() if not bool(v)]
        top = sorted(((float(v), k) for k, v in gmax.items()), reverse=True)[:3]
        print(json.dumps({
            "step": i,
            "loss": {k: float(v) for k, v in logs.items()},
            "nonfinite_grad_leaves": bad[:12],
            "n_nonfinite": len(bad),
            "is_nan_flag": bool(is_nan),
            "top_grad_mag": [[k, round(v, 3)] for v, k in top],
        }), flush=True)
        state, _ = step_j(state, batch, gt_vel, jnp.float32(5))
    print(json.dumps({"done": steps}))


if __name__ == "__main__":
    main()
