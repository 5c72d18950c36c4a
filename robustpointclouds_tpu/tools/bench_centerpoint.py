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
    batch = PointCloudBatch(*(jnp.asarray(x) for x in b))
    gt_vel = jnp.asarray(gt_vel)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    print("backend:", jax.default_backend(), flush=True)

    iters = 10

    def scan_steps(state, batch, gt_vel):
        def body(carry, _):
            st, eps = carry
            bb = batch._replace(points=batch.points + eps * 1e-30)
            st2, logs = trainer._step_impl(st, bb, gt_vel, jnp.float32(5))
            return (st2, logs["loss"]), logs["loss"]

        (st, _), losses = jax.lax.scan(
            body, (state, jnp.float32(0)), None, length=iters
        )
        return st, losses

    run = jax.jit(scan_steps, donate_argnums=(0,))
    state2, losses = run(state, batch, gt_vel)
    np.asarray(losses)  # device->host fetch: forces real completion
    t0 = time.time()
    state3, losses = run(state2, batch, gt_vel)
    # time the HOST FETCH of the losses, not block_until_ready: the first
    # on-chip run (session 5) measured 1.3 ms/step for a full CenterPoint
    # train scan — block_until_ready over the axon tunnel signalled ready
    # before the device finished; the to-host copy below cannot lie
    losses_np = np.asarray(losses)
    dt = time.time() - t0
    assert np.isfinite(losses_np).all()
    print(json.dumps({
        "model": "adversarial-centerpoint-nuscenes",
        "B": batch_size,
        "step_ms": round(1e3 * dt / iters, 1),
        "fps_per_chip": round(batch_size * iters / dt, 2),
    }))


if __name__ == "__main__":
    main()
