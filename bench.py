"""Benchmark: adversarial train-step throughput (frames/sec/chip) on real HW.

Runs the flagship AdversarialVoxelNet (full KITTI-scale SECOND architecture,
16k voxels, 211k anchors, adversary active) for timed fused train steps on
whatever accelerator is attached and prints ONE JSON line.

vs_baseline: the reference publishes no numbers (BASELINE.md); the denominator
is the reference recipe's estimated single-GPU adversarial training throughput
(batch 6 SECOND + VoxelPerturber ~= 12 frames/s on the class of GPU the repo
targets — spconv-bound). The BASELINE.json north star is 5x that.
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 12.0


def main():
    import os

    import jax
    import jax.numpy as jnp

    # The fused train step is a large graph and this host has few CPUs —
    # cold compile can exceed 10 minutes. A persistent compilation cache
    # makes every run after the first take seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from robustpointclouds_tpu.data import synthetic_kitti_batch
    from robustpointclouds_tpu.data.structures import PointCloudBatch
    from robustpointclouds_tpu.models import VoxelNetConfig
    from robustpointclouds_tpu.train import TrainConfig, Trainer

    batch_size = 6  # reference KITTI recipe (BASELINE.md)
    model_cfg = VoxelNetConfig()
    trainer = Trainer(model_cfg=model_cfg, train_cfg=TrainConfig())

    rng = np.random.RandomState(0)
    batch_np = synthetic_kitti_batch(rng, batch_size=batch_size, num_points=20000, max_gt=20)
    batch = PointCloudBatch(*(jnp.asarray(x) for x in batch_np))

    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer.compile(donate=False)

    # warmup / compile
    state, logs = trainer.train_step(state, batch, epoch=5)
    jax.block_until_ready(state.params)

    iters = 10
    t0 = time.time()
    losses = []
    for _ in range(iters):
        state, logs = trainer.train_step(state, batch, epoch=5)
        losses.append(logs["loss"])
    # block on the full updated state AND materialize every loss — guards
    # against async-dispatch timing artifacts over remote-device tunnels
    jax.block_until_ready(state.params)
    losses = [float(l) for l in losses]
    dt = time.time() - t0
    assert all(np.isfinite(l) for l in losses), f"non-finite losses: {losses}"

    fps = batch_size * iters / dt
    n_chips = max(len(jax.devices()), 1)
    fps_per_chip = fps / n_chips
    print(
        json.dumps(
            {
                "metric": "kitti_adv_train_frames_per_sec_per_chip",
                "value": round(fps_per_chip, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps_per_chip / REFERENCE_FPS_ESTIMATE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
