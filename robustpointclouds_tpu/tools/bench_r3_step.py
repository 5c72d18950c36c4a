"""Round-3 step-level attribution bench on real TPU.

Measures the full fused adversarial train step (bench.py methodology: one
jit, lax.scan over ITERS steps, state carried, batch perturbed per step) for
every lever combination in ONE process so the tunnel's compile cost is paid
once per variant and nothing else drifts. The levers are module globals read
at trace time, so patching them between variants retraces correctly:

  - sparse.MP_RANKS: sort-free merge-path subm ranks vs the packed rank sort
  - subm_conv.DW_FROM_GCOL: d_W from the backward's own g-col gather vs the
    round-2 forward-col re-gather
  - subm_conv.XWIN_SPLIT + encoder XWIN_MAX_CIN: channel-split xwin gathers
    on 64ch layers vs the round-2 width rule (xwin <= 32ch, dense 64ch)

Usage: python -m robustpointclouds_tpu.tools.bench_r3_step
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def measure(batch_size, xwin_max_cin, mp_ranks, dw_gcol, xwin_split, iters=10):
    import jax
    import jax.numpy as jnp

    from robustpointclouds_tpu.data import synthetic_kitti_batch
    from robustpointclouds_tpu.data.structures import PointCloudBatch
    from robustpointclouds_tpu.models import VoxelNetConfig
    from robustpointclouds_tpu.nn import sparse_encoder as se
    from robustpointclouds_tpu.ops import sparse, subm_conv as sc
    from robustpointclouds_tpu.train import TrainConfig, Trainer

    saved = (se.XWIN_MAX_CIN, sparse.MP_RANKS, sc.DW_FROM_GCOL, sc.XWIN_SPLIT)
    se.XWIN_MAX_CIN = xwin_max_cin
    sparse.MP_RANKS = mp_ranks
    sc.DW_FROM_GCOL = dw_gcol
    sc.XWIN_SPLIT = xwin_split
    try:
        model_cfg = VoxelNetConfig()
        trainer = Trainer(model_cfg=model_cfg, train_cfg=TrainConfig())
        rng = np.random.RandomState(0)
        batch_np = synthetic_kitti_batch(
            rng, batch_size=batch_size, num_points=20000, max_gt=20
        )
        batch = PointCloudBatch(*(jnp.asarray(x) for x in batch_np))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)

        def scan_steps(state, batch):
            def body(carry, _):
                st, eps = carry
                b = batch._replace(points=batch.points + eps * 1e-30)
                st2, logs = trainer._step_impl(st, b, jnp.float32(5))
                return (st2, logs["loss"]), logs["loss"]

            (st, _), losses = jax.lax.scan(
                body, (state, jnp.float32(0)), None, length=iters
            )
            return st, losses

        run = jax.jit(scan_steps, donate_argnums=(0,))
        state2, losses = run(state, batch)
        jax.block_until_ready(losses)
        t0 = time.time()
        state3, losses = run(state2, batch)
        jax.block_until_ready((state3.params, losses))
        dt = time.time() - t0
        assert np.isfinite(np.asarray(losses)).all()
        fps = batch_size * iters / dt
        return {"B": batch_size, "max_cin": xwin_max_cin, "mp": mp_ranks,
                "dw": dw_gcol, "split": xwin_split,
                "step_ms": round(1e3 * dt / iters, 1),
                "fps_per_chip": round(fps, 2)}
    finally:
        se.XWIN_MAX_CIN, sparse.MP_RANKS, sc.DW_FROM_GCOL, sc.XWIN_SPLIT = saved


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

    NOSPLIT = 1 << 16
    variants = [
        # (B, max_cin, mp_ranks, dw_gcol, xwin_split)   # what it isolates
        (6, 32, False, False, NOSPLIT),   # round-2 baseline reproduction
        (6, 32, False, True, NOSPLIT),    # + dW via flat dot_general
        (12, 32, False, False, NOSPLIT),  # B=12 on the WIDE two-key sort
        (16, 32, False, False, NOSPLIT),  # B=16 scaling on the wide sort
    ]
    results = []
    for v in variants:
        r = measure(*v)
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
