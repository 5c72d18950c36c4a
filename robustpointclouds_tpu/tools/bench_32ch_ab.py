"""A/B the 32ch subm conv (xwin vs dense) — the XWIN_MAX_CIN crossover.

16ch: xwin wins 1.5x; 64ch: dense wins 1.9x (tools/bench_encoder_breakdown).
This pins the 32ch middle point so the encoder's width rule is set from data.

Run: python -m robustpointclouds_tpu.tools.bench_32ch_ab
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8


def timed(name, fn, *args):
    def looped(seed, *a):
        def body(_, c):
            return fn(c, *a)

        return jax.lax.fori_loop(0, ITERS, body, seed)

    f = jax.jit(looped)
    out = f(jnp.float32(0.0), *args)
    out.block_until_ready()
    t0 = time.time()
    out = f(jnp.float32(1e-9), *args)
    out.block_until_ready()
    print(f"{name:40s} {(time.time()-t0)/ITERS*1e3:9.2f} ms/iter", flush=True)


def main():
    from robustpointclouds_tpu.data import synthetic_kitti_batch
    from robustpointclouds_tpu.models import VoxelNetConfig
    from robustpointclouds_tpu.ops import sparse, subm_conv as sc
    from robustpointclouds_tpu.ops.voxelize import voxelize_batch

    cfg = VoxelNetConfig()
    vz = cfg.voxelizer
    rng = np.random.RandomState(0)
    b = synthetic_kitti_batch(rng, batch_size=6, num_points=20000, max_gt=20)
    res = voxelize_batch(jnp.asarray(b[0])[..., :4], jnp.asarray(b[1]), vz)
    grid, _ = sparse.with_batch_axis(res.coords, res.voxel_mask, vz.sparse_shape)
    n = grid.flat_ids.shape[0]
    print(f"device: {jax.devices()[0]}, N={n}", flush=True)

    k4, s4, p4 = (1, 3, 3, 3), (1, 1, 1, 1), (0, 1, 1, 1)
    xwin = sparse.neighbor_xwin_info(grid, grid.coords, grid.mask, k4, s4, p4)
    idx = sparse.neighbor_index(grid, grid.coords, grid.mask, k4, s4, p4)
    ids = grid.flat_ids
    jax.block_until_ready((xwin.rows, idx))
    K = idx.shape[1]
    key = jax.random.PRNGKey(0)
    cin = 32
    dt = jnp.bfloat16
    feats = jax.random.normal(key, (n, cin), jnp.float32).astype(dt)
    kern = (jax.random.normal(key, (K * cin, cin), jnp.float32) * 0.05).astype(dt)

    def fb_xwin(c, f, w):
        def loss(fw):
            o = sc.subm_conv_xwin(3, fw[0], fw[1], ids, xwin.rows, xwin.xvalid)
            return jnp.sum(o * o).astype(jnp.float32)

        v, g = jax.value_and_grad(loss)((f + jnp.asarray(c * 1e-30, dt), w))
        return c + v * 0 + jnp.sum(g[0][0]).astype(jnp.float32)

    def fb_dense(c, f, w):
        def loss(fw):
            o = sc.subm_conv(fw[0], fw[1], idx)
            return jnp.sum(o * o).astype(jnp.float32)

        v, g = jax.value_and_grad(loss)((f + jnp.asarray(c * 1e-30, dt), w))
        return c + v * 0 + jnp.sum(g[0][0]).astype(jnp.float32)

    timed("xwin  fwd+bwd 32ch bf16", fb_xwin, feats, kern)
    timed("dense fwd+bwd 32ch bf16", fb_dense, feats, kern)


if __name__ == "__main__":
    main()
