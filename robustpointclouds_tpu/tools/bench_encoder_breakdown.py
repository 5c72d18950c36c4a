"""One-shot encoder cost breakdown on the attached chip.

Everything in one process/run (remote compiles over the axon tunnel are
~minutes each and uncached, so measurement scripts must batch):
  1. 64ch bf16 subm conv: xwin vs dense fwd+bwd (the decisive formulation
     datapoint the tunnel never delivered).
  2. Index-build costs at KITTI scale: xwin info vs fused downsample.
  3. Per-stage encoder slices (stage i only) to localize the remaining time.

Run: python -m robustpointclouds_tpu.tools.bench_encoder_breakdown
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
    dt = (time.time() - t0) / ITERS
    print(f"{name:52s} {dt*1e3:9.2f} ms/iter", flush=True)
    return dt


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

    # --- 1. the decisive 64ch bf16 A/B (+ table-build isolation)
    for cin in (16, 64):
        dt = jnp.bfloat16
        feats = jax.random.normal(key, (n, cin), jnp.float32).astype(dt)
        kern = (jax.random.normal(key, (K * cin, cin), jnp.float32) * 0.05).astype(dt)

        def tbl_only(c, f):
            t = sc.x_window_table(f + jnp.asarray(c * 1e-30, dt), ids, 3)
            return c + jnp.sum(t[0]).astype(jnp.float32)

        def fwd_xwin(c, f, w):
            o = sc.subm_conv_xwin(3, f + jnp.asarray(c * 1e-30, dt), w, ids,
                                  xwin.rows, xwin.xvalid)
            return c + jnp.sum(o[0]).astype(jnp.float32)

        def fb_xwin(c, f, w):
            def loss(fw):
                o = sc.subm_conv_xwin(3, fw[0], fw[1], ids, xwin.rows, xwin.xvalid)
                return jnp.sum(o * o).astype(jnp.float32)

            v, g = jax.value_and_grad(loss)((f + jnp.asarray(c * 1e-30, dt), w))
            return c + v * 0 + jnp.sum(g[0][0]).astype(jnp.float32)

        def fwd_dense(c, f, w):
            o = sc.subm_conv(f + jnp.asarray(c * 1e-30, dt), w, idx)
            return c + jnp.sum(o[0]).astype(jnp.float32)

        def fb_dense(c, f, w):
            def loss(fw):
                o = sc.subm_conv(fw[0], fw[1], idx)
                return jnp.sum(o * o).astype(jnp.float32)

            v, g = jax.value_and_grad(loss)((f + jnp.asarray(c * 1e-30, dt), w))
            return c + v * 0 + jnp.sum(g[0][0]).astype(jnp.float32)

        timed(f"x_window_table build only {cin}ch bf16", tbl_only, feats)
        timed(f"xwin  fwd       {cin}ch bf16", fwd_xwin, feats, kern)
        timed(f"dense fwd       {cin}ch bf16", fwd_dense, feats, kern)
        timed(f"xwin  fwd+bwd   {cin}ch bf16", fb_xwin, feats, kern)
        timed(f"dense fwd+bwd   {cin}ch bf16", fb_dense, feats, kern)

    # --- 2. index builds
    def build_xwin(c, fids):
        g2 = sparse.SparseGrid(fids + (c * 0).astype(jnp.int32), grid.coords,
                               grid.mask, grid.spatial_shape)
        xw = sparse.neighbor_xwin_info(g2, g2.coords, g2.mask, k4, s4, p4)
        return c + xw.rows[0, 0].astype(jnp.float32)

    def build_down(c, fids):
        g2 = sparse.SparseGrid(fids + (c * 0).astype(jnp.int32), grid.coords,
                               grid.mask, grid.spatial_shape)
        og, fi, inv = sparse.downsample_with_index(
            g2, (1, 3, 3, 3), (1, 2, 2, 2), (0, 1, 1, 1), out_cap=n
        )
        return c + fi[0, 0].astype(jnp.float32) + inv[0, 0].astype(jnp.float32)

    timed("xwin info build (96k grid)", build_xwin, ids)
    timed("fused downsample+idx+inv (96k grid)", build_down, ids)

    # --- 3. whole-encoder and per-portion slices
    from robustpointclouds_tpu.nn import SparseEncoder

    enc = SparseEncoder(sparse_shape=vz.sparse_shape, dtype=jnp.bfloat16)
    feats4 = jax.random.normal(key, (n, 4), jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), feats4, grid, False)

    def enc_fwdbwd(c, f):
        def loss(f_):
            out, _ = enc.apply(v, f_, grid, True, mutable=["batch_stats"])
            return jnp.mean(out * out)

        val, g = jax.value_and_grad(loss)(f + c * 1e-30)
        return c + val + jnp.mean(g)

    timed("FULL encoder fwd+bwd (bf16)", enc_fwdbwd, feats4)


if __name__ == "__main__":
    main()
