"""A/B microbenchmark: dense-index vs windowed subm conv on the attached chip.

Times fwd and fwd+bwd of a single submanifold conv layer at KITTI scale
(N=96000 active voxels, 3x3x3 kernel over (z,y,x) with kz folded into groups)
for both gather formulations and both dtypes. Uses the same fori_loop
data-dependency timing as tools/profile_components (per-dispatch timing over
the axon tunnel is unreliable).

Run: python -m robustpointclouds_tpu.tools.bench_subm_ab
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10


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
    print(f"{name:48s} {dt*1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    from robustpointclouds_tpu.data import synthetic_kitti_batch
    from robustpointclouds_tpu.models import VoxelNetConfig
    from robustpointclouds_tpu.ops import sparse, subm_conv as sc
    from robustpointclouds_tpu.ops.voxelize import voxelize_batch

    cache_dir = "/root/repo/.jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    cfg = VoxelNetConfig()
    vz = cfg.voxelizer
    rng = np.random.RandomState(0)
    b = synthetic_kitti_batch(rng, batch_size=6, num_points=20000, max_gt=20)
    pts = jnp.asarray(b[0])
    pm = jnp.asarray(b[1])
    res = voxelize_batch(pts[..., :4], pm, vz)
    grid, _ = sparse.with_batch_axis(res.coords, res.voxel_mask, vz.sparse_shape)
    n = grid.flat_ids.shape[0]
    print(f"device: {jax.devices()[0]}, N={n}")

    k4, s4, p4 = (1, 3, 3, 3), (1, 1, 1, 1), (0, 1, 1, 1)
    win = sparse.neighbor_window_info(grid, grid.coords, grid.mask, k4, s4, p4)
    xwin = sparse.neighbor_xwin_info(grid, grid.coords, grid.mask, k4, s4, p4)
    ids = grid.flat_ids
    idx = sparse.window_info_to_index(win)
    idx.block_until_ready()
    K = idx.shape[1]

    def build_dense(c, fids):
        g2 = sparse.SparseGrid(
            fids + (c * 0).astype(jnp.int32), grid.coords, grid.mask,
            grid.spatial_shape,
        )
        i2 = sparse.neighbor_index(g2, g2.coords, g2.mask, k4, s4, p4)
        return c + i2[0, 0].astype(jnp.float32)

    def build_xwin(c, fids):
        g2 = sparse.SparseGrid(
            fids + (c * 0).astype(jnp.int32), grid.coords, grid.mask,
            grid.spatial_shape,
        )
        xw = sparse.neighbor_xwin_info(g2, g2.coords, g2.mask, k4, s4, p4)
        return c + xw.rows[0, 0].astype(jnp.float32)

    timed("index build: dense (windowed lookup)", build_dense, ids)
    timed("index build: xwin (rank+delta sort)", build_xwin, ids)

    key = jax.random.PRNGKey(0)
    for cin, cout, tag in ((16, 16, "16->16"), (64, 64, "64->64")):
        feats32 = jax.random.normal(key, (n, cin), jnp.float32)
        kern32 = jax.random.normal(key, (K * cin, cout), jnp.float32) * 0.05
        for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            feats = feats32.astype(dt)
            kern = kern32.astype(dt)

            def fwd_dense(c, f, w):
                o = sc.subm_conv(f + jnp.asarray(c * 1e-30, dt), w, idx)
                return c + jnp.sum(o[0]).astype(jnp.float32)

            def fwd_win(c, f, w):
                o = sc.subm_conv_windowed(
                    win.kx, f + jnp.asarray(c * 1e-30, dt), w, win.p, win.delta
                )
                return c + jnp.sum(o[0]).astype(jnp.float32)

            def fb_dense(c, f, w):
                def loss(fw):
                    o = sc.subm_conv(fw[0], fw[1], idx)
                    return jnp.sum(o * o).astype(jnp.float32)

                v, g = jax.value_and_grad(loss)((f + jnp.asarray(c * 1e-30, dt), w))
                return c + v * 0 + jnp.sum(g[0][0]).astype(jnp.float32)

            def fwd_xwin(c, f, w):
                o = sc.subm_conv_xwin(
                    xwin.kx, f + jnp.asarray(c * 1e-30, dt), w, ids,
                    xwin.rows, xwin.xvalid,
                )
                return c + jnp.sum(o[0]).astype(jnp.float32)

            def fb_xwin(c, f, w):
                def loss(fw):
                    o = sc.subm_conv_xwin(
                        xwin.kx, fw[0], fw[1], ids, xwin.rows, xwin.xvalid
                    )
                    return jnp.sum(o * o).astype(jnp.float32)

                v, g = jax.value_and_grad(loss)((f + jnp.asarray(c * 1e-30, dt), w))
                return c + v * 0 + jnp.sum(g[0][0]).astype(jnp.float32)

            timed(f"dense fwd     {tag} {dt_name}", fwd_dense, feats, kern)
            timed(f"xwin  fwd     {tag} {dt_name}", fwd_xwin, feats, kern)
            timed(f"dense fwd+bwd {tag} {dt_name}", fb_dense, feats, kern)
            timed(f"xwin  fwd+bwd {tag} {dt_name}", fb_xwin, feats, kern)


if __name__ == "__main__":
    main()
