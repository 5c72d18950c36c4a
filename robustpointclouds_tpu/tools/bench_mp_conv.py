"""Merge-path one-hot conv vs the gather paths at KITTI scale, on-chip.

One process, all variants (tunnel compiles are minutes each, CLAUDE.md):
mp_subm_conv fwd / fwd+bwd at selected widths x tile sizes, against the
round-2 xwin (<=32ch) and dense (64ch) gather formulations, plus the
index/boundary build costs, plus an on-chip correctness spot-check.

Env: MP_WIDTHS=16,32,64  MP_DS=256,512  MP_FWD_ONLY=0
Run: python -m robustpointclouds_tpu.tools.bench_mp_conv
"""
from __future__ import annotations

import os
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
    t0 = time.time()
    out = f(jnp.float32(0.0), *args)
    out.block_until_ready()
    tc = time.time() - t0
    t0 = time.time()
    out = f(jnp.float32(1e-9), *args)
    out.block_until_ready()
    dt = (time.time() - t0) / ITERS
    print(f"{name:56s} {dt*1e3:9.2f} ms/iter   (compile {tc:.0f}s)", flush=True)
    return dt


def main():
    from robustpointclouds_tpu.data import synthetic_kitti_batch
    from robustpointclouds_tpu.models import VoxelNetConfig
    from robustpointclouds_tpu.ops import mp_conv, sparse, subm_conv as sc
    from robustpointclouds_tpu.ops.voxelize import voxelize_batch

    widths = [int(w) for w in os.environ.get("MP_WIDTHS", "16,64").split(",")]
    tile_ds = [int(d) for d in os.environ.get("MP_DS", "256,512").split(",")]
    fwd_only = os.environ.get("MP_FWD_ONLY", "0") == "1"

    cfg = VoxelNetConfig()
    vz = cfg.voxelizer
    rng = np.random.RandomState(0)
    b = synthetic_kitti_batch(rng, batch_size=6, num_points=20000, max_gt=20)
    res = voxelize_batch(jnp.asarray(b[0])[..., :4], jnp.asarray(b[1]), vz)
    grid, _ = sparse.with_batch_axis(res.coords, res.voxel_mask, vz.sparse_shape)
    n = grid.flat_ids.shape[0]
    print(f"device: {jax.devices()[0]}, N={n}", flush=True)

    k4, s4, p4 = (1, 3, 3, 3), (1, 1, 1, 1), (0, 1, 1, 1)
    ids = grid.flat_ids
    key = jax.random.PRNGKey(0)
    dt16 = jnp.bfloat16

    # --- correctness spot check on the real grid (small channels, D=512)
    cin = 8
    feats = jax.random.normal(key, (n, cin), jnp.float32).astype(dt16)
    feats = jnp.where(grid.mask[:, None], feats, 0)
    kern = (jax.random.normal(key, (27 * cin, cin), jnp.float32) * 0.05).astype(dt16)
    idx = sparse.neighbor_index(grid, grid.coords, grid.mask, k4, s4, p4)
    info = mp_conv.subm_mp_info(grid, k4, D=512)
    ref = np.asarray(jax.jit(sc.subm_conv)(feats, kern, idx), np.float32)
    out = np.asarray(
        jax.jit(lambda f, w: mp_conv.mp_subm_conv(3, 512, f, w, info))(feats, kern),
        np.float32,
    )
    m = np.asarray(grid.mask)
    err = np.max(np.abs(out[m] - ref[m])) / (np.max(np.abs(ref[m])) + 1e-9)
    print(f"[check] mp vs dense rel err on real grid: {err:.2e}", flush=True)
    assert err < 2e-2, "mp conv mismatch on real grid"

    # --- boundary build vs xwin index build
    def build_mp(c, fids):
        g2 = sparse.SparseGrid(fids + (c * 0).astype(jnp.int32), grid.coords,
                               grid.mask, grid.spatial_shape)
        inf = mp_conv.subm_mp_info(g2, k4, D=512)
        return c + inf.q_offs[0, 1].astype(jnp.float32)

    def build_xwin(c, fids):
        g2 = sparse.SparseGrid(fids + (c * 0).astype(jnp.int32), grid.coords,
                               grid.mask, grid.spatial_shape)
        xw = sparse.neighbor_xwin_info(g2, g2.coords, g2.mask, k4, s4, p4)
        return c + xw.rows[0, 0].astype(jnp.float32)

    timed("mp info build (boundaries, no sort)", build_mp, ids)
    timed("xwin info build (packed rank sort)", build_xwin, ids)

    xwin = sparse.neighbor_xwin_info(grid, grid.coords, grid.mask, k4, s4, p4)
    jax.block_until_ready((xwin.rows, idx))

    for cin in widths:
        feats = jax.random.normal(key, (n, cin), jnp.float32).astype(dt16)
        feats = jnp.where(grid.mask[:, None], feats, 0)
        kern = (jax.random.normal(key, (27 * cin, cin), jnp.float32) * 0.05).astype(dt16)

        for D in tile_ds:
            inf = mp_conv.subm_mp_info(grid, k4, D=D)
            jax.block_until_ready(inf.q_offs)

            def fwd_mp(c, f, w, inf=inf, D=D):
                o = mp_conv.mp_subm_conv(3, D, f + jnp.asarray(c * 1e-30, dt16), w, inf)
                return c + jnp.sum(o[0]).astype(jnp.float32)

            def fb_mp(c, f, w, inf=inf, D=D):
                def loss(fw):
                    o = mp_conv.mp_subm_conv(3, D, fw[0], fw[1], inf)
                    return jnp.sum(o * o).astype(jnp.float32)

                v, g = jax.value_and_grad(loss)((f + jnp.asarray(c * 1e-30, dt16), w))
                return c + v * 0 + jnp.sum(g[0][0]).astype(jnp.float32)

            timed(f"mp    fwd       {cin}ch bf16 D={D}", fwd_mp, feats, kern)
            if not fwd_only:
                timed(f"mp    fwd+bwd   {cin}ch bf16 D={D}", fb_mp, feats, kern)

        # reference formulation for this width (round-2 winner)
        if cin <= 32:
            def fb_ref(c, f, w):
                def loss(fw):
                    o = sc.subm_conv_xwin(3, fw[0], fw[1], ids, xwin.rows, xwin.xvalid)
                    return jnp.sum(o * o).astype(jnp.float32)

                v, g = jax.value_and_grad(loss)((f + jnp.asarray(c * 1e-30, dt16), w))
                return c + v * 0 + jnp.sum(g[0][0]).astype(jnp.float32)

            name = f"xwin  fwd+bwd   {cin}ch bf16 (round-2 path)"
        else:
            def fb_ref(c, f, w):
                def loss(fw):
                    o = sc.subm_conv(fw[0], fw[1], idx)
                    return jnp.sum(o * o).astype(jnp.float32)

                v, g = jax.value_and_grad(loss)((f + jnp.asarray(c * 1e-30, dt16), w))
                return c + v * 0 + jnp.sum(g[0][0]).astype(jnp.float32)

            name = f"dense fwd+bwd   {cin}ch bf16 (round-2 path)"
        if not fwd_only:
            timed(name, fb_ref, feats, kern)


if __name__ == "__main__":
    main()
