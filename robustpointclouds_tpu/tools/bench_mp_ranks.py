"""Attribute the merge-path-ranks step regression: index-build microbench.

One process, real chip. Times at KITTI scale (96k-row grid):
  1. neighbor_xwin_info build, packed-sort ranks (MP_RANKS=False)
  2. neighbor_xwin_info build, batched merge-path ranks (MP_RANKS=True)
  3. raw _rank_and_succ_delta on the 9-group query load
  4. raw merge_path_ranks (vmapped over the 9 groups)

Run: python -m robustpointclouds_tpu.tools.bench_mp_ranks
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
    out = f(jnp.float32(0.0), *args)
    out.block_until_ready()
    t0 = time.time()
    out = f(jnp.float32(1e-9), *args)
    out.block_until_ready()
    dt = (time.time() - t0) / ITERS
    print(f"{name:52s} {dt*1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from robustpointclouds_tpu.data import synthetic_kitti_batch
    from robustpointclouds_tpu.models import VoxelNetConfig
    from robustpointclouds_tpu.ops import sparse
    from robustpointclouds_tpu.ops.voxelize import voxelize_batch

    cfg = VoxelNetConfig()
    vz = cfg.voxelizer
    rng = np.random.RandomState(0)
    b = synthetic_kitti_batch(rng, batch_size=6, num_points=20000, max_gt=20)
    res = voxelize_batch(jnp.asarray(b[0])[..., :4], jnp.asarray(b[1]), vz)
    grid, _ = sparse.with_batch_axis(res.coords, res.voxel_mask, vz.sparse_shape)
    n = grid.flat_ids.shape[0]
    ids = grid.flat_ids
    print(f"device: {jax.devices()[0]}, N={n}", flush=True)

    k4, s4, p4 = (1, 3, 3, 3), (1, 1, 1, 1), (0, 1, 1, 1)

    def build(c, fids):
        fids = fids + jnp.int32(c * 0)
        g2 = sparse.SparseGrid(fids, grid.coords, grid.mask, grid.spatial_shape)
        xw = sparse.neighbor_xwin_info(g2, g2.coords, g2.mask, k4, s4, p4)
        return jnp.float32(jnp.sum(xw.rows)) * 1e-30 + c

    for mp in (False, True):
        sparse.MP_RANKS = mp
        timed(f"xwin info build (96k grid) mp={mp}", build, ids)

    # raw rank primitives on the same 9-group load
    in_shape = grid.spatial_shape
    strides = sparse._strides_of(in_shape)
    group_offs = sparse.kernel_offsets(k4[:-1])
    deltas = [
        sum(
            (int(group_offs[g, a]) - int(p4[a])) * int(strides[a])
            for a in range(3)
        )
        - int(p4[3])
        for g in range(group_offs.shape[0])
    ]
    kx = k4[-1]
    dspan = max(abs(d) for d in deltas)
    cap = sparse.INT32_MAX - dspan - kx - 2

    def raw_sort(c, fids):
        fids = fids + jnp.int32(c * 0)
        ids_c = jnp.minimum(fids, sparse._PACK_CAP)
        q0 = jnp.stack([ids_c + int(d) for d in deltas]).reshape(-1)
        p, d0 = sparse._rank_and_succ_delta(fids, q0, kx)
        return jnp.float32(jnp.sum(p) + jnp.sum(d0)) * 1e-30 + c

    def raw_mp(c, fids):
        fids = fids + jnp.int32(c * 0)
        ids_c = jnp.minimum(fids, cap)
        q0s = jnp.stack([ids_c + int(d) for d in deltas])
        p, d0 = jax.vmap(
            lambda q: sparse.merge_path_ranks(fids, q, kx, cap=cap)
        )(q0s)
        return jnp.float32(jnp.sum(p) + jnp.sum(d0)) * 1e-30 + c

    timed("raw ranks: packed sort (9 groups)", raw_sort, ids)
    timed("raw ranks: merge-path batched (9 groups)", raw_mp, ids)


if __name__ == "__main__":
    main()
