"""Pallas merge-path gather-conv kernel at KITTI scale on the chip.

Correctness spot-check vs the dense-gather path on a real 96k grid, then
fwd / fwd+bwd timings at the encoder widths vs the round-2 formulations.

Env: MPK_WIDTHS=16,64  MPK_D=512  MPK_WLEN=640  MPK_FWD_ONLY=0
Run: python -m robustpointclouds_tpu.tools.bench_mp_kernel
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
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from robustpointclouds_tpu.data import synthetic_kitti_batch
    from robustpointclouds_tpu.models import VoxelNetConfig
    from robustpointclouds_tpu.ops import mp_conv, sparse, subm_conv as sc
    from robustpointclouds_tpu.ops.voxelize import voxelize_batch

    widths = [int(w) for w in os.environ.get("MPK_WIDTHS", "16,64").split(",")]
    D = int(os.environ.get("MPK_D", "512"))
    WLEN = int(os.environ.get("MPK_WLEN", "544"))
    fwd_only = os.environ.get("MPK_FWD_ONLY", "0") == "1"

    cfg = VoxelNetConfig()
    vz = cfg.voxelizer
    rng = np.random.RandomState(0)
    b = synthetic_kitti_batch(rng, batch_size=6, num_points=20000, max_gt=20)
    res = voxelize_batch(jnp.asarray(b[0])[..., :4], jnp.asarray(b[1]), vz)
    grid, _ = sparse.with_batch_axis(res.coords, res.voxel_mask, vz.sparse_shape)
    n = grid.flat_ids.shape[0]
    print(f"device: {jax.devices()[0]}, N={n}, D={D}, WLEN={WLEN}", flush=True)

    k4, s4, p4 = (1, 3, 3, 3), (1, 1, 1, 1), (0, 1, 1, 1)
    ids = grid.flat_ids
    key = jax.random.PRNGKey(0)
    dt16 = jnp.bfloat16

    pack = mp_conv.subm_mp3_pack(grid, k4, D=D, wlen=WLEN)
    jax.block_until_ready(pack.q_offs)

    # correctness on the real grid (bf16 exactness: selection + same matmul
    # association as a per-stream decomposition => tolerance)
    cin = 16
    feats = jax.random.normal(key, (n, cin), jnp.float32).astype(dt16)
    feats = jnp.where(grid.mask[:, None], feats, 0)
    kern = (jax.random.normal(key, (27 * cin, cin), jnp.float32) * 0.05).astype(dt16)
    idx = sparse.neighbor_index(grid, grid.coords, grid.mask, k4, s4, p4)
    ref = np.asarray(jax.jit(sc.subm_conv)(feats, kern, idx), np.float32)
    out = np.asarray(
        jax.jit(lambda f, w: mp_conv.mp3_subm_conv(3, D, WLEN, f, w, pack))(
            feats, kern
        ),
        np.float32,
    )
    m = np.asarray(grid.mask)
    err = np.max(np.abs(out[m] - ref[m])) / (np.max(np.abs(ref[m])) + 1e-9)
    print(f"[check] pallas-mp vs dense rel err: {err:.2e}", flush=True)
    assert err < 2e-2, "pallas mp conv mismatch on real grid"

    # grad spot check at scale (vs the scatter-free dense VJP)
    g_out = jnp.where(grid.mask[:, None],
                      jax.random.normal(key, (n, cin), jnp.float32), 0).astype(dt16)

    def gk(f, w):
        return jax.grad(
            lambda f_: jnp.sum(
                mp_conv.mp3_subm_conv(3, D, WLEN, f_, w, pack).astype(jnp.float32)
                * g_out.astype(jnp.float32)
            )
        )(f)

    def gr(f, w):
        return jax.grad(
            lambda f_: jnp.sum(
                sc.subm_conv(f_, w, idx).astype(jnp.float32)
                * g_out.astype(jnp.float32)
            )
        )(f)

    gk_v = np.asarray(jax.jit(gk)(feats, kern), np.float32)
    gr_v = np.asarray(jax.jit(gr)(feats, kern), np.float32)
    gerr = np.max(np.abs(gk_v[m] - gr_v[m])) / (np.max(np.abs(gr_v[m])) + 1e-9)
    print(f"[check] pallas-mp d_feats rel err: {gerr:.2e}", flush=True)
    assert gerr < 5e-2, "pallas mp d_feats mismatch"

    xwin = sparse.neighbor_xwin_info(grid, grid.coords, grid.mask, k4, s4, p4)
    jax.block_until_ready((xwin.rows, idx))

    for cin in widths:
        feats = jax.random.normal(key, (n, cin), jnp.float32).astype(dt16)
        feats = jnp.where(grid.mask[:, None], feats, 0)
        kern = (jax.random.normal(key, (27 * cin, cin), jnp.float32) * 0.05).astype(dt16)

        def fwd_mp(c, f, w):
            o = mp_conv.mp3_subm_conv(
                3, D, WLEN, f + jnp.asarray(c * 1e-30, dt16), w, pack)
            return c + jnp.sum(o[0]).astype(jnp.float32)

        def fb_mp(c, f, w):
            def loss(fw_):
                o = mp_conv.mp3_subm_conv(3, D, WLEN, fw_[0], fw_[1], pack)
                return jnp.sum(o.astype(jnp.float32) * o.astype(jnp.float32))

            v, g = jax.value_and_grad(loss)((f + jnp.asarray(c * 1e-30, dt16), w))
            return c + v * 0 + jnp.sum(g[0][0]).astype(jnp.float32)

        timed(f"pallas-mp fwd     {cin}ch bf16", fwd_mp, feats, kern)
        if not fwd_only:
            timed(f"pallas-mp fwd+bwd {cin}ch bf16", fb_mp, feats, kern)

        if cin <= 32:
            def fb_ref(c, f, w):
                def loss(fw_):
                    o = sc.subm_conv_xwin(3, fw_[0], fw_[1], ids, xwin.rows,
                                          xwin.xvalid)
                    return jnp.sum(o * o).astype(jnp.float32)

                v, g = jax.value_and_grad(loss)((f + jnp.asarray(c * 1e-30, dt16), w))
                return c + v * 0 + jnp.sum(g[0][0]).astype(jnp.float32)

            name = f"xwin  fwd+bwd     {cin}ch bf16 (round-2 path)"
        else:
            def fb_ref(c, f, w):
                def loss(fw_):
                    o = sc.subm_conv(fw_[0], fw_[1], idx)
                    return jnp.sum(o * o).astype(jnp.float32)

                v, g = jax.value_and_grad(loss)((f + jnp.asarray(c * 1e-30, dt16), w))
                return c + v * 0 + jnp.sum(g[0][0]).astype(jnp.float32)

            name = f"dense fwd+bwd     {cin}ch bf16 (round-2 path)"
        if not fwd_only:
            timed(name, fb_ref, feats, kern)


if __name__ == "__main__":
    main()
