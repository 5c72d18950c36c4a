"""Microbenchmarks for the sparse-conv primitives on the attached accelerator.

Times the operations that dominate the adversarial train step (BASELINE.md
round-1 profile: middle-encoder gathers + index-build sorts ~60% of the step)
so kernel redesigns can be evaluated in isolation. Every measurement cycles
through several distinct inputs — repeated identical dispatches can be
memoized by remote-device tunnels and report impossible numbers.

Run: python -m robustpointclouds_tpu.tools.microbench
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N_VARIANTS = 4


def timeit(fn, variants, iters=16, warmup=None):
    """variants: list of arg-tuples, cycled. Returns s/iter."""
    outs = [fn(*v) for v in variants]
    jax.block_until_ready(outs)
    t0 = time.time()
    outs = []
    for i in range(iters):
        outs.append(fn(*variants[i % len(variants)]))
    jax.block_until_ready(outs)
    return (time.time() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    N = 96_000  # B=6 x 16k voxels
    print(f"device: {jax.devices()[0]}, N={N}")

    for C in (16, 32, 64):
        feats_v = [
            jnp.asarray(rng.randn(N + 1, C).astype(np.float32))
            for _ in range(N_VARIANTS)
        ]
        M = 27 * N
        idx_v = [
            jnp.asarray(rng.randint(0, N, size=(M,)).astype(np.int32))
            for _ in range(N_VARIANTS)
        ]

        row_gather = jax.jit(lambda f, i: f[i])
        t = timeit(row_gather, list(zip(feats_v, idx_v)))
        print(f"C={C:3d} row-gather 27N rows f32 : {t*1e3:8.3f} ms  "
              f"({t/M*1e9:5.2f} ns/row, {M*C*4/t/1e9:6.1f} GB/s)")
        featsb_v = [f.astype(jnp.bfloat16) for f in feats_v]
        t = timeit(row_gather, list(zip(featsb_v, idx_v)))
        print(f"C={C:3d} row-gather 27N rows bf16: {t*1e3:8.3f} ms  "
              f"({t/M*1e9:5.2f} ns/row, {M*C*2/t/1e9:6.1f} GB/s)")

        # img2col-shaped gather: [N, 27] indices -> [N, 27*C] col
        idx2_v = [i.reshape(N, 27) for i in idx_v]
        col_gather = jax.jit(lambda f, i: f[i].reshape(N, 27 * C))
        t = timeit(col_gather, list(zip(feats_v, idx2_v)))
        print(f"C={C:3d} col-gather [N,27]->[N,27C] f32 : {t*1e3:8.3f} ms")

        # col matmul
        K = 27
        col_v = [jnp.asarray(rng.randn(N, K * C).astype(np.float32)) for _ in range(2)]
        w = jnp.asarray(rng.randn(K * C, C).astype(np.float32))
        mm = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
        t = timeit(mm, [(c, w) for c in col_v])
        print(f"C={C:3d} col-matmul [N,{K*C}]x[{K*C},{C}] f32 : {t*1e3:8.3f} ms  "
              f"({2*N*K*C*C/t/1e12:6.2f} TFLOP/s)")
        t = timeit(mm, [(c.astype(jnp.bfloat16), w.astype(jnp.bfloat16)) for c in col_v])
        print(f"C={C:3d} col-matmul bf16              : {t*1e3:8.3f} ms")

        # fused gather+matmul (the subm_conv forward)
        wk = jnp.asarray(rng.randn(K * C, C).astype(np.float32))
        conv = jax.jit(
            lambda f, i, w_: jnp.dot(
                f[i].reshape(N, K * C), w_, preferred_element_type=jnp.float32
            )
        )
        t = timeit(conv, [(f, i, wk) for f, i in zip(feats_v, idx2_v)])
        print(f"C={C:3d} gather+matmul fused f32      : {t*1e3:8.3f} ms")

    # rank sort (neighbor index build): 10N and 28N keys
    for m in (10 * N, 28 * N):
        kv = [
            (jnp.asarray(rng.randint(0, 2**30, size=(m,)).astype(np.int32)),
             jnp.asarray(np.arange(m, dtype=np.int32)))
            for _ in range(N_VARIANTS)
        ]
        srt = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
        t = timeit(srt, kv)
        print(f"key+payload sort {m/1e6:.2f}M keys: {t*1e3:8.3f} ms")

    # argsort of N keys (voxelizer/batch merge)
    kv = [jnp.asarray(rng.randint(0, 2**30, size=(N,)).astype(np.int32))
          for _ in range(N_VARIANTS)]
    t = timeit(jax.jit(jnp.argsort), [(k,) for k in kv])
    print(f"argsort {N/1e3:.0f}k keys: {t*1e3:8.3f} ms")

    # scatter (inverse-index build alternative): 27N int32 scatter
    m = 27 * N
    sv = [
        (jnp.zeros((N + 1,), jnp.int32),
         jnp.asarray(rng.randint(0, N, size=(m,)).astype(np.int32)),
         jnp.asarray(np.arange(m, dtype=np.int32)))
        for _ in range(N_VARIANTS)
    ]
    sc = jax.jit(lambda t_, i, v: t_.at[i].max(v))
    t = timeit(sc, sv)
    print(f"int32 scatter-max {m/1e6:.2f}M elems: {t*1e3:8.3f} ms")

    # float scatter-add [N rows, C] (the dense BEV scatter / strided bwd)
    for C in (64, 128):
        sv = [
            (jnp.asarray(rng.randn(N + 1, C).astype(np.float32)),
             jnp.asarray(rng.randint(0, N, size=(N,)).astype(np.int32)),
             jnp.asarray(rng.randn(N, C).astype(np.float32)))
            for _ in range(2)
        ]
        sca = jax.jit(lambda t_, i, v: t_.at[i].add(v))
        t = timeit(sca, sv)
        print(f"f32 scatter-add N rows C={C}: {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
