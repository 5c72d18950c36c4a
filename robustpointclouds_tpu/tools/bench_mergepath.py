"""Merge-path ranks vs the packed rank sort at KITTI scale on the chip.

One group's worth of queries (n=96k table, m=96k sorted queries) and the
full 9-group load. Informs whether the round-3 index path should switch.

Run: python -m robustpointclouds_tpu.tools.bench_mergepath
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
    print(f"{name:44s} {(time.time()-t0)/ITERS*1e3:9.2f} ms/iter", flush=True)


def main():
    from robustpointclouds_tpu.ops import sparse

    print(f"device: {jax.devices()[0]}", flush=True)
    n = 96000
    rng = np.random.RandomState(0)
    ids = np.sort(rng.choice(50_000_000, n, replace=False)).astype(np.int32)
    ids_j = jnp.asarray(ids)
    deltas = jnp.asarray(rng.randint(-2000, 2000, 9), jnp.int32)

    def dep(c):
        # non-foldable carry dependency: (c*0) constant-folds for ints and
        # lets XLA hoist the whole body out of the timing loop
        return jnp.where(c > 1e30, 1, 0).astype(jnp.int32)

    def one_group_sort(c, t):
        q = t + dep(c) + 7
        r, d = sparse._rank_and_succ_delta(t, q, 3)
        return c + r[0].astype(jnp.float32) + d[0].astype(jnp.float32)

    def one_group_mp(c, t):
        q = t + dep(c) + 7
        r, d = sparse.merge_path_ranks(t, q, 3, tile=1024)
        return c + r[0].astype(jnp.float32) + d[0].astype(jnp.float32)

    def nine_groups_sort(c, t):
        # the production pattern: ONE sort over all 9 groups' queries
        qs = (t[None, :] + deltas[:, None] + dep(c)).reshape(-1)
        qs = jnp.sort(qs)  # concatenated groups are not sorted; sort path packs anyway
        r, d = sparse._rank_and_succ_delta(t, qs, 3)
        return c + r[0].astype(jnp.float32) + d[0].astype(jnp.float32)

    def nine_groups_mp(c, t):
        acc = c
        for g in range(9):
            q = t + deltas[g] + dep(c)
            r, d = sparse.merge_path_ranks(t, q, 3, tile=1024)
            acc = acc + r[0].astype(jnp.float32) + d[0].astype(jnp.float32)
        return acc

    timed("packed sort, 1 group (96k+96k keys)", one_group_sort, ids_j)
    timed("merge-path, 1 group", one_group_mp, ids_j)
    timed("packed sort, 9 groups (one 960k sort)", nine_groups_sort, ids_j)
    timed("merge-path, 9 groups (9 passes)", nine_groups_mp, ids_j)


if __name__ == "__main__":
    main()
