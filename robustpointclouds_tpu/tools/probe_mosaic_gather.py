"""Probe: which gather formulations lower in Mosaic/Pallas on this chip.

Round 1 found take_along_axis failing to lower; this probes the current
toolchain with several variants at tiny sizes (fast compiles), then times the
winner at KITTI scale vs the XLA gather. Informs whether a Pallas fused
gather-conv is feasible.

Run: python -m robustpointclouds_tpu.tools.probe_mosaic_gather
"""
from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_variant(name, fn):
    try:
        out = fn()
        out.block_until_ready()
        print(f"[ok]   {name}: {np.asarray(out).ravel()[:4]}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    print(f"device: {jax.devices()[0]}, jax {jax.__version__}", flush=True)
    n, c, m = 512, 128, 256
    x = jnp.asarray(np.random.RandomState(0).randn(n, c), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(1).randint(0, n, m), jnp.int32)

    def k_take(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)

    def k_tal(x_ref, i_ref, o_ref):
        ii = i_ref[:][:, None]
        o_ref[:] = jnp.take_along_axis(x_ref[:], jnp.broadcast_to(ii, (m, c)), axis=0)

    def k_loop(x_ref, i_ref, o_ref):
        def body(j, _):
            o_ref[j, :] = x_ref[i_ref[j], :]
            return 0

        jax.lax.fori_loop(0, m, body, 0)

    def k_onehot(x_ref, i_ref, o_ref):
        oh = (i_ref[:][:, None] == jax.lax.broadcasted_iota(jnp.int32, (m, n), 1))
        o_ref[:] = jnp.dot(oh.astype(jnp.float32), x_ref[:],
                           preferred_element_type=jnp.float32)

    variants = [("jnp.take", k_take), ("take_along_axis", k_tal),
                ("fori pl-row", k_loop), ("one-hot matmul", k_onehot)]
    results = {}
    for name, k in variants:
        results[name] = try_variant(
            name,
            lambda k=k: pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((m, c), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)
                          if k is k_loop else pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, idx),
        )

    # correctness for whichever lowered
    ref = np.asarray(x)[np.asarray(idx)]
    for name, k in variants:
        if not results.get(name):
            continue
        try:
            out = pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((m, c), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)
                          if k is k_loop else pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, idx)
            np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)
            print(f"[correct] {name}", flush=True)
        except AssertionError:
            print(f"[WRONG]  {name}", flush=True)
        except Exception as e:
            print(f"[err]    {name}: {e}", flush=True)

    # scale timing for the winner(s): 96k x 64 bf16 table, 864k-row gather
    def timed(name, f, *args):
        o = f(*args)
        o.block_until_ready()
        t0 = time.time()
        for _ in range(5):
            o = f(*args)
        o.block_until_ready()
        print(f"{name:40s} {(time.time()-t0)/5*1e3:8.2f} ms", flush=True)

    if results.get("jnp.take"):
        N, C = 96000, 64
        M = 96000 * 9
        TILE = 4096
        xb = jnp.asarray(np.random.RandomState(2).randn(N, C), jnp.bfloat16)
        ib = jnp.asarray(np.random.RandomState(3).randint(0, N, M), jnp.int32)

        def kg(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)

        @jax.jit
        def pallas_gather(x, i):
            return pl.pallas_call(
                kg,
                grid=(M // TILE,),
                out_shape=jax.ShapeDtypeStruct((M, C), jnp.bfloat16),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # full table resident
                    pl.BlockSpec((TILE,), lambda t: (t,), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TILE, C), lambda t: (t, 0),
                                       memory_space=pltpu.VMEM),
            )(x, i)

        @jax.jit
        def xla_gather(x, i):
            return jnp.concatenate([x, jnp.zeros((1, C), x.dtype)], 0)[i]

        try:
            out = pallas_gather(xb, ib)
            out.block_until_ready()
            ok = np.allclose(
                np.asarray(out[:1000], np.float32),
                np.asarray(xb, np.float32)[np.asarray(ib[:1000])],
            )
            print(f"[scale] pallas gather correct={ok}", flush=True)
            timed("pallas VMEM-resident gather 864k rows", pallas_gather, xb, ib)
            timed("XLA gather 864k rows", xla_gather, xb, ib)
        except Exception:
            print("[scale] pallas gather failed:", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
