"""Pallas TPU kernel: fused masked moments over the row axis.

MaskedBatchNorm (nn/layers.py) needs (masked mean, masked var) of an [N, C]
activation per layer — 12+ times per train step over up-to-96k-row tensors.
Expressed in jnp this is three separate passes over x (sum, centered square,
sum again); this kernel computes sum, sum-of-squares and count in ONE pass,
accumulating partials in VMEM scratch across a sequential row-tile grid (TPU
grid steps execute in order, so a `@pl.when(first/last)` init/flush pattern
gives a race-free reduction).

Falls back to interpreter mode off-TPU so tests and CPU runs share the code
path.

Measured on v5e at [96k, 64]: 1.8 ms vs 1.45 ms for the XLA-fused jnp
expression — XLA already fuses this reduction well, so MaskedBatchNorm keeps
the jnp path; this kernel stands as the Pallas scaffold (grid-sequential
scratch accumulation + custom VJP) for the ops where XLA does NOT fuse well
(the img2col gather pipeline, once Mosaic exposes vector gathers).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_ROWS = 1024


def _kernel(x_ref, m_ref, sum_ref, sumsq_ref, count_ref, acc_ref):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.float32)
    m = m_ref[...].astype(jnp.float32)  # [TILE, 1]
    xm = x * m
    # scalar VMEM stores are not lowerable — keep every accumulator a row
    acc_ref[0, :] += jnp.sum(xm, axis=0)
    acc_ref[1, :] += jnp.sum(xm * x, axis=0)  # mask is 0/1: (x*m)*x == m*x^2
    acc_ref[2, :] += jnp.broadcast_to(jnp.sum(m), acc_ref.shape[1:])

    @pl.when(step == n_steps - 1)
    def _():
        sum_ref[...] = acc_ref[0, :][None, :]
        sumsq_ref[...] = acc_ref[1, :][None, :]
        count_ref[...] = acc_ref[2:3, 0:1]


@partial(jax.jit, static_argnames=("interpret",))
def _masked_moments(x: jnp.ndarray, mask_f: jnp.ndarray, interpret: bool):
    n, c = x.shape
    tiles = pl.cdiv(n, _TILE_ROWS)
    pad = tiles * _TILE_ROWS - n
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        mask_f = jnp.pad(mask_f, ((0, pad), (0, 0)))
    s, ss, cnt = pl.pallas_call(
        _kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((_TILE_ROWS, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((3, c), jnp.float32)],
        interpret=interpret,
    )(x, mask_f)
    return s[0], ss[0], cnt[0, 0]


@jax.custom_vjp
def _stats_core(x: jnp.ndarray, mask_f: jnp.ndarray):
    interpret = jax.default_backend() != "tpu"
    s, ss, cnt = _masked_moments(x, mask_f, interpret)
    safe = jnp.maximum(cnt, 1.0)
    mean = s / safe
    var = jnp.maximum(ss / safe - mean * mean, 0.0)
    return mean, var, cnt


def _stats_fwd(x, mask_f):
    out = _stats_core(x, mask_f)
    mean, var, cnt = out
    return out, (x, mask_f, mean, jnp.maximum(cnt, 1.0))


def _stats_bwd(res, g):
    x, mask_f, mean, cnt = res
    g_mean, g_var, _ = g
    # d mean/dx = m/cnt ; d var/dx = 2 m (x - mean)/cnt  (biased variance)
    dx = mask_f * (g_mean[None, :] + 2.0 * g_var[None, :] * (x - mean[None, :])) / cnt
    return dx, None


_stats_core.defvjp(_stats_fwd, _stats_bwd)


def masked_stats(x: jnp.ndarray, mask: jnp.ndarray):
    """(mean [C], var [C], count) of x's valid rows in one fused pass.

    x [N, C]; mask [N] bool. Uses the Pallas kernel on TPU, interpreter mode
    elsewhere (identical numerics, f32 accumulation). Differentiable via an
    analytic VJP.
    """
    return _stats_core(x, mask.astype(jnp.float32)[:, None])
