"""Pallas TPU kernel: merge-path one-hot gather-conv (the round-3 lever).

Replaces the XLA gather engine (~3.3 ns/row, PARITY.md measured constants)
AND the packed rank sorts for submanifold sparse convs. Per merge-path tile
(diagonal spacing D over (sorted table, sorted per-stream queries)) and per
lead-tap stream:

  1. DMA the query window [D, 1], table-id window [1, WLEN+] (row-form, so
     no in-kernel transposes), feature window [WLEN+, C], and validity
     windows into VMEM (double-buffered across the 9 streams: stream s+1's
     inputs are in flight while s computes).
  2. ``diff = tw - qw`` once; per tap dx the one-hot ``(diff == dx)`` is
     EXACT bf16 selection (ids unique, so at most one nonzero per row), and
     the merge-path boundary rule guarantees every owned query's match
     falls inside the window: t_off <= rank(q) <= t_off + D and, table ids
     being unique integers, rank(q+dx) <= rank(q) + dx (ops/mp_conv.py).
  3. The gather is ONE MXU matmul per tap, [D, WLEN] @ [WLEN, C]; the
     one-hot never leaves VMEM. (In pure XLA these operands are
     materialized through HBM — ~10 GB per 96k-row conv, measured 34.8 ms;
     tools/bench_mp_conv.py.)
  4. Masks fold in before/after the matmul: query-side x/lead validity for
     the forward ('out') and im2col ('col', plus tile-ownership so dW
     counts each query once) modes; table-side mirrored-tap masks (row-form
     tm2r, = leadvalid/xvalid of the forward pair) multiply INTO the
     one-hot for the tap-mirror d_feats pass ('bwd').
  5. 'out'/'bwd' apply the (block-reversed for 'bwd') weights in-kernel and
     DMA a [D, Cout] tile to the per-stream HBM buffer at the query offset;
     'col' DMAs each tap's [D, C] block to its lane slice. Later tiles
     overwrite the non-owned tail (grid steps are sequential; each step
     drains its output DMAs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MAX = np.iinfo(np.int32).max


def _mk_kernel(S, kx, D, WLEN, TWIN, C, cout, mode):
    """mode: 'out' (conv output, weights in-kernel), 'col' (im2col blocks),
    'bwd' (tap-mirror d_feats with table-side masks + reversed weights)."""

    def kernel(qoffs_ref,                      # [S, T+1] SMEM (scalar prefetch)
               tblr_ref, feats_ref, qs2_ref, xv2_ref, lv2_ref, tm2r_ref,
               w_ref,
               out_ref,                        # ANY: see OW in caller
               qw_s, twr_s, fw_s, xv_s, lv_s, tm_s, out_s,
               in_sems, out_sems):
        tau = pl.program_id(0)

        def make_in_dmas(s, slot):
            q_off = qoffs_ref[s, tau]
            t_off = tau * D - q_off
            dmas = [
                pltpu.make_async_copy(
                    qs2_ref.at[pl.ds(q_off, D), pl.ds(s, 1)],
                    qw_s.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    tblr_ref.at[:, pl.ds(t_off, TWIN)],
                    twr_s.at[slot], in_sems.at[slot, 1]),
                pltpu.make_async_copy(
                    feats_ref.at[pl.ds(t_off, TWIN), :],
                    fw_s.at[slot], in_sems.at[slot, 2]),
                pltpu.make_async_copy(
                    xv2_ref.at[pl.ds(q_off, D), :],
                    xv_s.at[slot], in_sems.at[slot, 3]),
                pltpu.make_async_copy(
                    lv2_ref.at[pl.ds(q_off, D), pl.ds(s, 1)],
                    lv_s.at[slot], in_sems.at[slot, 4]),
            ]
            if mode == "bwd":
                dmas.append(pltpu.make_async_copy(
                    tm2r_ref.at[pl.ds(s * kx, kx), pl.ds(t_off, TWIN)],
                    tm_s.at[slot], in_sems.at[slot, 5]))
            return dmas

        pending = make_in_dmas(0, 0)
        for d in pending:
            d.start()
        out_dmas = [[], []]
        # streams unrolled in Python so DMA descriptors carry across
        # iterations (stream s+1's inputs load while s computes)
        for s in range(S):
            slot = s % 2
            cur = pending
            if s + 1 < S:
                pending = make_in_dmas(s + 1, (s + 1) % 2)
                for d in pending:
                    d.start()
            for d in cur:
                d.wait()
            for od in out_dmas[slot]:
                od.wait()
            out_dmas[slot] = []

            qw = qw_s[slot]                     # [D, 1] int32
            twr = twr_s[slot][:, :WLEN]         # [1, WLEN] int32
            fw = fw_s[slot][:WLEN]              # [WLEN, C] bf16
            diff = twr - qw                     # [D, WLEN] int32
            xv = xv_s[slot]                     # [D, kx] bf16 (query-side)
            lv = lv_s[slot]                     # [D, 1]  bf16

            q_off = qoffs_ref[s, tau]
            if mode == "col":
                qo_next = qoffs_ref[s, tau + 1]
                own = (
                    jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0) + q_off
                    < qo_next
                ).astype(jnp.bfloat16)

            acc = None
            for dx in range(kx):
                oh = (diff == dx).astype(jnp.bfloat16)   # [D, WLEN]
                if mode == "bwd":
                    # table-side mask of the mirrored forward tap, folded
                    # into the one-hot before the matmul
                    oh = oh * tm_s[slot][dx:dx + 1, :WLEN]
                g = jnp.dot(oh, fw, preferred_element_type=jnp.float32)
                g = g.astype(jnp.bfloat16)               # exact: selection
                if mode != "bwd":
                    g = g * xv[:, dx:dx + 1] * lv
                if mode == "col":
                    g = g * own
                    out_s[slot, dx] = g
                    od = pltpu.make_async_copy(
                        out_s.at[slot, dx],
                        out_ref.at[s, pl.ds(q_off, D),
                                   pl.ds(dx * C, C)],
                        out_sems.at[slot, dx])
                    od.start()
                    out_dmas[slot].append(od)
                else:
                    w_dx = w_ref[s, dx]          # [C, cout]
                    part = jnp.dot(g, w_dx, preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
            if mode != "col":
                out_s[slot, 0] = acc.astype(jnp.bfloat16)
                od = pltpu.make_async_copy(
                    out_s.at[slot, 0],
                    out_ref.at[s, pl.ds(q_off, D), :],
                    out_sems.at[slot, 0])
                od.start()
                out_dmas[slot] = [od]

        # drain before the next grid step may overwrite overlapping rows
        for slot in range(2):
            for od in out_dmas[slot]:
                od.wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("S", "kx", "D", "wlen", "cout", "mode", "interpret"),
)
def mp_gather_conv(
    feats,      # [n + TWIN, C] bf16 payload (zero padding rows)
    w,          # [S, kx, C, cout] bf16 (ignored in 'col' mode)
    tblr,       # [1, n + TWIN] int32 row-form sorted ids (pad INT32_MAX)
    qs2,        # [m + D, S] int32 per-stream query values (sorted columns)
    xv2,        # [m + D, kx] bf16 query-side x-validity
    lv2,        # [m + D, S] bf16 query-side lead-validity
    tm2r,       # [S*kx, n + TWIN] bf16 row-form table-side mirror masks
    q_offs,     # [S, T+1] int32 merge-path boundaries at spacing D
    *, S, kx, D, wlen, cout, mode="out", interpret=False,
):
    """Run the merge-path gather-conv kernel.

    Returns [S, m + D, OW]: OW = cout for 'out'/'bwd', kx*C for 'col'
    (tap-major im2col blocks, query-masked and tile-owned)."""
    TWIN = wlen + 8
    m = qs2.shape[0] - D
    C = feats.shape[1]
    OW = cout if mode in ("out", "bwd") else kx * C
    T = q_offs.shape[1] - 1
    kern = _mk_kernel(S, kx, D, wlen, TWIN, C, cout, mode)
    n_out_scratch = kx if mode == "col" else 1
    scratch_c = C if mode == "col" else cout

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # tblr
            pl.BlockSpec(memory_space=pltpu.HBM),   # feats
            pl.BlockSpec(memory_space=pltpu.HBM),   # qs2
            pl.BlockSpec(memory_space=pltpu.HBM),   # xv2
            pl.BlockSpec(memory_space=pltpu.HBM),   # lv2
            pl.BlockSpec(memory_space=pltpu.HBM),   # tm2r
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w (resident)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, D, 1), jnp.int32),        # qw
            pltpu.VMEM((2, 1, TWIN), jnp.int32),     # twr
            pltpu.VMEM((2, TWIN, C), jnp.bfloat16),  # fw
            pltpu.VMEM((2, D, kx), jnp.bfloat16),    # xv
            pltpu.VMEM((2, D, 1), jnp.bfloat16),     # lv
            pltpu.VMEM((2, kx, TWIN), jnp.bfloat16),  # tm (bwd)
            pltpu.VMEM((2, n_out_scratch, D, scratch_c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 6)),
            pltpu.SemaphoreType.DMA((2, max(kx, 1))),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, m + D, OW), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(q_offs, tblr, feats, qs2, xv2, lv2, tm2r, w)
