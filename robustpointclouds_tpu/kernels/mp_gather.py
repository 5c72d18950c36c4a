"""Pallas TPU kernel: merge-path one-hot gather-conv (the round-3 lever).

Replaces the XLA gather engine (~3.3 ns/row, PARITY.md measured constants)
AND the packed rank sorts for submanifold sparse convs. Per merge-path tile
(diagonal spacing D over (sorted table, sorted per-stream queries)) and per
lead-tap stream:

  1. DMA the table-id window (col-form [TWIN, 1]: table rides SUBLANES),
     query window (row-form: queries ride LANES), feature window [TWIN, C],
     and validity rows into VMEM, double-buffered across the 9 streams
     (stream s+1's inputs are in flight while s computes).
  2. ``diff = twc - qw`` once ([TWIN, DW]); per tap dx the one-hot
     ``(diff == dx)`` is EXACT bf16 selection (ids unique: at most one
     nonzero per column), and the merge-path boundary rule guarantees every
     owned query's match falls inside the window: t_off <= rank(q) <=
     t_off + D and, table ids being unique integers, rank(q+dx) <= rank(q)
     + dx (ops/mp_conv.py).
  3. The gather is ONE MXU matmul per tap — dot_general contracting the
     sublane dim: oh [TWIN, DW] x fw [TWIN, C] -> [DW, C]. The one-hot
     never leaves VMEM (in pure XLA these operands are materialized through
     HBM: ~10 GB per 96k-row conv, measured 34.8 ms; tools/bench_mp_conv).
  4. 'out'/'bwd' apply the (block-reversed for 'bwd') weights in-kernel;
     'col' emits each tap's im2col block to its own leading index.

Mosaic DMA constraint handling — slice shapes AND offsets must be
tile-aligned (int32: (8,128), bf16: (16,128)):
  * query-side windows start at qa = floor128(q_off) and span DW = D + 128
    lanes; the extra leading (non-owned) queries may fall outside the table
    window and compute garbage, so every output tile is blended
    READ-MODIFY-WRITE with the true ownership mask [q_off, q_off_next)
    before writing back — grid steps are sequential and each step drains
    its DMAs, so the read always sees the previous tile's blend.
  * table-side windows start at ta = floor16(t_off): extra LEADING table
    rows are harmless (matching is by value; ids are globally unique), and
    TWIN = D + 128 >= 15 + D + kx covers the owned ranks.
  * per-stream rows are stored replicated at tile-aligned row offsets
    (int32 stream s at row 8s, bf16 at 16s).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MAX = np.iinfo(np.int32).max
TM_LANES = 128  # packed mirror-mask block width (S*kx <= 128)
QPAD = 128      # query-window alignment (lane tiling)
TPAD = 16       # table-window alignment (bf16 sublane tiling)


def _mk_kernel(S, kx, D, TWIN, C, cout, mode):
    """mode: 'out' (conv output, weights in-kernel), 'col' (im2col blocks),
    'bwd' (tap-mirror d_feats with table-side masks + reversed weights)."""
    DW = D + QPAD
    OB = 1 if mode in ("out", "bwd") else kx
    OW = cout if mode in ("out", "bwd") else C

    def kernel(qoffs_ref,                      # [S, T+1] SMEM (scalar prefetch)
               tblc_ref, feats_ref, qsr_ref, xvr_ref, lvr_ref, tmc_ref,
               w_ref,
               out_ref,
               qw_s, twc_s, fw_s, xv_s, lv_s, tm_s, old_s, out_s,
               in_sems, out_sems):
        tau = pl.program_id(0)

        def offsets(s):
            q_off = qoffs_ref[s, tau]
            qa = pl.multiple_of((q_off // QPAD) * QPAD, QPAD)
            t_off = tau * D - q_off
            ta = pl.multiple_of(
                jnp.maximum((t_off // TPAD) * TPAD, 0), TPAD
            )
            return q_off, qa, ta

        def make_in_dmas(s, slot):
            q_off, qa, ta = offsets(s)
            dmas = [
                pltpu.make_async_copy(
                    qsr_ref.at[pl.ds(s * 8, 8), pl.ds(qa, DW)],
                    qw_s.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    tblc_ref.at[pl.ds(ta, TWIN), :],
                    twc_s.at[slot], in_sems.at[slot, 1]),  # [TWIN, 128] block
                pltpu.make_async_copy(
                    feats_ref.at[pl.ds(ta, TWIN), :],
                    fw_s.at[slot], in_sems.at[slot, 2]),
                pltpu.make_async_copy(
                    xvr_ref.at[:, pl.ds(qa, DW)],
                    xv_s.at[slot], in_sems.at[slot, 3]),
                pltpu.make_async_copy(
                    lvr_ref.at[pl.ds(s * 16, 16), pl.ds(qa, DW)],
                    lv_s.at[slot], in_sems.at[slot, 4]),
            ]
            for ob in range(OB):
                dmas.append(pltpu.make_async_copy(
                    out_ref.at[s, ob, pl.ds(qa, DW), :],
                    old_s.at[slot, ob], in_sems.at[slot, 5 + ob]))
            if mode == "bwd":
                dmas.append(pltpu.make_async_copy(
                    tmc_ref.at[pl.ds(ta, TWIN), :],
                    tm_s.at[slot], in_sems.at[slot, 5 + OB]))
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

            qw = qw_s[slot][0:1]                # [1, DW] int32 (row 0)
            twc = twc_s[slot][:, 0:1]           # [TWIN, 1] int32 (col 0)
            fw = fw_s[slot]                     # [TWIN, C] bf16
            diff = twc - qw                     # [TWIN, DW] int32
            lv = lv_s[slot][0:1]                # [1, DW] bf16 (query-side)

            q_off, qa, ta = offsets(s)
            qo_next = qoffs_ref[s, tau + 1]
            # ownership as a COLUMN (avoids a lane->sublane transpose): the
            # gather output g is [DW, C] with queries on sublanes
            row = jax.lax.broadcasted_iota(jnp.int32, (DW, 1), 0) + qa
            own = (row >= q_off) & (row < qo_next)  # bool [DW, 1]

            acc = None
            for dx in range(kx):
                oh = (diff == dx).astype(jnp.bfloat16)   # [TWIN, DW]
                if mode == "bwd":
                    # table-side mask of the mirrored forward tap (a column
                    # of the packed block), folded into the one-hot rows
                    oh = oh * tm_s[slot][:, s * kx + dx: s * kx + dx + 1]
                else:
                    oh = oh * (xv_s[slot][dx: dx + 1, :] * lv)
                g = jax.lax.dot_general(
                    oh, fw, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)                   # [DW, C]; exact: selection
                if mode == "col":
                    # ownership blend (SELECT, not arithmetic: the first
                    # touch of an output row reads uninitialized memory and
                    # NaN*0 would poison it): only this tile's true query
                    # range overwrites, everything else keeps old content
                    out_s[slot, dx] = jnp.where(own, g, old_s[slot, dx])
                    od = pltpu.make_async_copy(
                        out_s.at[slot, dx],
                        out_ref.at[s, dx, pl.ds(qa, DW), :],
                        out_sems.at[slot, dx])
                    od.start()
                    out_dmas[slot].append(od)
                else:
                    w_dx = w_ref[s, dx]          # [C, cout]
                    part = jnp.dot(g, w_dx, preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
            if mode != "col":
                out_s[slot, 0] = jnp.where(
                    own, acc.astype(jnp.bfloat16), old_s[slot, 0]
                )
                od = pltpu.make_async_copy(
                    out_s.at[slot, 0],
                    out_ref.at[s, 0, pl.ds(qa, DW), :],
                    out_sems.at[slot, 0])
                od.start()
                out_dmas[slot] = [od]

        # drain before the next grid step reads/overwrites overlapping rows
        for slot in range(2):
            for od in out_dmas[slot]:
                od.wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("S", "kx", "D", "wlen", "cout", "mode", "interpret"),
)
def mp_gather_conv(
    feats,      # [n + TWIN + TPAD, C] bf16 payload (zero padding rows);
                #   C must be a multiple of 128 — narrow-lane HBM DMA slices
                #   are illegal, and tiled layouts pad lanes to 128 anyway,
                #   so callers zero-pad channels (ops/mp_conv._pad_lanes)
    w,          # [S, kx, C, cout] bf16 (ignored in 'col' mode)
    tblc,       # [n + TWIN + TPAD, 128] int32; ids in col 0 (a [n, 1] array
                #   is physically 128-lane padded anyway — full-width slices
                #   keep the DMA legal)
    qsr,        # [S*8, m + D + QPAD] int32 query rows (stream s at row 8s)
    xvr,        # [16, m + D + QPAD] bf16 x-validity rows (kx used)
    lvr,        # [S*16, m + D + QPAD] bf16 lead-validity (stream s at 16s)
    tmc,        # [n + TWIN + TPAD, TM_LANES] bf16 packed mirror masks
    q_offs,     # [S, T+1] int32 merge-path boundaries at spacing D
    *, S, kx, D, wlen, cout, mode="out", interpret=False,
):
    """Run the merge-path gather-conv kernel.

    wlen is the table window (TWIN = wlen, >= D + QPAD). Returns
    [S, OB, m + D + QPAD, OW]: ('out'/'bwd') OB=1, OW=cout; ('col') OB=kx
    tap blocks of OW=C, query-masked and ownership-blended."""
    assert S * kx <= TM_LANES
    assert feats.shape[1] % 128 == 0, "pad channels to 128 (lane DMA rule)"
    if mode in ("out", "bwd"):
        assert cout % 128 == 0, "pad cout to 128 (lane DMA rule)"
    TWIN = wlen
    # table window needs the owned ranks only: [ta >= t_off-(TPAD-1),
    # ta+TWIN) must span [t_off, t_off + D + kx)
    assert TWIN >= TPAD - 1 + D + kx and TWIN % TPAD == 0
    DW = D + QPAD
    m = qsr.shape[1] - DW
    C = feats.shape[1]
    OW = cout if mode in ("out", "bwd") else C
    OB = 1 if mode in ("out", "bwd") else kx
    T = q_offs.shape[1] - 1
    kern = _mk_kernel(S, kx, D, TWIN, C, cout, mode)
    n_in_sems = 5 + OB + (1 if mode == "bwd" else 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # tblc
            pl.BlockSpec(memory_space=pltpu.HBM),   # feats
            pl.BlockSpec(memory_space=pltpu.HBM),   # qsr
            pl.BlockSpec(memory_space=pltpu.HBM),   # xvr
            pl.BlockSpec(memory_space=pltpu.HBM),   # lvr
            pl.BlockSpec(memory_space=pltpu.HBM),   # tmc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w (resident)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, DW), jnp.int32),        # qw row block
            pltpu.VMEM((2, TWIN, 128), jnp.int32),    # twc block
            pltpu.VMEM((2, TWIN, C), jnp.bfloat16),   # fw
            pltpu.VMEM((2, 16, DW), jnp.bfloat16),    # xv rows
            pltpu.VMEM((2, 16, DW), jnp.bfloat16),    # lv row block
            pltpu.VMEM((2, TWIN, TM_LANES), jnp.bfloat16),  # tm (bwd)
            pltpu.VMEM((2, OB, DW, OW), jnp.bfloat16),      # old (RMW)
            pltpu.VMEM((2, OB, DW, OW), jnp.bfloat16),      # out tile
            pltpu.SemaphoreType.DMA((2, n_in_sems)),
            pltpu.SemaphoreType.DMA((2, max(kx, 1))),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, OB, m + DW, OW), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(q_offs, tblc, feats, qsr, xvr, lvr, tmc, w)
