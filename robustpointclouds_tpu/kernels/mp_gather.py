"""Pallas TPU kernel: merge-path windowed gather-conv (the round-3 lever).

Replaces the XLA gather engine (~3.3 ns/row, PARITY.md measured constants)
AND the packed rank sorts for submanifold sparse convs. Per merge-path tile
(diagonal spacing D over (sorted table, sorted per-stream queries)) and per
lead-tap stream:

  1. DMA the query window [D] and table window [WLEN >= D + 2kx] (ids row- &
     col-form), feature window [WLEN+, C], and validity windows into VMEM.
  2. One [D, WLEN] compare gives the window-local insertion rank `rel` (row
     sum of tw < q0) and the successor delta `d0 = tw[rel] - q0` (masked row
     min) — the merge-path guarantee puts every owned query's matches inside
     the window (ops/mp_conv.py derivation).
  3. Build the x-window table `win3[b] = [F(tw[b]), F(tw[b]+1), F(tw[b]+2)]`
     from shifted in-VMEM compares (sorted unique ids: the row holding
     tw[b]+v can only sit at b+1..b+v).
  4. One-hot on the RANK: `oh = (iota == rel)` in bf16 — exact selection —
     and ONE MXU matmul `oh @ win3` of shape [D, WLEN] x [WLEN, kx*C]
     (N = kx*C fills the 128-lane tile at 64ch, vs N=C for per-tap one-hots).
  5. Realign by d0 (3-way select of shifted channel blocks): tap dx of the
     im2col row is win3 slot dx - d0, empty below d0 — exactly the rank+d0
     anchoring of ops/sparse.XWindowInfo, done in-register.
  6. Apply validity masks and either the weights (mode='out'), nothing
     (mode='col', the im2col for dW), or gathered mask-bit channels plus
     block-reversed weights (mode='bwd', the tap-mirror d_feats pass).
  7. DMA the [D, out_width] tile to the per-stream HBM buffer at the query
     offset; later tiles overwrite the non-owned tail (grid steps are
     sequential, and each step waits its output DMAs).

The one-hot/compare matrices never leave VMEM — in pure XLA the 27 bf16
one-hot operands are materialized through HBM (~10 GB per 96k-row conv,
measured 34.8 ms; see tools/bench_mp_conv.py), which is the whole cost.

Double-buffered across the 9 streams inside each grid step: stream s+1's
input DMAs are in flight while stream s computes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MAX = np.iinfo(np.int32).max


def _mk_kernel(S, kx, D, WLEN, TWIN, C, n_rows, m_rows, cout, mode):
    """mode: 'out' (conv output, weights in-kernel), 'col' (im2col rows),
    'bwd' (mirror d_feats: payload has C feature + kx mask channels)."""
    BL = WLEN + 1
    CH = C + (kx if mode == "bwd" else 0)   # channels per win3 slot
    OW = cout if mode in ("out", "bwd") else kx * C

    def kernel(qoffs_ref,                      # [S, T+1] SMEM (scalar prefetch)
               tblr_ref, tblc_ref, feats_ref, qs2_ref, xv2_ref, lv2_ref,
               tm2_ref, w_ref,
               out_ref,                        # [S, m + D, OW] ANY
               qw_s, twr_s, twc_s, fw_s, xv_s, lv_s, tm_s, out_s,
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
                    tblc_ref.at[pl.ds(t_off, TWIN), :],
                    twc_s.at[slot], in_sems.at[slot, 2]),
                pltpu.make_async_copy(
                    feats_ref.at[pl.ds(t_off, TWIN), :],
                    fw_s.at[slot], in_sems.at[slot, 3]),
                pltpu.make_async_copy(
                    xv2_ref.at[pl.ds(q_off, D), :],
                    xv_s.at[slot], in_sems.at[slot, 4]),
                pltpu.make_async_copy(
                    lv2_ref.at[pl.ds(q_off, D), pl.ds(s, 1)],
                    lv_s.at[slot], in_sems.at[slot, 5]),
            ]
            if mode == "bwd":
                dmas.append(pltpu.make_async_copy(
                    tm2_ref.at[pl.ds(t_off, TWIN), pl.ds(s * kx, kx)],
                    tm_s.at[slot], in_sems.at[slot, 6]))
            return dmas

        pending = make_in_dmas(0, 0)
        for d in pending:
            d.start()
        out_dmas = [None, None]
        # streams unrolled in Python: DMA descriptors carry across
        # iterations so stream s+1's inputs load while s computes
        for s in range(S):
            slot = s % 2
            cur = pending
            if s + 1 < S:
                pending = make_in_dmas(s + 1, (s + 1) % 2)
                for d in pending:
                    d.start()
            for d in cur:
                d.wait()
            if out_dmas[slot] is not None:
                out_dmas[slot].wait()

            qw = qw_s[slot]                     # [D, 1] int32
            twr = twr_s[slot][:, :WLEN]         # [1, WLEN] int32
            twc = twc_s[slot]                   # [TWIN, 1] int32
            fw = fw_s[slot]                     # [TWIN, C] bf16
            if mode == "bwd":
                # payload rows carry their per-(stream, mirrored-tap) mask
                # bits as kx extra channels, gathered alongside the features
                fw = jnp.concatenate([fw, tm_s[slot]], axis=1)  # [TWIN, CH]

            lt = twr < qw                       # [D, WLEN]
            rel = jnp.sum(lt.astype(jnp.int32), axis=1, keepdims=True)
            succ = jnp.min(
                jnp.where(lt, INT32_MAX, jnp.broadcast_to(twr, lt.shape)),
                axis=1, keepdims=True)
            d0 = succ - qw                      # [D, 1] int32 (>= 0; huge on miss)

            bi = jax.lax.broadcasted_iota(jnp.int32, (D, WLEN), 1)
            oh = (bi == rel).astype(jnp.bfloat16)

            # win3[b, v*CH:(v+1)*CH] = payload of the row with id twc[b]+v
            slots = [fw[:BL]]
            for v in range(1, kx):
                acc = jnp.zeros((BL, CH), jnp.bfloat16)
                for sh in range(1, v + 1):
                    hit = (twc[sh:sh + BL] == twc[:BL] + v)
                    acc = acc + jnp.where(hit, fw[sh:sh + BL], 0)
                slots.append(acc)
            win3 = jnp.concatenate(slots, axis=1)      # [BL, kx*CH]

            gathered = jnp.dot(
                oh, win3[:WLEN], preferred_element_type=jnp.float32
            )                                           # [D, kx*CH]

            # realign: tap dx = win3 slot (dx - d0); zero below d0
            col = jnp.zeros((D, kx * CH), jnp.float32)
            for v in range(kx):
                if v == 0:
                    shifted = gathered
                else:
                    shifted = jnp.concatenate(
                        [jnp.zeros((D, v * CH), jnp.float32),
                         gathered[:, : (kx - v) * CH]], axis=1)
                col = jnp.where(d0 == v, shifted, col)
            col = col.astype(jnp.bfloat16)

            xv = xv_s[slot]                     # [D, kx] bf16 (query-side)
            lv = lv_s[slot]                     # [D, 1]  bf16
            if mode == "bwd":
                # strip the gathered mask-bit channels and apply them: the
                # forward's (leadvalid & xvalid) of the mirrored tap, a
                # property of the GATHERED row, rode along as channels
                parts = []
                for dx in range(kx):
                    blk = col[:, dx * CH: dx * CH + C]
                    mbit = col[:, dx * CH + C + dx: dx * CH + C + dx + 1]
                    parts.append(blk * mbit)
                col = jnp.concatenate(parts, axis=1)    # [D, kx*C]
            else:
                parts = [
                    col[:, dx * C: (dx + 1) * C] * xv[:, dx: dx + 1]
                    for dx in range(kx)
                ]
                col = jnp.concatenate(parts, axis=1) * lv

            if mode == "col":
                # ownership mask: each query row contributes to dW exactly
                # once, from the tile that owns it
                q_off = qoffs_ref[s, tau]
                qo_next = qoffs_ref[s, tau + 1]
                ridx = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0) + q_off
                col = col * (ridx < qo_next).astype(jnp.bfloat16)
                out_s[slot] = col
            else:
                w_sl = w_ref[s]                 # [kx*C, cout]
                out_s[slot] = jnp.dot(
                    col, w_sl, preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)

            q_off = qoffs_ref[s, tau]
            od = pltpu.make_async_copy(
                out_s.at[slot],
                out_ref.at[s, pl.ds(q_off, D), :],
                out_sems.at[slot])
            od.start()
            out_dmas[slot] = od

        # drain the remaining output DMAs before the next grid step may
        # overwrite overlapping rows of the same stream buffers
        for od in out_dmas:
            if od is not None:
                od.wait()

    return kernel, CH, OW


@functools.partial(
    jax.jit,
    static_argnames=("S", "kx", "D", "wlen", "cout", "mode", "interpret"),
)
def mp_gather_conv(
    feats,      # [n_pad_rows, CH] bf16 (payload; zero padding rows)
    w,          # [S, kx*C, cout] bf16 (ignored in 'col' mode, pass zeros[S,1,1])
    tblr,       # [1, n + TWIN] int32 row-form sorted ids (pad INT32_MAX)
    tblc,       # [n + TWIN, 1] int32 col-form
    qs2,        # [m + D, S] int32 per-stream query values (sorted columns)
    xv2,        # [m + D, kx] bf16 query-side x-validity
    lv2,        # [m + D, S] bf16 query-side lead-validity
    tm2,        # [n + TWIN, S*kx] bf16 table-side mirror masks ('bwd' mode)
    q_offs,     # [S, T+1] int32 merge-path boundaries at spacing D
    *, S, kx, D, wlen, cout, mode="out", interpret=False,
):
    """Run the merge-path gather-conv kernel; returns [S, m + D, OW]."""
    TWIN = wlen + 8
    m = qs2.shape[0] - D
    n = tblc.shape[0] - TWIN
    C = feats.shape[1]
    OW = cout if mode in ("out", "bwd") else kx * C
    T = q_offs.shape[1] - 1
    kern, _, _ = _mk_kernel(S, kx, D, wlen, TWIN, C, n, m, cout, mode)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # tblr
            pl.BlockSpec(memory_space=pl.ANY),   # tblc
            pl.BlockSpec(memory_space=pl.ANY),   # feats
            pl.BlockSpec(memory_space=pl.ANY),   # qs2
            pl.BlockSpec(memory_space=pl.ANY),   # xv2
            pl.BlockSpec(memory_space=pl.ANY),   # lv2
            pl.BlockSpec(memory_space=pl.ANY),   # tm2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w (resident)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, D, 1), jnp.int32),       # qw
            pltpu.VMEM((2, 1, TWIN), jnp.int32),    # twr
            pltpu.VMEM((2, TWIN, 1), jnp.int32),    # twc
            pltpu.VMEM((2, TWIN, C), jnp.bfloat16),  # fw (payload window)
            pltpu.VMEM((2, D, kx), jnp.bfloat16),   # xv
            pltpu.VMEM((2, D, 1), jnp.bfloat16),    # lv
            pltpu.VMEM((2, TWIN, kx), jnp.bfloat16),  # tm
            pltpu.VMEM((2, D, OW), jnp.bfloat16),   # out tile
            pltpu.SemaphoreType.DMA((2, 7)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, m + D, OW), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(q_offs, tblr, tblc, feats, qs2, xv2, lv2, tm2, w)
