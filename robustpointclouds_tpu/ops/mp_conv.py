"""Merge-path one-hot MXU sparse convolution (sort-free, gather-free).

The round-2 step was bound by XLA's gather engine (~3.3 ns/row) and by the
packed rank sorts that build neighbor indices (PARITY.md measured constants);
the MXU sat idle. This module replaces BOTH for submanifold convs with
one-hot matmuls over merge-path tiles, putting the gather work on the MXU:

  * For lead-tap group g of a (1, kz, ky, kx) kernel (stride 1, symmetric
    padding), the queries ``ids + delta_g`` are already sorted in output
    order.  Merge-path diagonal partitioning of (table, queries) at spacing D
    yields, per stream, tiles whose static ``D + kx`` table window PROVABLY
    contains every owned query's kx tap matches: the boundary rule gives
    ``t_off <= rank(q) <= t_off + D`` for owned q, and since table ids are
    unique integers ``rank(q+dx) <= rank(q) + dx``.
  * Within a tile, ``diff = table_window - query_window`` and the one-hot
    ``(diff == dx)`` is EXACT selection for bf16 payloads: ids are unique, so
    each one-hot row has at most one nonzero and the f32-accumulated matmul
    reproduces the gathered value bit-for-bit.  The conv is then two batched
    MXU matmuls per tile ([S, kx*D, D+kx] @ [S, D+kx, C] im2col, then
    [S, D, kx*C] @ [S, kx*C, Cout]).
  * Tile outputs land at ascending per-stream query offsets via
    ``dynamic_update_slice`` in a `lax.scan`; later tiles overwrite the
    non-owned tail, so no ownership masking is needed in the forward.
  * Backward ``d_feats`` uses the tap-mirror identity (the flattened-index
    reversal of ops/subm_conv.py): the mirrored tap set reuses the SAME nine
    query streams with block-reversed transposed weights, with the forward's
    query-side validity masks re-applied on the (gathered) table side.
    ``d_W`` accumulates per tile with query-side masks plus the
    tile-ownership mask (each query must contribute exactly once).  No sort,
    gather, or scatter anywhere in the conv, forward or backward.

Values are clamped to ``2**31 - 2**26`` rather than the packed sort's 30-bit
cap, so the merged-batch flat-id space supports B up to ~23 KITTI samples
without falling off a fast path (VERDICT round 2, weak #3).

Replaces the hot path the reference runs on spconv's CUDA gather/scatter
kernels (reference requirements.txt:20-21, invoked from
models/detectors/adversarial_voxelnet.py:141).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import sparse

INT32_MAX = np.iinfo(np.int32).max
# table sentinel: real ids + |delta| + kx must stay below; leaves 2^26 slack
_CAP_T = np.int32(2**31 - 2**26)


class MPSubmInfo(NamedTuple):
    """Per-grid stream info shared by every subm conv on that grid."""

    tbl: jnp.ndarray        # [n] sorted clamped ids (padding -> _CAP_T)
    qs: jnp.ndarray         # [S, n] query values per stream (tbl + delta)
    q_offs: jnp.ndarray     # [S, T+1] merge-path query boundaries
    leadvalid: jnp.ndarray  # [n, S] lead-axis bounds & row mask
    xvalid: jnp.ndarray     # [n, kx] last-axis bounds & row mask


def mp_boundaries(tbl: jnp.ndarray, qs: jnp.ndarray, D: int) -> jnp.ndarray:
    """Merge-path query boundaries for S streams at diagonal spacing D.

    For diagonal d = tau*D the consumed-query count q_off is the largest mid
    with ``qs[mid-1] <= tbl[d-mid]`` (ties consumed from the query side, i.e.
    'left'-rank semantics, like ops/sparse.merge_path_ranks). Vectorized
    binary search over all (stream, tile) boundaries at once.

    Returns [S, T+1] int32 with T = ceil((n+m)/D).
    """
    n = tbl.shape[0]
    S, m = qs.shape
    T = -(-(n + m) // D)
    taus = jnp.arange(T + 1, dtype=jnp.int32)
    diag = jnp.minimum(taus * D, n + m)                     # [T+1]
    lo = jnp.broadcast_to(jnp.maximum(diag - n, 0), (S, T + 1))
    hi = jnp.broadcast_to(jnp.minimum(diag, m), (S, T + 1))
    tbl_s = jnp.concatenate([tbl, jnp.full((1,), INT32_MAX, jnp.int32)])

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi + 1) // 2
        q_prev = jnp.take_along_axis(qs, jnp.maximum(mid - 1, 0), axis=1)
        t_at = tbl_s[jnp.clip(diag[None, :] - mid, 0, n)]
        ok = (mid == 0) | (q_prev <= t_at)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    steps = max(int(np.ceil(np.log2(max(m, 2)))) + 1, 1)
    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def subm_mp_info(
    grid: sparse.SparseGrid,
    kernel_size: Sequence[int] = (1, 3, 3, 3),
    D: int = 512,
) -> MPSubmInfo:
    """Build the merge-path stream info for a submanifold conv on `grid`.

    One cheap vectorized binary search (no sort); shared by every subm conv
    at this grid resolution. Kernel extents must be odd (symmetric padding
    (k-1)//2 per axis) so the tap-mirror backward identity holds.
    """
    ndim = grid.ndim
    kernel_size = tuple(int(k) for k in kernel_size)
    assert all(k % 2 == 1 for k in kernel_size), "mirror bwd needs odd kernels"
    kx = kernel_size[-1]
    shape = grid.spatial_shape
    strides = sparse._strides_of(shape)
    pads = tuple((k - 1) // 2 for k in kernel_size)
    lead_offs = sparse.kernel_offsets(kernel_size[:-1])     # [S, ndim-1]
    S = lead_offs.shape[0]
    n = grid.flat_ids.shape[0]

    deltas = np.array(
        [
            sum(
                (int(lead_offs[s, a]) - pads[a]) * int(strides[a])
                for a in range(ndim - 1)
            )
            - pads[-1]
            for s in range(S)
        ],
        np.int64,
    )
    id_space = int(np.prod([int(v) for v in shape], dtype=np.int64))
    max_abs = int(np.max(np.abs(deltas)))
    assert id_space + max_abs + kx + 2 < int(_CAP_T), (
        "flat id space too large for int32 merge-path values"
    )

    tbl = jnp.minimum(grid.flat_ids, _CAP_T)
    qs = tbl[None, :] + jnp.asarray(deltas.astype(np.int32))[:, None]

    lv_cols = []
    for s in range(S):
        v = grid.mask
        for a in range(ndim - 1):
            c = grid.coords[:, a] + int(lead_offs[s, a]) - pads[a]
            v = v & (c >= 0) & (c < shape[a])
        lv_cols.append(v)
    leadvalid = jnp.stack(lv_cols, axis=1)
    lx = (grid.coords[:, -1] - pads[-1])[:, None] + jnp.arange(
        kx, dtype=jnp.int32
    )[None, :]
    xvalid = grid.mask[:, None] & (lx >= 0) & (lx < shape[-1])

    q_offs = mp_boundaries(tbl, qs, D)
    return MPSubmInfo(tbl, qs, q_offs, leadvalid, xvalid)


def _stream_slices(arr_pad, offs, size):
    """Per-stream dynamic slices of a shared 1D/2D array, stacked [S, ...]."""
    if arr_pad.ndim == 1:
        return jnp.stack(
            [
                jax.lax.dynamic_slice(arr_pad, (offs[s],), (size,))
                for s in range(offs.shape[0])
            ]
        )
    c = arr_pad.shape[1]
    return jnp.stack(
        [
            jax.lax.dynamic_slice(arr_pad, (offs[s], 0), (size, c))
            for s in range(offs.shape[0])
        ]
    )


def mp_subm_conv(kx: int, D: int, feats, kernel, info: MPSubmInfo):
    """Submanifold conv, merge-path one-hot form.

    feats [n, Cin] aligned with the grid rows (padding rows MUST be zero —
    SparseConvBlock guarantees this between layers); kernel [K*Cin, Cout] in
    kernel_offsets order (groups-major, dx-minor; same layout as
    ops/subm_conv); info from :func:`subm_mp_info` on the SAME grid.
    Output [n, Cout] in feats.dtype, numerically the existing gather path's
    result up to f32-accumulation association.
    """
    return _mp_subm_conv(
        kx, D, feats, kernel, info.tbl, info.qs, info.q_offs,
        info.leadvalid, info.xvalid,
    )


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _mp_subm_conv(kx, D, feats, kernel, tbl, qs, q_offs, leadvalid, xvalid):
    return _mp_subm_fwd_impl(
        kx, D, feats, kernel, MPSubmInfo(tbl, qs, q_offs, leadvalid, xvalid)
    )


def _mp_subm_fwd_impl(kx, D, feats, kernel, info):
    n, cin = feats.shape
    kcin, cout = kernel.shape
    S = info.qs.shape[0]
    assert kcin == S * kx * cin
    Dt = D + kx
    T = info.q_offs.shape[1] - 1
    w2 = kernel.reshape(S, kx * cin, cout)

    tbl_pad = jnp.concatenate([info.tbl, jnp.full((Dt,), INT32_MAX, jnp.int32)])
    qs_pad = jnp.concatenate(
        [info.qs, jnp.full((S, D), _CAP_T + kx + 1, jnp.int32)], axis=1
    )
    feats_pad = jnp.concatenate([feats, jnp.zeros((Dt, cin), feats.dtype)], 0)
    xv_pad = jnp.concatenate([info.xvalid, jnp.zeros((D, kx), bool)], 0)
    dxr = jnp.arange(kx, dtype=jnp.int32)

    def body(bufs, tau):
        qo = info.q_offs[:, tau]
        to = tau * D - qo
        qw = jnp.stack(
            [jax.lax.dynamic_slice(qs_pad[s], (qo[s],), (D,)) for s in range(S)]
        )
        tw = _stream_slices(tbl_pad, to, Dt)
        fw = _stream_slices(feats_pad, to, Dt)
        xv = _stream_slices(xv_pad, qo, D)                       # [S, D, kx]
        diff = tw[:, None, :] - qw[:, :, None]                   # [S, D, Dt]
        oh = (diff[:, None, :, :] == dxr[None, :, None, None]) & (
            xv.transpose(0, 2, 1)[:, :, :, None]
        )                                                        # [S, kx, D, Dt]
        col = jnp.einsum(
            "sab,sbc->sac",
            oh.astype(feats.dtype).reshape(S, kx * D, Dt),
            fw,
            preferred_element_type=jnp.float32,
        ).reshape(S, kx, D, cin)
        col = col.transpose(0, 2, 1, 3).reshape(S, D, kx * cin)
        out_t = jnp.einsum(
            "sac,scd->sad",
            col.astype(feats.dtype),
            w2,
            preferred_element_type=jnp.float32,
        )
        for s in range(S):
            bufs = jax.lax.dynamic_update_slice(bufs, out_t[s : s + 1], (s, qo[s], 0))
        return bufs, None

    bufs0 = jnp.zeros((S, n + D, cout), jnp.float32)
    bufs, _ = jax.lax.scan(body, bufs0, jnp.arange(T, dtype=jnp.int32))
    out = jnp.sum(
        bufs[:, :n] * info.leadvalid.T[:, :, None].astype(jnp.float32), axis=0
    )
    return out.astype(feats.dtype)


def _mp_fwd(kx, D, feats, kernel, tbl, qs, q_offs, leadvalid, xvalid):
    info = MPSubmInfo(tbl, qs, q_offs, leadvalid, xvalid)
    out = _mp_subm_fwd_impl(kx, D, feats, kernel, info)
    return out, (feats, kernel, info)


def _mp_bwd(kx, D, res, g):
    feats, kernel, info = res
    n, cin = feats.shape
    kcin, cout = kernel.shape
    S = info.qs.shape[0]
    Dt = D + kx
    T = info.q_offs.shape[1] - 1
    w4 = kernel.reshape(S, kx, cin, cout)
    # mirror weights: wm[s, dx] = W[S-1-s, kx-1-dx]^T
    wm2 = jnp.transpose(w4[::-1, ::-1], (0, 1, 3, 2)).reshape(S, kx * cout, cin)

    tbl_pad = jnp.concatenate([info.tbl, jnp.full((Dt,), INT32_MAX, jnp.int32)])
    qs_pad = jnp.concatenate(
        [info.qs, jnp.full((S, D), _CAP_T + kx + 1, jnp.int32)], axis=1
    )
    feats_pad = jnp.concatenate([feats, jnp.zeros((Dt, cin), feats.dtype)], 0)
    g = g.astype(feats.dtype)
    g_padt = jnp.concatenate([g, jnp.zeros((Dt, cout), g.dtype)], 0)
    xv_pad = jnp.concatenate([info.xvalid, jnp.zeros((D, kx), bool)], 0)
    lv_pad = jnp.concatenate([info.leadvalid, jnp.zeros((D, S), bool)], 0)
    # table-side (mirrored-column) masks, padded to n + Dt rows
    xv_rev_t = jnp.concatenate(
        [info.xvalid[:, ::-1], jnp.zeros((Dt, kx), bool)], 0
    )
    lv_rev_t = jnp.concatenate(
        [info.leadvalid[:, ::-1], jnp.zeros((Dt, S), bool)], 0
    )
    dxr = jnp.arange(kx, dtype=jnp.int32)
    arD = jnp.arange(D, dtype=jnp.int32)

    def body(carry, tau):
        dbufs, dW = carry
        qo = info.q_offs[:, tau]
        qo_next = info.q_offs[:, tau + 1]
        to = tau * D - qo
        qw = jnp.stack(
            [jax.lax.dynamic_slice(qs_pad[s], (qo[s],), (D,)) for s in range(S)]
        )
        tw = _stream_slices(tbl_pad, to, Dt)
        diff = tw[:, None, :] - qw[:, :, None]
        ohb = diff[:, None, :, :] == dxr[None, :, None, None]    # [S, kx, D, Dt]

        # ---- dW: query-side masks + tile ownership ----
        xv_q = _stream_slices(xv_pad, qo, D)                     # [S, D, kx]
        lv_q = jnp.stack(
            [
                jax.lax.dynamic_slice(lv_pad, (qo[s], s), (D, 1))[:, 0]
                for s in range(S)
            ]
        )                                                        # [S, D]
        own = (qo[:, None] + arD[None, :]) < qo_next[:, None]    # [S, D]
        mask_q = xv_q.transpose(0, 2, 1) & (lv_q & own)[:, None, :]  # [S, kx, D]
        oh_w = (ohb & mask_q[..., None]).astype(feats.dtype)
        fw = _stream_slices(feats_pad, to, Dt)
        colw = jnp.einsum(
            "sab,sbc->sac",
            oh_w.reshape(S, kx * D, Dt),
            fw,
            preferred_element_type=jnp.float32,
        ).reshape(S, kx, D, cin)
        gq = jnp.stack(
            [jax.lax.dynamic_slice(g_padt, (qo[s], 0), (D, cout)) for s in range(S)]
        )
        dW = dW + jnp.einsum(
            "skac,sad->skcd", colw, gq.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

        # ---- d_feats: mirror streams, table-side masks ----
        xv_t = jnp.stack(
            [jax.lax.dynamic_slice(xv_rev_t, (to[s], 0), (Dt, kx)) for s in range(S)]
        )                                                        # [S, Dt, kx] (col dx -> fwd kx-1-dx)
        lv_t = jnp.stack(
            [
                jax.lax.dynamic_slice(lv_rev_t, (to[s], s), (Dt, 1))[:, 0]
                for s in range(S)
            ]
        )                                                        # [S, Dt] (fwd col S-1-s)
        mask_t = xv_t.transpose(0, 2, 1) & lv_t[:, None, :]      # [S, kx, Dt]
        oh_g = (ohb & mask_t[:, :, None, :]).astype(feats.dtype)
        gw = _stream_slices(g_padt, to, Dt)                      # [S, Dt, cout]
        colg = jnp.einsum(
            "sab,sbc->sac",
            oh_g.reshape(S, kx * D, Dt),
            gw,
            preferred_element_type=jnp.float32,
        ).reshape(S, kx, D, cout)
        colg = colg.transpose(0, 2, 1, 3).reshape(S, D, kx * cout)
        dft = jnp.einsum(
            "sad,sdc->sac",
            colg.astype(feats.dtype),
            wm2,
            preferred_element_type=jnp.float32,
        )
        for s in range(S):
            dbufs = jax.lax.dynamic_update_slice(dbufs, dft[s : s + 1], (s, qo[s], 0))
        return (dbufs, dW), None

    dbufs0 = jnp.zeros((S, n + D, cin), jnp.float32)
    dW0 = jnp.zeros((S, kx, cin, cout), jnp.float32)
    (dbufs, dW), _ = jax.lax.scan(
        body, (dbufs0, dW0), jnp.arange(T, dtype=jnp.int32)
    )
    d_feats = jnp.sum(dbufs[:, :n], axis=0).astype(feats.dtype)
    d_kernel = dW.reshape(S * kx * cin, cout).astype(kernel.dtype)
    return d_feats, d_kernel, None, None, None, None, None


_mp_subm_conv.defvjp(_mp_fwd, _mp_bwd)


# ---------------------------------------------------------------------------
# Pallas-kernel path (kernels/mp_gather.py): the compare/one-hot matrices
# never leave VMEM. Same merge-path tiling; rank+d0 anchoring against an
# in-VMEM x-window table.
# ---------------------------------------------------------------------------


def _pad_lanes(x, mult: int = 128):
    """Zero-pad the minor (lane) axis to a multiple of `mult`.

    Mosaic rejects HBM DMA slices narrower than a lane tile; tiled layouts
    physically pad the minor dim to 128 anyway, so this moves no extra bytes
    — it only makes the full-width slice legal."""
    c = x.shape[-1]
    cp = -(-c // mult) * mult
    if cp == c:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, cp - c)]
    return jnp.pad(x, pad)


class MP3Pack(NamedTuple):
    """Kernel-layout stream info for the Pallas merge-path gather-conv.

    Orientation: table ids/masks in COLUMN form (sublane DMA slicing is
    unrestricted), query-side data in ROW form with 128-aligned lane
    extents — Mosaic rejects narrow lane slices."""

    tblc: jnp.ndarray    # [n + pad, 128] int32 block; ids in col 0
    qsr: jnp.ndarray     # [S, m + D] int32 query values (rows sorted)
    xvr: jnp.ndarray     # [kx, m + D] bf16
    lvr: jnp.ndarray     # [S, m + D] bf16
    tmc: jnp.ndarray     # [n + TWIN, 128] bf16 packed mirror masks (col s*kx+dx)
    q_offs: jnp.ndarray  # [S, T+1] int32


def subm_mp3_pack(
    grid: sparse.SparseGrid,
    kernel_size: Sequence[int] = (1, 3, 3, 3),
    D: int = 512,
    wlen: int = 640,
) -> MP3Pack:
    """Stream info for :func:`mp3_subm_conv`, shared per grid resolution."""
    info = subm_mp_info(grid, kernel_size, D=D)
    kx = int(kernel_size[-1])
    S, n = info.qs.shape
    from ..kernels.mp_gather import TPAD as _TPAD

    TWIN = wlen
    # window covers owned ranks only (non-owned queries are blended away):
    # [ta >= t_off-(TPAD-1), ta+TWIN) must span [t_off, t_off+D+kx)
    assert wlen >= _TPAD - 1 + D + kx and wlen % _TPAD == 0

    from ..kernels.mp_gather import QPAD, TM_LANES, TPAD

    DW = D + QPAD
    tbl_pad = jnp.concatenate(
        [info.tbl, jnp.full((TWIN + TPAD,), INT32_MAX, jnp.int32)]
    )
    tblc = jnp.zeros((n + TWIN + TPAD, 128), jnp.int32).at[:, 0].set(tbl_pad)
    # replicated-row layouts: DMA slice shapes AND offsets must be
    # tile-aligned (int32 (8,128), bf16 (16,128)), so stream s's row lives
    # at the aligned row offset 8s / 16s and windows are QPAD-aligned
    qs_p = jnp.concatenate(
        [info.qs, jnp.full((S, DW), _CAP_T, jnp.int32)], axis=1
    )
    qsr = jnp.full((S * 8, n + DW), _CAP_T, jnp.int32).at[::8].set(qs_p)
    xv_p = jnp.concatenate(
        [info.xvalid.astype(jnp.bfloat16).T, jnp.zeros((kx, DW), jnp.bfloat16)],
        axis=1,
    )
    xvr = jnp.zeros((16, n + DW), jnp.bfloat16).at[:kx].set(xv_p)
    lv_p = jnp.concatenate(
        [info.leadvalid.astype(jnp.bfloat16).T, jnp.zeros((S, DW), jnp.bfloat16)],
        axis=1,
    )
    lvr = jnp.zeros((S * 16, n + DW), jnp.bfloat16).at[::16].set(lv_p)
    # tmc[i, s*kx + dx] = leadvalid[i, S-1-s] & xvalid[i, kx-1-dx]: the
    # forward validity of the mirrored tap, applied to gathered rows in the
    # backward d_feats pass (tap-mirror identity); packed into a 128-lane
    # block so the kernel takes one full-width DMA and value-slices columns
    tm = jnp.einsum(
        "is,ik->isk",
        info.leadvalid[:, ::-1].astype(jnp.bfloat16),
        info.xvalid[:, ::-1].astype(jnp.bfloat16),
    ).reshape(n, S * kx)
    tmc = jnp.zeros((n + TWIN + TPAD, TM_LANES), jnp.bfloat16)
    tmc = tmc.at[:n, : S * kx].set(tm)
    return MP3Pack(tblc, qsr, xvr, lvr, tmc, info.q_offs)


def mp3_subm_conv(kx: int, D: int, wlen: int, feats, kernel, pack: MP3Pack,
                  interpret: bool = False):
    """Submanifold conv on the Pallas merge-path kernel.

    feats [n, Cin] (grid-aligned, zero padding rows), kernel [K*Cin, Cout]
    in kernel_offsets order. Compute is bf16 with f32 MXU accumulation
    (selection gathers are exact for bf16); returns feats.dtype.
    """
    return _mp3_subm_conv(
        kx, D, wlen, interpret, feats, kernel, pack.tblc,
        pack.qsr, pack.xvr, pack.lvr, pack.tmc, pack.q_offs,
    )


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _mp3_subm_conv(kx, D, wlen, interpret, feats, kernel, tblc, qsr,
                   xvr, lvr, tmc, q_offs):
    out, _ = _mp3_fwd_impl(
        kx, D, wlen, interpret, feats, kernel,
        MP3Pack(tblc, qsr, xvr, lvr, tmc, q_offs),
    )
    return out


def _mp3_fwd_impl(kx, D, wlen, interpret, feats, kernel, pack):
    from ..kernels.mp_gather import mp_gather_conv

    n, cin = feats.shape
    kcin, cout = kernel.shape
    S = pack.q_offs.shape[0]
    from ..kernels.mp_gather import QPAD, TPAD

    m = pack.qsr.shape[1] - D - QPAD  # output rows (n for subm, out cap strided)
    TWIN = wlen
    coutp = -(-cout // 128) * 128
    w4 = kernel.reshape(S, kx, cin, cout).astype(jnp.bfloat16)
    w4 = _pad_lanes(_pad_lanes(w4).swapaxes(-1, -2)).swapaxes(-1, -2)
    f16 = _pad_lanes(jnp.concatenate(
        [feats.astype(jnp.bfloat16),
         jnp.zeros((TWIN + TPAD, cin), jnp.bfloat16)], 0
    ))
    bufs = mp_gather_conv(
        f16, w4, pack.tblc, pack.qsr, pack.xvr, pack.lvr,
        pack.tmc, pack.q_offs,
        S=S, kx=kx, D=D, wlen=wlen, cout=coutp, mode="out",
        interpret=interpret,
    )
    out = jnp.sum(
        bufs[:, 0, :m, :cout].astype(jnp.float32), axis=0
    ).astype(feats.dtype)
    return out, (n, cin, cout, S, TWIN)


def _mp3_vjp_fwd(kx, D, wlen, interpret, feats, kernel, tblc, qsr,
                 xvr, lvr, tmc, q_offs):
    pack = MP3Pack(tblc, qsr, xvr, lvr, tmc, q_offs)
    out, _ = _mp3_fwd_impl(kx, D, wlen, interpret, feats, kernel, pack)
    return out, (feats, kernel, pack)


def _mp3_vjp_bwd(kx, D, wlen, interpret, res, g):
    from ..kernels.mp_gather import mp_gather_conv

    feats, kernel, pack = res
    n, cin = feats.shape
    kcin, cout = kernel.shape
    S = pack.q_offs.shape[0]
    from ..kernels.mp_gather import QPAD, TPAD

    TWIN = wlen
    cinp = -(-cin // 128) * 128
    w4 = kernel.reshape(S, kx, cin, cout)
    # mirror weights: tap dx of stream s applies W[S-1-s, kx-1-dx]^T
    wrev = jnp.transpose(w4[::-1, ::-1], (0, 1, 3, 2)).astype(jnp.bfloat16)
    wrev = _pad_lanes(_pad_lanes(wrev).swapaxes(-1, -2)).swapaxes(-1, -2)
    g16 = _pad_lanes(jnp.concatenate(
        [g.astype(jnp.bfloat16),
         jnp.zeros((TWIN + TPAD, cout), jnp.bfloat16)], 0
    ))
    dbufs = mp_gather_conv(
        g16, wrev, pack.tblc, pack.qsr, pack.xvr, pack.lvr,
        pack.tmc, pack.q_offs,
        S=S, kx=kx, D=D, wlen=wlen, cout=cinp, mode="bwd",
        interpret=interpret,
    )
    d_feats = jnp.sum(
        dbufs[:, 0, :n, :cin].astype(jnp.float32), axis=0
    ).astype(feats.dtype)

    f16 = _pad_lanes(jnp.concatenate(
        [feats.astype(jnp.bfloat16),
         jnp.zeros((TWIN + TPAD, cin), jnp.bfloat16)], 0
    ))
    col = mp_gather_conv(
        f16, jnp.zeros((S, kx, cinp, 128), jnp.bfloat16), pack.tblc,
        pack.qsr, pack.xvr, pack.lvr, pack.tmc, pack.q_offs,
        S=S, kx=kx, D=D, wlen=wlen, cout=128, mode="col",
        interpret=interpret,
    )  # [S, kx, n + D, cinp] tap blocks, query-masked + tile-owned
    dW = jnp.einsum(
        "skmc,md->skcd", col[:, :, :n, :cin], g.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    d_kernel = dW.reshape(S * kx * cin, cout).astype(kernel.dtype)
    return (d_feats, d_kernel) + (None,) * 6


_mp3_subm_conv.defvjp(_mp3_vjp_fwd, _mp3_vjp_bwd)


def strided_mp3_pack(
    in_grid: sparse.SparseGrid,
    out_grid: sparse.SparseGrid,
    kernel_size: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
    D: int = 512,
    wlen: int = 640,
) -> MP3Pack:
    """Merge-path stream info for a strided (regular) sparse conv forward.

    Queries live on the OUT grid: q0 = flat(out*stride - padding +
    lead_offset) in the INPUT id space — strictly monotone in out flat-id
    order for the encoder's geometries (axis spans telescope; see the
    module derivation), so each stream is sorted and the same kernel
    applies. tmc is unused (the strided backward gathers through the
    fused-downsample inverse index instead of the tap mirror).
    """
    ndim = in_grid.ndim
    kernel_size = tuple(int(v) for v in kernel_size)
    kx = kernel_size[-1]
    in_shape = in_grid.spatial_shape
    strides_f = sparse._strides_of(in_shape)
    lead_offs = sparse.kernel_offsets(kernel_size[:-1])
    S = lead_offs.shape[0]
    m = out_grid.flat_ids.shape[0]
    n = in_grid.flat_ids.shape[0]
    TWIN = wlen

    id_space = int(np.prod([int(v) for v in in_shape], dtype=np.int64))
    assert id_space + kx + 2 < int(_CAP_T)

    base = [
        out_grid.coords[:, a] * int(stride[a]) - int(padding[a])
        for a in range(ndim)
    ]
    last = base[ndim - 1]
    q_cols, lv_cols = [], []
    for s in range(S):
        flat = last
        valid = out_grid.mask
        for a in range(ndim - 1):
            q = base[a] + int(lead_offs[s, a])
            valid = valid & (q >= 0) & (q < in_shape[a])
            flat = flat + q * int(strides_f[a])
        q_cols.append(jnp.where(out_grid.mask, flat, _CAP_T).astype(jnp.int32))
        lv_cols.append(valid)
    qs = jnp.stack(q_cols, axis=0)            # [S, m]
    leadvalid = jnp.stack(lv_cols, axis=1)    # [m, S]
    lx = last[:, None] + jnp.arange(kx, dtype=jnp.int32)[None, :]
    xvalid = out_grid.mask[:, None] & (lx >= 0) & (lx < in_shape[-1])

    from ..kernels.mp_gather import QPAD, TM_LANES, TPAD

    DW = D + QPAD
    tbl = jnp.minimum(in_grid.flat_ids, _CAP_T)
    q_offs = mp_boundaries(tbl, qs, D)
    tbl_pad = jnp.concatenate(
        [tbl, jnp.full((TWIN + TPAD,), INT32_MAX, jnp.int32)]
    )
    tblc = jnp.zeros((n + TWIN + TPAD, 128), jnp.int32).at[:, 0].set(tbl_pad)
    qs_p = jnp.concatenate([qs, jnp.full((S, DW), _CAP_T, jnp.int32)], axis=1)
    qsr = jnp.full((S * 8, m + DW), _CAP_T, jnp.int32).at[::8].set(qs_p)
    xv_p = jnp.concatenate(
        [xvalid.astype(jnp.bfloat16).T, jnp.zeros((kx, DW), jnp.bfloat16)],
        axis=1,
    )
    xvr = jnp.zeros((16, m + DW), jnp.bfloat16).at[:kx].set(xv_p)
    lv_p = jnp.concatenate(
        [leadvalid.astype(jnp.bfloat16).T, jnp.zeros((S, DW), jnp.bfloat16)],
        axis=1,
    )
    lvr = jnp.zeros((S * 16, m + DW), jnp.bfloat16).at[::16].set(lv_p)
    # unused in fwd/col modes
    tmc = jnp.zeros((n + TWIN + TPAD, TM_LANES), jnp.bfloat16)
    return MP3Pack(tblc, qsr, xvr, lvr, tmc, q_offs)


def mp3_strided_conv(kx: int, D: int, wlen: int, feats, kernel,
                     pack: MP3Pack, inv_idx, interpret: bool = False):
    """Strided sparse conv: merge-path one-hot kernel forward, inverse-index
    gather backward (sparse.downsample_with_index supplies inv for free).

    feats [n_in, Cin]; kernel [K*Cin, Cout]; inv_idx [n_in, K] in [0, m].
    """
    return _mp3_strided_conv(
        kx, D, wlen, interpret, feats, kernel, pack.tblc, pack.qsr,
        pack.xvr, pack.lvr, pack.tmc, pack.q_offs, inv_idx,
    )


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _mp3_strided_conv(kx, D, wlen, interpret, feats, kernel, tblc, qsr,
                      xvr, lvr, tmc, q_offs, inv_idx):
    pack = MP3Pack(tblc, qsr, xvr, lvr, tmc, q_offs)
    out, _ = _mp3_fwd_impl(kx, D, wlen, interpret, feats, kernel, pack)
    return out


def _mp3s_vjp_fwd(kx, D, wlen, interpret, feats, kernel, tblc, qsr,
                  xvr, lvr, tmc, q_offs, inv_idx):
    pack = MP3Pack(tblc, qsr, xvr, lvr, tmc, q_offs)
    out, _ = _mp3_fwd_impl(kx, D, wlen, interpret, feats, kernel, pack)
    return out, (feats, kernel, pack, inv_idx)


def _mp3s_vjp_bwd(kx, D, wlen, interpret, res, g):
    from ..kernels.mp_gather import mp_gather_conv
    from .subm_conv import _gather_col

    feats, kernel, pack, inv_idx = res
    n, cin = feats.shape
    kcin, cout = kernel.shape
    k = kcin // cin
    S = pack.q_offs.shape[0]
    from ..kernels.mp_gather import QPAD, TPAD

    TWIN = wlen
    # d_feats through the inverse index: gather-only, tap-aligned (no mirror)
    w_t = jnp.transpose(
        kernel.reshape(k, cin, cout), (0, 2, 1)
    ).reshape(k * cout, cin).astype(g.dtype)
    g_col = _gather_col(g, inv_idx)
    d_feats = jnp.dot(
        g_col, w_t, preferred_element_type=jnp.float32
    ).astype(feats.dtype)

    cinp = -(-cin // 128) * 128
    f16 = _pad_lanes(jnp.concatenate(
        [feats.astype(jnp.bfloat16),
         jnp.zeros((TWIN + TPAD, cin), jnp.bfloat16)], 0
    ))
    col = mp_gather_conv(
        f16, jnp.zeros((S, kx, cinp, 128), jnp.bfloat16), pack.tblc,
        pack.qsr, pack.xvr, pack.lvr, pack.tmc, pack.q_offs,
        S=S, kx=kx, D=D, wlen=wlen, cout=128, mode="col",
        interpret=interpret,
    )
    m = pack.qsr.shape[1] - D - QPAD
    dW = jnp.einsum(
        "skmc,md->skcd", col[:, :, :m, :cin], g.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    d_kernel = dW.reshape(S * kx * cin, cout).astype(kernel.dtype)
    return (d_feats, d_kernel) + (None,) * 7


_mp3_strided_conv.defvjp(_mp3s_vjp_fwd, _mp3s_vjp_bwd)
