"""Submanifold sparse convolution with a gather-only custom VJP.

Forward: img2col gather + one MXU matmul (ops/sparse.py machinery). The
default autodiff backward of a gather is a scatter-add — measured ~6x slower
than the gather on TPU. For *submanifold* convs the neighbor relation is
symmetric: site j appears in site i's tap k exactly when i appears in j's
spatially-mirrored tap K-1-k (3^d kernels are symmetric under negation). So
d_feats is ANOTHER img2col gather of the output cotangent with reversed taps
and transposed weights — no scatter anywhere:

    d_feats[j] = sum_k  d_out[nbr_{-k}(j)] @ W_k^T
               = img2col(d_out, idx[:, ::-1]) @ W_rev^T

d_W rides the SAME g-col gather: the mirror bijection turns
sum_i x[idx[i,k]]^T g[i] into x^T @ g_col[:, k'] (k' = k for the
reversed-index dense gather, K-1-k for the un-mirrored xwin gather, k for
the strided inverse-index gather) — so the whole backward costs ONE gather,
not two, and the forward col is never stored OR re-gathered.
"""
from __future__ import annotations

import os as _os
from functools import partial

import jax
import jax.numpy as jnp

# A/B gate: d_W from the backward's own g-col gather (the mirror identity)
# vs the round-2 col re-gather. Default OFF — counterintuitively, removing
# the dW re-gather measures SLOWER at the step level (+19 ms/step at B=6 on
# v5e, tools/bench_r3_step): the re-gather overlaps the MXU matmuls on the
# gather engine, while the flat dot_general contends for the MXU and
# lengthens the critical path. Kept (exactness-tested) for schedulers where
# gather bandwidth, not MXU, is the binding resource.
DW_FROM_GCOL = _os.environ.get("RPC_DW_GCOL", "0") == "1"

# A/B gate: save the forward img2col as the VJP residual instead of
# re-gathering it in the backward. Trades a K·N-row gather (row-count-bound,
# ~8.6 ms for a 27-tap 96k-row 64ch conv) for a sequential HBM write+read of
# the same bytes (~1 ms at v5e bandwidth) at the cost of holding the col
# (up to ~330 MB/conv, ~2 GB total — fits v5e HBM). Whether it wins is a
# SCHEDULING question (the re-gather may overlap MXU work for free), so it
# stays measured-by-flag like the others: tools/bench_r4_step.
SAVE_COL = _os.environ.get("RPC_SAVE_COL", "0") == "1"

# A/B gate: consume the img2col as the gather's NATURAL [N, K, C] output and
# contract (K, C) in one dot_general, instead of reshaping to [N, K*C] first.
# The reshape is not a bitcast on TPU (the [N·K, C] gather output tiles C to
# 128 lanes; the flat form re-tiles K*C) — trace attribution measured those
# retiling copies at ~20-29 ms/step of the plan-fed train step (PARITY.md
# round-5). With COL3 the layout decision moves into XLA's dot emitter.
COL3 = _os.environ.get("RPC_COL3", "0") == "1"


def _gather_col3(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats [N, C], idx [M, K] in [0, N] (N = miss) -> col [M, K, C]."""
    n, c = feats.shape
    feats_pad = jnp.concatenate([feats, jnp.zeros((1, c), feats.dtype)], 0)
    return feats_pad[idx]


def _gather_col(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats [N, C], idx [N, K] in [0, N] (N = miss) -> col [N, K*C]."""
    return _gather_col3(feats, idx).reshape(idx.shape[0], idx.shape[1] * feats.shape[1])


def _dot3(col3: jnp.ndarray, kernel: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """col3 [M, K, C] x kernel [K*C, D] -> [M, D], contracting (K, C)."""
    m, k, c = col3.shape
    k3 = kernel.reshape(k, c, kernel.shape[1])
    return jax.lax.dot_general(
        col3, k3, (((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _dw3(col3: jnp.ndarray, g: jnp.ndarray, kernel_shape) -> jnp.ndarray:
    """d_kernel = col^T g without flattening col: [M,K,C] x [M,D] -> [K*C, D]."""
    m = jax.lax.dot_general(
        col3, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [K, C, D]
    return m.reshape(kernel_shape)


@partial(jax.custom_vjp, nondiff_argnums=())
def subm_conv(feats: jnp.ndarray, kernel: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats [N, Cin], kernel [K*Cin, Cout], idx [N, K] -> [N, Cout].

    Output dtype follows `feats` (bf16 in, bf16 out — MXU accumulation is
    always f32 via preferred_element_type), so mixed-precision encoders keep
    gather/BN traffic in bf16 end to end.
    """
    if COL3:
        return _dot3(_gather_col3(feats, idx), kernel, feats.dtype)
    col = _gather_col(feats, idx)
    return jnp.dot(col, kernel, preferred_element_type=jnp.float32).astype(feats.dtype)


def _dw_from_gcol(g_col, feats, k, cout, reverse_slots):
    """d_W = g_col^T x, ONE explicit dot_general contracting the row axis.

    g_col [N, K*Cout] is the backward's existing cotangent gather; feats
    [N, Cin]. An einsum with a k batch axis makes XLA broadcast feats to
    [K, N, Cin] (measured +4 ms/conv) — the flat contraction avoids that.
    `reverse_slots=True` flips the slot axis of the SMALL [K, Cout, Cin]
    result (for backwards whose g_col is un-mirrored, the mirror pairing
    d_kernel[s] ~ slot K-1-s); reversing 100 KB is free, reversing the
    [N, K*Cout] gather is not.
    """
    cin = feats.shape[1]
    m = jax.lax.dot_general(
        g_col, feats, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(k, cout, cin)  # [K*Cout, Cin] -> [K, Cout, Cin]
    if reverse_slots:
        m = m[::-1]
    return jnp.transpose(m, (0, 2, 1)).reshape(k * cin, cout)


def _fwd(feats, kernel, idx):
    if SAVE_COL:
        col = _gather_col(feats, idx)
        out = jnp.dot(col, kernel, preferred_element_type=jnp.float32).astype(feats.dtype)
        return out, (col, kernel, idx)
    out = subm_conv(feats, kernel, idx)
    return out, (feats, kernel, idx)


def _bwd(res, g):
    feats_or_col, kernel, idx = res
    k = idx.shape[1]
    kcin, cout = kernel.shape
    cin = kcin // k
    # d_col = g @ W^T, laid out [N, K, Cin]
    # d_feats[j] = sum_k d_col[nbr_{-k}(j), k] ; mirrored tap = K-1-k, and
    # misses (idx == N) contribute nothing because g is padded with a zero row
    # d_feats[j] = sum_k d_col[idx[j, K-1-k], k]
    #            = sum_k g[idx[j, K-1-k]] @ W_k^T
    # (reversing a row-major flattened kernel index mirrors every axis, which
    # is exactly the offset negation the symmetry needs)
    w_k = kernel.reshape(k, cin, cout)
    w_t = jnp.transpose(w_k, (0, 2, 1)).reshape(k * cout, cin)
    if COL3 and not SAVE_COL and not DW_FROM_GCOL:
        g_col3 = _gather_col3(g, idx[:, ::-1])  # [N, K, Cout], slot = mirror
        d_feats = _dot3(g_col3, w_t, feats_or_col.dtype)
        col3 = _gather_col3(feats_or_col, idx)
        d_kernel = _dw3(col3, g, kernel.shape).astype(kernel.dtype)
        return d_feats, d_kernel, None
    g_col = _gather_col(g, idx[:, ::-1])  # [N, K*Cout], slot k = mirrored tap
    d_feats = jnp.dot(g_col, w_t, preferred_element_type=jnp.float32).astype(
        feats_or_col.dtype
    )

    # d_W from the SAME gather — no col re-gather. The mirror bijection
    # idx[i,k]=j <=> idx[j,K-1-k]=i turns sum_i x[idx[i,k]]^T g[i] into
    # sum_j x[j]^T g[idx[j,K-1-k]] = x^T @ g_col[:, k] (the reversed-index
    # gather already holds the mirrored slot); misses hit g's zero row on
    # both sides, so the identity is exact including padding rows.
    if SAVE_COL:
        d_kernel = jnp.dot(
            feats_or_col.T, g, preferred_element_type=jnp.float32
        ).astype(kernel.dtype)
    elif DW_FROM_GCOL:
        d_kernel = _dw_from_gcol(
            g_col, feats_or_col, k, cout, reverse_slots=False
        ).astype(kernel.dtype)
    else:
        col = _gather_col(feats_or_col, idx)
        d_kernel = jnp.dot(col.T, g, preferred_element_type=jnp.float32).astype(kernel.dtype)
    return d_feats, d_kernel, None


subm_conv.defvjp(_fwd, _bwd)


def x_window_table(feats: jnp.ndarray, ids: jnp.ndarray, kx: int) -> jnp.ndarray:
    """Input-side resolved window table: [n*kx + 1, kx*C].

    Row j*kx + d = the kx consecutive-id taps of base id ids[j] - d:
    entry t = feats[row with id ids[j] - d + t] (zero when absent). Built from
    shifted slices + id-equality masks — ids are sorted and unique, so the row
    holding id ids[j]+delta can only sit at j+s for s in [1, delta], giving
    kx*(kx-1) masked shift-adds of [n, C] total (NO per-output-site factor;
    that was what sank the slot-resolution windowed form). Pure id matching:
    geometric x-bounds are the caller's job (XWindowInfo.xvalid) — a y-wrapped
    id match may be a TRUE tap of a padded query, so the table must not
    exclude it. Final row is the all-zero miss row.
    """
    n, c = feats.shape
    # E[d] = features of the row with id ids[j]+d (0 if absent), d in
    # [-(kx-1), kx-1]
    E = {0: feats}
    for d in range(1, kx):
        up = jnp.zeros((n, c), feats.dtype)
        dn = jnp.zeros((n, c), feats.dtype)
        for s in range(1, d + 1):
            m_up = jnp.concatenate(
                [ids[s:] == ids[:-s] + d, jnp.zeros((s,), bool)]
            )
            up = up + jnp.where(
                m_up[:, None],
                jnp.concatenate([feats[s:], jnp.zeros((s, c), feats.dtype)]),
                jnp.zeros((), feats.dtype),
            )
            m_dn = jnp.concatenate(
                [jnp.zeros((s,), bool), ids[:-s] == ids[s:] - d]
            )
            dn = dn + jnp.where(
                m_dn[:, None],
                jnp.concatenate([jnp.zeros((s, c), feats.dtype), feats[:-s]]),
                jnp.zeros((), feats.dtype),
            )
        E[d] = up
        E[-d] = dn
    # tbl[j, d, t] = E[t - d][j]
    tbl = jnp.stack(
        [
            jnp.concatenate([E[t - d] for t in range(kx)], axis=1)
            for d in range(kx)
        ],
        axis=1,
    ).reshape(n * kx, kx * c)
    return jnp.concatenate([tbl, jnp.zeros((1, kx * c), feats.dtype)], axis=0)


# widest channel slice whose kx*C bf16 row stays within the ~256 B
# row-count-bound regime of the TPU gather engine (measured: rows up to
# ~256 B cost the same ~3.3 ns/row; wider goes byte-bound and loses)
XWIN_SPLIT = int(_os.environ.get("RPC_XWIN_SPLIT", "32"))


def _gather_col_xwin(feats, ids, rows, xvalid, kx):
    """x-window-table img2col: gathers of G*N rows of width kx*C.

    Returns col [N, G*kx*C] in kernel_offsets order (groups-major, dx-minor),
    identical to _gather_col on the dense index. The xvalid multiply fuses
    into the gather consumer, so its cost is VPU-only.

    Channels wider than XWIN_SPLIT are gathered in halves so every row stays
    row-count-bound: 2 x G*N narrow rows beat the dense form's K*N rows
    (18N vs 27N for the 3^3 kernel) where one G*N wide-row gather would go
    byte-bound and lose (measured 1.9x at 64ch).
    """
    n, c = feats.shape
    nr, g = rows.shape
    if c > XWIN_SPLIT and c % 2 == 0:
        h = c // 2
        a = _gather_col_xwin(feats[:, :h], ids, rows, xvalid, kx)
        b = _gather_col_xwin(feats[:, h:], ids, rows, xvalid, kx)
        return jnp.concatenate(
            [a.reshape(nr, g * kx, h), b.reshape(nr, g * kx, h)], axis=-1
        ).reshape(nr, g * kx * c)
    tbl = x_window_table(feats, ids, kx)
    col = tbl[rows].reshape(nr, g, kx, c)
    col = col * xvalid[:, None, :, None].astype(feats.dtype)
    return col.reshape(nr, g * kx * c)


def _xwin_col3_parts(feats, ids, rows, xvalid, kx):
    """COL3 form of the x-window img2col: channel-sliced [nr, G, kx*h] parts.

    Yields ``(col3, (lo, hi))`` — the gather's output kept 3-D (no 4-D
    intermediate, no [nr, G*kx*c] retile, no cross-half concat; the caller
    contracts each part against the matching kernel channel slice and adds).
    Row order within a part matches _gather_col_xwin exactly: groups-major,
    dx-minor, channels minor-most.
    """
    n, c = feats.shape
    nr, g = rows.shape

    def _channel_slices(lo, hi):
        # same recursive halving as _gather_col_xwin: every gathered row
        # stays within the ~256 B row-count-bound regime
        if hi - lo > XWIN_SPLIT and (hi - lo) % 2 == 0:
            mid = lo + (hi - lo) // 2
            return _channel_slices(lo, mid) + _channel_slices(mid, hi)
        return [(lo, hi)]

    for lo, hi in _channel_slices(0, c):
        h = hi - lo
        tbl = x_window_table(feats[:, lo:hi] if (lo, hi) != (0, c) else feats,
                             ids, kx)
        col3 = tbl[rows]  # [nr, G, kx*h]
        xm = jnp.repeat(xvalid, h, axis=1).astype(feats.dtype)  # [nr, kx*h]
        yield col3 * xm[:, None, :], (lo, hi)


def _xwin_dot3(parts, kernel, k, cin, cout, reverse_taps, out_dtype):
    """sum over channel parts of col3 x kernel-slice, contracting (G, kx*h).

    kernel [K*Cin, Cout] with rows ordered (group, dx, channel); a part's
    slice is kernel.reshape(G, kx, Cin, Cout)[:, :, lo:hi]. With
    ``reverse_taps`` the TAP axis (group, dx flattened) is reversed and the
    cin/cout roles swapped — the w_rev of the backward — before slicing.
    """
    out = None
    for col3, (lo, hi) in parts:
        nr, g, _ = col3.shape
        kx = k // g
        if reverse_taps:
            w = kernel.reshape(k, cin, cout)[::-1].transpose(0, 2, 1)
            w = w.reshape(g, kx, cout, cin)[:, :, lo:hi]
            w = w.reshape(g, kx * (hi - lo), cin)
        else:
            w = kernel.reshape(g, kx, cin, cout)[:, :, lo:hi]
            w = w.reshape(g, kx * (hi - lo), cout)
        part = jax.lax.dot_general(
            col3, w, (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = part if out is None else out + part
    return out.astype(out_dtype)


def _xwin_dw3(feats, g_out, ids, rows, xvalid, kx, k, cin, cout):
    """d_kernel via COL3 parts: [nr,G,kx*h] x [nr,Cout] per part, assembled."""
    g = rows.shape[1]
    pieces = []
    for col3, (lo, hi) in _xwin_col3_parts(feats, ids, rows, xvalid, kx):
        m = jax.lax.dot_general(
            col3, g_out, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, kx*h, Cout]
        pieces.append(m.reshape(g, kx, hi - lo, cout))
    full = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=2)
    return full.reshape(k * cin, cout)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def subm_conv_xwin(kx: int, feats, kernel, ids, rows, xvalid):
    """Submanifold conv via the x-window table, scatter-free both ways.

    feats [N, Cin], kernel [K*Cin, Cout], ids = the grid's sorted flat ids,
    (rows, xvalid) from sparse.neighbor_xwin_info on the SAME grid. Backward
    uses the tap-mirror identity (see subm_conv): the same gather applied to
    the cotangent with block-reversed weights.
    """
    if COL3:
        k = rows.shape[1] * kx
        cin = kernel.shape[0] // k
        return _xwin_dot3(
            _xwin_col3_parts(feats, ids, rows, xvalid, kx),
            kernel, k, cin, kernel.shape[1], False, feats.dtype,
        )
    col = _gather_col_xwin(feats, ids, rows, xvalid, kx)
    return jnp.dot(col, kernel, preferred_element_type=jnp.float32).astype(feats.dtype)


def _sxw_fwd(kx, feats, kernel, ids, rows, xvalid):
    if SAVE_COL:
        col = _gather_col_xwin(feats, ids, rows, xvalid, kx)
        out = jnp.dot(col, kernel, preferred_element_type=jnp.float32).astype(feats.dtype)
        return out, (col, kernel, ids, rows, xvalid)
    return subm_conv_xwin(kx, feats, kernel, ids, rows, xvalid), (
        feats, kernel, ids, rows, xvalid,
    )


def _sxw_bwd(kx, res, g):
    feats_or_col, kernel, ids, rows, xvalid = res
    k = rows.shape[1] * kx
    kcin, cout = kernel.shape
    cin = kcin // k
    if COL3 and not SAVE_COL:
        d_feats = _xwin_dot3(
            _xwin_col3_parts(g, ids, rows, xvalid, kx),
            kernel, k, cin, cout, True, feats_or_col.dtype,
        )
        if DW_FROM_GCOL:
            g_col = _gather_col_xwin(g, ids, rows, xvalid, kx)
            d_kernel = _dw_from_gcol(
                g_col, feats_or_col, k, cout, reverse_slots=True
            ).astype(kernel.dtype)
        else:
            d_kernel = _xwin_dw3(
                feats_or_col, g, ids, rows, xvalid, kx, k, cin, cout
            ).astype(kernel.dtype)
        return d_feats, d_kernel, None, None, None
    w_rev = jnp.transpose(
        kernel.reshape(k, cin, cout)[::-1], (0, 2, 1)
    ).reshape(k * cout, cin)
    g_col = _gather_col_xwin(g, ids, rows, xvalid, kx)
    d_feats = jnp.dot(g_col, w_rev, preferred_element_type=jnp.float32).astype(
        feats_or_col.dtype
    )

    # d_W from the same gather (see subm _bwd): here g_col's slots are
    # UN-mirrored (the mirror lives in w_rev), so d_kernel[s] pairs x with
    # slot K-1-s — reverse the slot axis instead of re-gathering the col.
    if SAVE_COL:
        d_kernel = jnp.dot(
            feats_or_col.T, g, preferred_element_type=jnp.float32
        ).astype(kernel.dtype)
    elif DW_FROM_GCOL:
        d_kernel = _dw_from_gcol(g_col, feats_or_col, k, cout, reverse_slots=True).astype(kernel.dtype)
    else:
        col = _gather_col_xwin(feats_or_col, ids, rows, xvalid, kx)
        d_kernel = jnp.dot(col.T, g, preferred_element_type=jnp.float32).astype(kernel.dtype)
    return d_feats, d_kernel, None, None, None


subm_conv_xwin.defvjp(_sxw_fwd, _sxw_bwd)


@jax.custom_vjp
def strided_conv_xwin(feats, kernel, ids, rows, xvalid, inv_idx):
    """Strided conv: x-window-table forward gather + inverse-index backward.

    (rows, xvalid) from sparse.neighbor_xwin_info(in_grid, out_coords, ...);
    inv_idx [N_in, K] from sparse.inverse_from_forward. kx is recovered from
    xvalid's static shape.
    """
    kx = xvalid.shape[1]
    if COL3:
        k = rows.shape[1] * kx
        cin = kernel.shape[0] // k
        return _xwin_dot3(
            _xwin_col3_parts(feats, ids, rows, xvalid, kx),
            kernel, k, cin, kernel.shape[1], False, feats.dtype,
        )
    col = _gather_col_xwin(feats, ids, rows, xvalid, kx)
    return jnp.dot(col, kernel, preferred_element_type=jnp.float32).astype(feats.dtype)


def _stxw_fwd(feats, kernel, ids, rows, xvalid, inv_idx):
    if SAVE_COL:
        kx = xvalid.shape[1]
        col = _gather_col_xwin(feats, ids, rows, xvalid, kx)
        out = jnp.dot(col, kernel, preferred_element_type=jnp.float32).astype(feats.dtype)
        return out, (col, kernel, ids, rows, xvalid, inv_idx)
    out = strided_conv_xwin(feats, kernel, ids, rows, xvalid, inv_idx)
    return out, (feats, kernel, ids, rows, xvalid, inv_idx)


def _stxw_bwd(res, g):
    feats_or_col, kernel, ids, rows, xvalid, inv_idx = res
    kx = xvalid.shape[1]
    k = inv_idx.shape[1]
    kcin, cout = kernel.shape
    cin = kcin // k
    if COL3 and not SAVE_COL and not DW_FROM_GCOL:
        w_t = jnp.transpose(kernel.reshape(k, cin, cout), (0, 2, 1))
        g_col3 = _gather_col3(g, inv_idx)  # [N_in, K, Cout], tap-aligned
        d_feats = _dot3(
            g_col3, w_t.reshape(k * cout, cin), feats_or_col.dtype
        )
        d_kernel = _xwin_dw3(
            feats_or_col, g, ids, rows, xvalid, kx, k, cin, cout
        ).astype(kernel.dtype)
        return d_feats, d_kernel, None, None, None, None
    w_t = jnp.transpose(kernel.reshape(k, cin, cout), (0, 2, 1)).reshape(k * cout, cin)
    g_col = _gather_col(g, inv_idx)  # [N_in, K*Cout], tap-aligned
    d_feats = jnp.dot(g_col, w_t, preferred_element_type=jnp.float32).astype(
        feats_or_col.dtype
    )
    # d_W from the same gather: inv is the exact transpose of idx per tap
    # (collision-free), so sum_i x[idx[i,k]]^T g[i] = x^T @ g_col[:, k]
    if SAVE_COL:
        d_kernel = jnp.dot(
            feats_or_col.T, g, preferred_element_type=jnp.float32
        ).astype(kernel.dtype)
    elif DW_FROM_GCOL:
        d_kernel = _dw_from_gcol(g_col, feats_or_col, k, cout, reverse_slots=False).astype(kernel.dtype)
    else:
        col = _gather_col_xwin(feats_or_col, ids, rows, xvalid, kx)
        d_kernel = jnp.dot(col.T, g, preferred_element_type=jnp.float32).astype(kernel.dtype)
    return d_feats, d_kernel, None, None, None, None


strided_conv_xwin.defvjp(_stxw_fwd, _stxw_bwd)


def strided_conv(feats: jnp.ndarray, kernel: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Non-submanifold (strided) conv: plain gather-matmul with autodiff
    backward (scatter-add). Prefer :func:`strided_conv_t` with an inverse
    index; this form remains for tests and as a reference implementation."""
    col = _gather_col(feats, idx)
    return jnp.dot(col, kernel, preferred_element_type=jnp.float32)


@jax.custom_vjp
def strided_conv_t(
    feats: jnp.ndarray, kernel: jnp.ndarray, idx: jnp.ndarray, inv_idx: jnp.ndarray
) -> jnp.ndarray:
    """Strided conv with a gather-only backward via the inverse index.

    idx [N_out, K]: input row each output reads per tap (misses -> N_in).
    inv_idx [N_in, K]: output row that reads each input at tap k
    (sparse.inverse_neighbor_index; misses -> N_out). Then
        d_feats[i] = sum_k g[inv_idx[i, k]] @ W_k^T
    — no scatter in the whole conv.
    """
    if COL3:
        return _dot3(_gather_col3(feats, idx), kernel, feats.dtype)
    col = _gather_col(feats, idx)
    return jnp.dot(col, kernel, preferred_element_type=jnp.float32).astype(feats.dtype)


def _st_fwd(feats, kernel, idx, inv_idx):
    if SAVE_COL:
        col = _gather_col(feats, idx)
        out = jnp.dot(col, kernel, preferred_element_type=jnp.float32).astype(feats.dtype)
        return out, (col, kernel, idx, inv_idx)
    return strided_conv_t(feats, kernel, idx, inv_idx), (feats, kernel, idx, inv_idx)


def _st_bwd(res, g):
    feats_or_col, kernel, idx, inv_idx = res
    k = idx.shape[1]
    kcin, cout = kernel.shape
    cin = kcin // k
    if COL3 and not SAVE_COL and not DW_FROM_GCOL:
        w_t3 = jnp.transpose(kernel.reshape(k, cin, cout), (0, 2, 1))
        d_feats = _dot3(
            _gather_col3(g, inv_idx), w_t3.reshape(k * cout, cin),
            feats_or_col.dtype,
        )
        d_kernel = _dw3(
            _gather_col3(feats_or_col, idx), g, kernel.shape
        ).astype(kernel.dtype)
        return d_feats, d_kernel, None, None
    w_t = jnp.transpose(kernel.reshape(k, cin, cout), (0, 2, 1)).reshape(k * cout, cin)
    g_col = _gather_col(g, inv_idx)  # [N_in, K*Cout], tap-aligned (no mirror)
    d_feats = jnp.dot(g_col, w_t, preferred_element_type=jnp.float32).astype(
        feats_or_col.dtype
    )
    # d_W from the same gather (see strided_conv_xwin backward)
    if SAVE_COL:
        d_kernel = jnp.dot(
            feats_or_col.T, g, preferred_element_type=jnp.float32
        ).astype(kernel.dtype)
    elif DW_FROM_GCOL:
        d_kernel = _dw_from_gcol(g_col, feats_or_col, k, cout, reverse_slots=False).astype(kernel.dtype)
    else:
        col = _gather_col(feats_or_col, idx)
        d_kernel = jnp.dot(col.T, g, preferred_element_type=jnp.float32).astype(kernel.dtype)
    return d_feats, d_kernel, None, None


strided_conv_t.defvjp(_st_fwd, _st_bwd)
