"""Static-shape sparse N-D convolution machinery (spconv-equivalent for TPU).

The reference's middle encoder is spconv's CUDA submanifold/strided sparse conv
(reference requirements.txt:20-21, invoked at
models/detectors/adversarial_voxelnet.py:141). This module re-designs it for
XLA/TPU:

  * Active voxels are kept **sorted by flattened coordinate id** with padding
    rows carrying a +inf sentinel. The voxelizer emits this order already, and
    downsampling preserves it, so no hash tables are needed.
  * Neighbor resolution = vectorized binary search (`searchsorted`) over the
    sorted ids — O(N · K · log N) gathers, all VPU-friendly, zero HBM blowup
    (a dense coord->index table for KITTI's [41,1600,1408] grid would cost
    369 MB per stage per sample).
  * A K-tap conv is an img2col gather into [N, K*Cin] followed by a single
    [N, K*Cin] x [K*Cin, Cout] matmul — exactly the MXU's preferred shape.
  * Strided ("regular") sparse conv computes its output site set the way
    spconv does — the union of all output positions whose kernel window
    covers an active input — via candidate generation + sort-unique, capped
    at a static `out_cap`.

Coordinates are N-dimensional. The batched 3D case uses 4D coords
(batch, z, y, x) with kernel extent 1 / stride 1 / padding 0 on the batch
axis, so an entire batch is a single sparse array: one big sort, one big
binary search, one big matmul — far better MXU shapes than per-sample vmap,
and BatchNorm over active voxels sees the whole batch exactly like the
reference's BN1d does.

All ids fit int32 (KITTI: 6 * 41*1600*1408 ≈ 5.5e8 < 2^31).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INT32_MAX = np.iinfo(np.int32).max


def _strides_of(shape: Sequence[int]) -> np.ndarray:
    """Row-major flattening strides for a shape."""
    s = np.ones(len(shape), np.int64)
    for i in range(len(shape) - 2, -1, -1):
        s[i] = s[i + 1] * shape[i + 1]
    assert s[0] * shape[0] <= INT32_MAX, "flat id space exceeds int32"
    return s.astype(np.int32)


class SparseGrid(NamedTuple):
    """A set of active sites on a dense N-D grid, sorted by flat id."""

    flat_ids: jnp.ndarray  # [N] int32 sorted ascending, padding = INT32_MAX
    coords: jnp.ndarray    # [N, ndim] int32; padding rows = -1
    mask: jnp.ndarray      # [N] bool
    spatial_shape: Tuple[int, ...]  # static dense shape

    @property
    def ndim(self) -> int:
        return len(self.spatial_shape)


# Explicit pytree registration overriding the NamedTuple default:
# `spatial_shape` is STATIC aux data, not leaves — so a SparseGrid can cross
# transform boundaries (nn.checkpoint around the CenterPoint encoder,
# jit/vmap args) without its shape ints becoming tracers.
jax.tree_util.register_pytree_node(
    SparseGrid,
    lambda g: ((g.flat_ids, g.coords, g.mask), g.spatial_shape),
    lambda shape, kids: SparseGrid(kids[0], kids[1], kids[2], shape),
)


def flatten_coords(coords: jnp.ndarray, mask: jnp.ndarray, spatial_shape) -> jnp.ndarray:
    strides = jnp.asarray(_strides_of(spatial_shape))
    flat = jnp.sum(coords * strides[None, :], axis=1)
    return jnp.where(mask, flat, INT32_MAX).astype(jnp.int32)


def make_grid(coords: jnp.ndarray, mask: jnp.ndarray, spatial_shape) -> SparseGrid:
    """Build a SparseGrid from (possibly unsorted) coords; sorts by flat id."""
    flat = flatten_coords(coords, mask, spatial_shape)
    order = jnp.argsort(flat)
    return SparseGrid(flat[order], coords[order], mask[order], tuple(spatial_shape))


def with_batch_axis(
    coords: jnp.ndarray, mask: jnp.ndarray, spatial_shape
) -> Tuple[SparseGrid, jnp.ndarray]:
    """Merge per-sample sparse sets [B, V, 3] into one 4D SparseGrid.

    Although each sample's rows are sorted, padding rows carry the +inf
    sentinel, so the batch-major concatenation is NOT globally sorted (sample
    0's padding would sort after sample 1's real ids) — a single argsort over
    [B*V] fixes it.

    Returns:
        (grid, order) where `order` indexes the flattened [B*V] input — apply
        it to per-voxel features (`feats.reshape(B*V, C)[order]`) to align
        them with the grid rows.
    """
    B, V = coords.shape[:2]
    # int32 flat-id ceiling (VERDICT r4 #7): merged ids are
    # b * prod(spatial) + spatial_offset in int32, so the merged id space
    # must stay below 2^31 (B <= 23 at the KITTI 41x1600x1408 grid). Shapes
    # are static, so this fails loudly at trace/config time instead of
    # silently corrupting ids. Scale batch over the data-parallel mesh
    # (per-DEVICE sub-batches each get their own id space) instead.
    id_space = B * int(np.prod(spatial_shape))
    if id_space >= 1 << 31:
        raise ValueError(
            f"merged flat-id space B*prod(sparse_shape) = {B}*"
            f"{int(np.prod(spatial_shape))} = {id_space} overflows int32 "
            f"(max batch here: {((1 << 31) - 1) // int(np.prod(spatial_shape))}). "
            "Shard the batch over the mesh (per-device sub-plans) instead of "
            "growing the per-device batch."
        )
    batch_col = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None, None], (B, V, 1)
    )
    coords4 = jnp.concatenate([batch_col, coords], axis=-1).reshape(B * V, coords.shape[-1] + 1)
    mask_flat = mask.reshape(B * V)
    coords4 = jnp.where(mask_flat[:, None], coords4, -1)
    shape4 = (B,) + tuple(spatial_shape)
    flat = flatten_coords(coords4, mask_flat, shape4)
    order = jnp.argsort(flat)
    grid = SparseGrid(flat[order], coords4[order], mask_flat[order], shape4)
    return grid, order


def kernel_offsets(kernel_size: Sequence[int]) -> np.ndarray:
    """All taps of an N-D kernel, row-major. [K, ndim] int32 (static)."""
    grids = np.meshgrid(*[np.arange(k) for k in kernel_size], indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=1).astype(np.int32)


_PACK_CAP = (1 << 30) - 1  # ids must fit 30 bits to pack (value, tag) in int32

# A/B gate for the sort-free submanifold rank path (merge_path_ranks).
# Default OFF: measured 43 ms vs the packed sort's 12.6 ms for the 9-group
# 96k-row load on v5e (tools/bench_mp_ranks) — the batched compare-reduce
# loses to lax.sort despite doing asymptotically less work. The big-id-space
# case (merged batch B >= 12) goes through the WIDE two-key sort instead.
import os as _os

MP_RANKS = _os.environ.get("RPC_MP_RANKS", "0") == "1"


# value band for the WIDE (two-key) rank sort: real ids stay unclamped (all
# KITTI-scale id spaces fit int32 minus this margin), sentinels clamp here so
# successor arithmetic cannot overflow int32
_WIDE_BAND = INT32_MAX - (1 << 26)


def _sorted_rank_scan(sorted_ids, q, wide):
    """Shared core: one sort -> (keys_s values, payload_s, is_q, ins, next_table).

    Packed mode (wide=False) packs (value << 1 | is_table) into int32 for a
    single-key sort — requires ids < 2^30. Wide mode sorts (value, is_table)
    as TWO keys (queries order before equal table entries either way, i.e.
    'left' rank semantics) — ids only need int32, lifting the 2^30 cap for
    merged batches B >= 12 at ~the cost of one extra key column in the sort.
    Returned `keys` are id-space VALUES in wide mode and packed keys
    otherwise; `next_table` is in the same unit.
    """
    n = sorted_ids.shape[0]
    m = q.shape[0]
    payload = jnp.concatenate(
        [jnp.zeros((n,), jnp.int32), jnp.arange(1, m + 1, dtype=jnp.int32)]
    )
    if wide:
        vals = jnp.concatenate(
            [
                jnp.minimum(sorted_ids, _WIDE_BAND),
                jnp.clip(q, -(1 << 26), _WIDE_BAND),
            ]
        )
        tags = jnp.concatenate(
            [jnp.ones((n,), jnp.int32), jnp.zeros((m,), jnp.int32)]
        )
        keys_s, _, pay_s = jax.lax.sort((vals, tags, payload), num_keys=2)
        sentinel = _WIDE_BAND
    else:
        keys = jnp.concatenate(
            [
                jnp.minimum(sorted_ids, _PACK_CAP) * 2 + 1,
                jnp.minimum(q, _PACK_CAP) * 2,
            ]
        )
        keys_s, pay_s = jax.lax.sort((keys, payload), num_keys=1)
        sentinel = INT32_MAX
    is_q = pay_s > 0
    q_before_incl = jnp.cumsum(is_q.astype(jnp.int32))
    ins = jnp.arange(n + m, dtype=jnp.int32) - (q_before_incl - 1)
    table_keys = jnp.where(is_q, sentinel, keys_s)
    next_table = jax.lax.associative_scan(jnp.minimum, table_keys, reverse=True)
    return keys_s, pay_s, is_q, ins, next_table


def _scatter_to_query_order(packed, pay_s, is_q, m):
    out = (
        jnp.zeros((m + 1,), jnp.int32)
        .at[jnp.where(is_q, pay_s, 0)]
        .set(jnp.where(is_q, packed, 0))[1:]
    )
    return out


def _rank_and_hit(sorted_ids: jnp.ndarray, q: jnp.ndarray, wide: bool = False):
    """(insertion rank, exact-hit) for every query via ONE key+payload sort —
    per-query binary search gathers scalars, and each 4-byte load pads to a
    full TPU tile (~10x slower measured).

    Packs (value << 1 | is_table) into int32 so queries order before equal
    table entries ('left' semantics). The hit test is fused into the same
    pass: a query hits iff the next table key at-or-after it (reverse
    cumulative min) equals its own value — no extra gather. Rank and hit ride
    one packed scatter back to query order. Requires ids < 2^30 unless
    `wide` (two-key sort, see :func:`_sorted_rank_scan`)."""
    m = q.shape[0]
    keys_s, pay_s, is_q, ins, next_table = _sorted_rank_scan(sorted_ids, q, wide)
    if wide:
        hit_sorted = (next_table == keys_s) & is_q
    else:
        hit_sorted = (next_table == keys_s + 1) & is_q
    packed = ins * 2 + hit_sorted.astype(jnp.int32)
    out = _scatter_to_query_order(packed, pay_s, is_q, m)
    return out // 2, (out % 2) == 1


def _rank_and_succ_delta(
    sorted_ids: jnp.ndarray, q: jnp.ndarray, dmax: int, wide: bool = False
):
    """(insertion rank, clamped successor delta) per query via one sort.

    Same machinery as :func:`_rank_and_hit`, but instead of an exact-hit bit
    it returns `d0 = min(ids[rank] - q, dmax)` — the id distance from the
    query to the first table entry at-or-after it (dmax when none or
    farther). `d0` rides the SAME int32 scatter as the rank (rank needs ~21
    bits for KITTI sizes, d0 needs ceil(log2(dmax+1))), so the successor value
    costs no extra gather — the naive alternative, gathering ids[rank] row by
    row, is ~3 ms for 864k scalar rows on v5e.
    """
    n = sorted_ids.shape[0]
    m = q.shape[0]
    span = dmax + 1
    assert (n + m) * 2 * span < INT32_MAX, "rank+delta won't pack in int32"
    keys_s, pay_s, is_q, ins, next_table = _sorted_rank_scan(sorted_ids, q, wide)
    if wide:
        # values are clamped to a band, so the subtraction cannot overflow
        d0 = jnp.clip(next_table - keys_s, 0, dmax)
    else:
        # packed table key = v*2+1, packed query key = q*2 -> delta in id
        # space is (next_table - 1)//2 - key//2; clamp BEFORE packing
        d0 = jnp.clip((next_table - 1) // 2 - keys_s // 2, 0, dmax)
    packed = ins * span + d0
    out = _scatter_to_query_order(packed, pay_s, is_q, m)
    return out // span, out % span


def merge_path_ranks(
    sorted_ids: jnp.ndarray,
    sorted_queries: jnp.ndarray,
    dmax: int,
    tile: int = None,
    cap: int = None,
):
    """(rank, clamped successor delta) for a SORTED query stream — no sort.

    Sort-free alternative to :func:`_rank_and_succ_delta` for the submanifold
    case, where each tap group's queries (ids + const offset) are already in
    output order: merge-path diagonal partitioning of (table, queries) gives
    tiles whose static table window PROVABLY contains every owned query's
    rank (both streams sorted), so ranks come from an in-window compare +
    row-sum and the successor from an in-window masked min — VPU work instead
    of a (1+G)N-key bitonic sort.

    Fully batched and SCATTER-FREE: every tile's window is read as one wide
    dynamic slice, the [T, D, W] compare fuses into its reduces ((n+m)·W VPU
    compares total), and results land in query order through tile-boundary
    scans (a T-element scatter + two cumulative scans recover each query's
    owning tile — TPU scatters of m elements serialize, so none are issued)
    plus ONE flat [m] gather. The default D keeps W = D + dmax + 1 inside
    one 128-lane tile, which is what the reduce pads to anyway. Exact-parity
    with the packed sort is tested.

    Unlike the packed sort this does NOT pack (value, tag) into int32, so ids
    only need `id_space + dmax < cap` — callers with >2^30 id spaces (large
    merged batches) pass a bigger `cap`.

    Args:
        sorted_ids: [n] ascending unique int32 (padding = INT32_MAX).
        sorted_queries: [m] ascending int32 (may be negative at the low end —
            integer semantics are exact, matching the packed sort; sentinels
            at the high end resolve to rank = #real-ids; callers mask).
        dmax: clamp for the successor delta (kx for the xwin use).
        tile: diagonal tile size D (default: 128 - dmax - 1).
        cap: value clamp for sentinel arithmetic (default 2^30-1, matching
            the packed sort). Must satisfy cap + max(query) - min(0, min
            query) < 2^31 on the caller's side.
    Returns:
        (rank [m] int32 in [0, n], d0 [m] int32 in [0, dmax]).
    """
    n = sorted_ids.shape[0]
    m = sorted_queries.shape[0]
    pad = dmax + 1
    if cap is None:
        cap = _PACK_CAP
    cap = int(cap)
    if tile is None:
        tile = max(128 - pad, 32)
    D = int(tile)
    W = D + pad
    n_tiles = -(-(n + m) // D)
    span = dmax + 1
    assert (n + 1) * span < INT32_MAX, "rank+delta won't pack in int32"

    # clamp values once so sentinel arithmetic stays in-range (exact hits on
    # the clamped sentinel give d0=0 like the packed sort; callers mask)
    tbl = jnp.minimum(sorted_ids, cap)
    qs_v = jnp.minimum(sorted_queries, cap)
    # table window slices need W entries; pad the table high
    tbl_pad = jnp.concatenate([tbl, jnp.full((W,), cap, jnp.int32)])
    q_pad = jnp.concatenate([qs_v, jnp.full((D,), cap, jnp.int32)])

    # merge-path boundaries: for diagonal d = tau*D, the number of queries
    # consumed q_off satisfies queries[q_off-1] <= table[d-q_off] with ties
    # taken from the query side ('left' rank semantics). Vectorized binary
    # search over all tile boundaries at once.
    taus = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    diag = jnp.minimum(taus * D, n + m)
    lo = jnp.maximum(diag - n, 0)
    hi = jnp.minimum(diag, m)

    def bs_body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi + 1) // 2  # candidate q_off
        # take query mid-1 before table[diag-mid] iff q[mid-1] <= t[diag-mid]
        q_prev = q_pad[jnp.maximum(mid - 1, 0)]
        t_at = tbl_pad[jnp.clip(diag - mid, 0, n + W - 1)]
        ok = (mid == 0) | (q_prev <= t_at)
        return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1))

    steps = max(int(np.ceil(np.log2(max(m, 2)))) + 1, 1)
    lo, hi = jax.lax.fori_loop(0, steps, bs_body, (lo, hi))
    q_offs = lo  # [n_tiles+1] queries consumed before each tile boundary

    q_off = q_offs[:-1]                # [T]
    t_off = taus[:-1] * D - q_off      # [T], >= 0 by the boundary bounds
    # wide dynamic slices lower to a gather of T rows x W consecutive
    # elements (row-count-bound: ~T*3.3ns), not T*W scalar gathers
    qw = jax.vmap(lambda o: jax.lax.dynamic_slice(q_pad, (o,), (D,)))(q_off)
    tw = jax.vmap(lambda o: jax.lax.dynamic_slice(tbl_pad, (o,), (W,)))(t_off)
    # rank = t_off + #(window table < q); the window ascends, so the
    # successor (first t >= q) sits AT index rel — same fused compare feeds
    # both reduces, nothing [T, D, W]-shaped is materialized
    less = tw[:, None, :] < qw[:, :, None]  # [T, D, W] — fuses into reduces
    rel = jnp.sum(less, axis=-1, dtype=jnp.int32)
    succ = jnp.min(jnp.where(less, cap, tw[:, None, :]), axis=-1)
    rank_t = jnp.clip(t_off[:, None] + rel, 0, n)
    d0_t = jnp.clip(succ - qw, 0, dmax).astype(jnp.int32)

    # tile tau owns queries [q_offs[tau], q_offs[tau+1]) — disjoint and
    # contiguous, so each query's owner is recoverable WITHOUT an m-element
    # scatter (TPU scatters serialize): scatter the T-2 interior boundaries
    # (counts + positions, duplicates from empty tiles accumulate/retake
    # correctly) and scan.
    bnd = q_offs[1:-1]
    tau_q = jnp.cumsum(
        jnp.zeros((m + 1,), jnp.int32).at[bnd].add(1, mode="drop")[:m]
    )  # [m] owning tile = #(boundaries <= i)
    base = jax.lax.cummax(
        jnp.zeros((m + 1,), jnp.int32).at[bnd].max(bnd, mode="drop")[:m]
    )  # [m] q_offs[tau_q] = largest boundary <= i (0 before the first)
    pos = jnp.arange(m, dtype=jnp.int32) - base
    packed = (rank_t * span + d0_t).reshape(-1)
    out = packed[tau_q * D + pos]  # the one per-query gather
    return out // span, out % span


def lookup(grid: SparseGrid, query_flat: jnp.ndarray) -> jnp.ndarray:
    """Find positions of query flat-ids in the grid. Misses -> N (one-past-end).

    query_flat: [...] int32. Returns int32 indices in [0, N].
    """
    n = grid.flat_ids.shape[0]
    shape = query_flat.shape
    q = query_flat.reshape(-1)
    id_space = int(np.prod([int(s) for s in grid.spatial_shape], dtype=np.int64))
    j, hit = _rank_and_hit(grid.flat_ids, q, wide=id_space >= _PACK_CAP)
    hit = hit & (q != INT32_MAX)
    return jnp.where(hit, jnp.clip(j, 0, n - 1), n).reshape(shape)


def _neighbor_index_dense(in_grid, out_coords, out_mask, offsets, stride, padding):
    """One lookup query per tap (reference path; used when the windowed form
    does not apply)."""
    ndim = in_grid.ndim
    in_shape = in_grid.spatial_shape
    strides = _strides_of(in_shape)
    offsets = np.asarray(offsets)
    base = [
        out_coords[:, a] * int(stride[a]) - int(padding[a]) for a in range(ndim)
    ]
    cols = []
    for k in range(offsets.shape[0]):
        flat = None
        valid = out_mask
        for a in range(ndim):
            q = base[a] + int(offsets[k, a])
            valid = valid & (q >= 0) & (q < in_shape[a])
            term = q * int(strides[a])
            flat = term if flat is None else flat + term
        cols.append(jnp.where(valid, flat, INT32_MAX).astype(jnp.int32))
    queries = jnp.stack(cols, axis=1)  # [N, K]
    return lookup(in_grid, queries)


def _neighbor_index_windowed(in_grid, out_coords, out_mask, kernel_size, stride, padding):
    """Grouped lookup: one rank query per (leading-axes tap group); the
    consecutive last-axis taps are resolved from a kx-wide id window.

    If q0's insertion rank is p, then q0+dx (present or not) sits at
    p + #present{q0..q0+dx-1} — all ids between are consecutive integers. So
    one gather of the id window ids[p .. p+kx-1] (built as a shifted [N, kx]
    table, gathered as rows) yields positions AND hit tests for all kx taps.
    Cuts the rank sort from (1+K)N to (1+K/kx)N keys and removes 2/3 of the
    scatter/gather traffic of the dense form.
    """
    ndim = in_grid.ndim
    kx = int(kernel_size[-1])
    in_shape = in_grid.spatial_shape
    strides = _strides_of(in_shape)
    n = in_grid.flat_ids.shape[0]
    group_offs = kernel_offsets(kernel_size[:-1])  # [G, ndim-1]
    G = group_offs.shape[0]
    subm = MP_RANKS and (out_coords is in_grid.coords) and all(
        int(s) == 1 for s in stride
    )

    base = [
        out_coords[:, a] * int(stride[a]) - int(padding[a]) for a in range(ndim)
    ]
    last = base[ndim - 1]
    q0_cols, lead_valid_cols = [], []
    for g in range(G):
        flat = last  # last-axis stride is 1 in flat id space
        valid = out_mask
        for a in range(ndim - 1):
            q = base[a] + int(group_offs[g, a])
            valid = valid & (q >= 0) & (q < in_shape[a])
            flat = flat + q * int(strides[a])
        q0_cols.append(jnp.where(valid, flat, INT32_MAX).astype(jnp.int32))
        lead_valid_cols.append(valid)
    q0 = jnp.stack(q0_cols, axis=1)           # [N, G]
    lead_valid = jnp.stack(lead_valid_cols, 1)  # [N, G]

    if subm:
        # sorted per-group streams (ids + const delta) -> sort-free batched
        # merge-path ranks; also lifts the 2^30 pack cap (id_space < cap)
        deltas = [
            sum(
                (int(group_offs[g, a]) - int(padding[a])) * int(strides[a])
                for a in range(ndim - 1)
            )
            - int(padding[ndim - 1])
            for g in range(G)
        ]
        dspan = max(abs(d) for d in deltas)
        cap = INT32_MAX - dspan - kx - 2
        id_space = int(np.prod([int(s) for s in in_shape], dtype=np.int64))
        assert id_space + kx < cap, "flat id space too large for int32"
        ids_c = jnp.minimum(in_grid.flat_ids, cap)
        q0s = jnp.stack([ids_c + int(d) for d in deltas])  # [G, n]
        p, _ = jax.vmap(
            lambda q: merge_path_ranks(in_grid.flat_ids, q, 1, cap=cap)
        )(q0s)
        p = p.T  # [N, G]
        # raw query values for the target arithmetic below (garbage where
        # invalid — masked by lead_valid exactly like the sort path's MAX)
        q0 = jnp.where(lead_valid, q0s.T, INT32_MAX)
    else:
        id_space = int(np.prod([int(s) for s in in_shape], dtype=np.int64))
        p, _ = _rank_and_hit(
            in_grid.flat_ids, q0.reshape(-1), wide=id_space >= _PACK_CAP
        )
        p = p.reshape(q0.shape)  # [N, G] insertion ranks in [0, n]

    # shifted id window table [n+1, kx]: row i = ids[i .. i+kx-1]
    ids_pad = jnp.concatenate(
        [in_grid.flat_ids, jnp.full((kx,), INT32_MAX, jnp.int32)]
    )
    ids_win_tbl = jnp.stack([ids_pad[d : d + n + 1] for d in range(kx)], axis=1)
    idw = ids_win_tbl[jnp.minimum(p, n)]  # [N, G, kx]

    out_cols = []
    pos = p
    prev_present = None
    q0_valid = q0 != INT32_MAX
    for dx in range(kx):
        target = q0 + dx
        if dx > 0:
            # position arithmetic uses pure VALUE presence: flat-id integers
            # are exact even when the x coordinate is out of bounds (it
            # aliases a neighboring row numerically, and ranks only care
            # about values) — bounds filtering applies to `hit` only
            pos = pos + prev_present.astype(jnp.int32)
        present = jnp.zeros(q0.shape, bool)
        for r in range(kx):
            present = present | (idw[:, :, r] == target)
        present = present & q0_valid
        # last-axis bounds: base coord + dx within [0, W)
        lx = (last + dx)[:, None]
        hit = present & (lx >= 0) & (lx < in_shape[ndim - 1])
        out_cols.append(jnp.where(hit, jnp.minimum(pos, n - 1), n).astype(jnp.int32))
        prev_present = present
    # tap order: groups-major, dx-minor == kernel_offsets(kernel_size) order
    idx = jnp.stack(out_cols, axis=2).reshape(q0.shape[0], G * kx)
    return idx


class XWindowInfo(NamedTuple):
    """x-window-table form of a neighbor relation (see neighbor_xwin_info).

    `rows[i, g]` indexes a row of the input-side x-window table
    (ops/subm_conv.x_window_table): row p*kx + d0 holds the kx taps of the
    group's base id q0 = ids[p] - d0, already resolved and zero-filled on the
    input side. A conv is then ONE gather of G*N rows of width kx*C plus the
    matmul — no per-(site, group) slot resolution at all (the A/B on v5e
    showed that resolution work making the slot-windowed form 2-4x slower
    than even the dense 27-row gather, while gather time is row-count-bound:
    identical for 16ch and 64ch rows).

    `xvalid[i, t]` masks taps whose x coordinate (out_x*stride - pad + t)
    falls outside [0, W): id arithmetic wraps x overflow into the next y row,
    and in exactly that case the table's own bounds check is fooled (the
    aliased row legitimately holds its OWN x-neighbors), so the exclusion
    must come from the output side.
    """

    rows: jnp.ndarray    # [N, G] int32 in [0, n_in*kx]; n_in*kx = miss row
    xvalid: jnp.ndarray  # [N, kx] bool
    kx: int
    n_in: int

    @property
    def num_taps(self) -> int:
        return self.rows.shape[1] * self.kx


def neighbor_xwin_info(
    in_grid: SparseGrid,
    out_coords: jnp.ndarray,
    out_mask: jnp.ndarray,
    kernel_size: Sequence[int],
    stride: Sequence[int] = None,
    padding: Sequence[int] = None,
) -> XWindowInfo:
    """Neighbor relation for the x-window-table gather conv.

    Submanifold case (out == in grid, unit strides): each tap group's query
    stream is ids + const delta — already sorted — so ranks come from the
    sort-free batched :func:`merge_path_ranks` per group (VPU compare-reduce,
    measured far below the (1+G)·N-key rank sort it replaces) and the id
    space only needs to fit int32 (no 2^30 pack cap — large merged batches
    stay on this path). Otherwise: one packed rank sort of (1 + G)·N keys;
    the successor delta d0 (which table row within the kx-wide window the
    rank points at) rides the same sort via :func:`_rank_and_succ_delta`.
    """
    ndim = in_grid.ndim
    stride = (1,) * ndim if stride is None else stride
    padding = (1,) * ndim if padding is None else padding
    kernel_size = tuple(int(v) for v in kernel_size)
    kx = kernel_size[-1]
    in_shape = in_grid.spatial_shape
    strides = _strides_of(in_shape)
    n = in_grid.flat_ids.shape[0]
    id_space = int(np.prod([int(s) for s in in_shape], dtype=np.int64))
    # NOTE: no constraint relating W and kx — taps are matched purely by flat
    # id (unique), and out-of-range x taps are excluded by xvalid, so windows
    # that span multiple y rows are handled exactly
    group_offs = kernel_offsets(kernel_size[:-1])  # [G, ndim-1]
    G = group_offs.shape[0]
    subm = MP_RANKS and (out_coords is in_grid.coords) and all(
        int(s) == 1 for s in stride
    )

    base = [out_coords[:, a] * int(stride[a]) - int(padding[a]) for a in range(ndim)]
    last = base[ndim - 1]
    valid_cols = []
    for g in range(G):
        valid = out_mask
        for a in range(ndim - 1):
            q = base[a] + int(group_offs[g, a])
            valid = valid & (q >= 0) & (q < in_shape[a])
        valid_cols.append(valid)
    q0_valid = jnp.stack(valid_cols, 1)    # [N, G]

    if subm:
        # per-group queries = ids + delta_g (pure id arithmetic keeps them
        # sorted; bounds validity applies AFTER the ranks, exactly like the
        # sort path's xvalid wrap handling)
        deltas = [
            sum(
                (int(group_offs[g, a]) - int(padding[a])) * int(strides[a])
                for a in range(ndim - 1)
            )
            - int(padding[ndim - 1])
            for g in range(G)
        ]
        dspan = max(abs(d) for d in deltas)
        cap = INT32_MAX - dspan - kx - 2
        assert id_space + kx < cap, "flat id space too large for int32"
        ids_c = jnp.minimum(in_grid.flat_ids, cap)
        q0s = jnp.stack([ids_c + int(d) for d in deltas])  # [G, n], each sorted
        p, d0 = jax.vmap(
            lambda q: merge_path_ranks(in_grid.flat_ids, q, kx, cap=cap)
        )(q0s)
        p = p.T
        d0 = d0.T
    else:
        wide = id_space + kx >= _PACK_CAP
        assert id_space + kx < _WIDE_BAND, "flat id space too large for int32 rank sort"
        q0_cols = []
        for g in range(G):
            flat = last
            for a in range(ndim - 1):
                flat = flat + (base[a] + int(group_offs[g, a])) * int(strides[a])
            q0_cols.append(
                jnp.where(q0_valid[:, g], flat, INT32_MAX).astype(jnp.int32)
            )
        q0 = jnp.stack(q0_cols, axis=1)        # [N, G]
        p, d0 = _rank_and_succ_delta(
            in_grid.flat_ids, q0.reshape(-1), kx, wide=wide
        )
        p = p.reshape(q0.shape)
        d0 = d0.reshape(q0.shape)
    hit = q0_valid & (d0 < kx) & (p < n)
    rows = jnp.where(hit, p * kx + d0, n * kx).astype(jnp.int32)

    # x-bounds per tap, shared across groups (x never enters group offsets)
    w_dim = in_shape[ndim - 1]
    lx = last[:, None] + jnp.arange(kx, dtype=jnp.int32)[None, :]
    xvalid = (lx >= 0) & (lx < w_dim)
    return XWindowInfo(rows, xvalid, kx, n)


def neighbor_index(
    in_grid: SparseGrid,
    out_coords: jnp.ndarray,
    out_mask: jnp.ndarray,
    offsets_or_kernel,
    stride: Sequence[int] = None,
    padding: Sequence[int] = None,
) -> jnp.ndarray:
    """Per output site, the input-row index for each kernel tap; misses -> N_in.

    For output site o and tap k the input coordinate is
    `o * stride - padding + offset_k`. Accepts either a kernel_size tuple
    (preferred — enables the grouped windowed form when the last axis has
    stride 1) or an explicit [K, ndim] offsets array. TPU layout notes: tap
    math runs on flat [N] vectors (an [N, K, ndim] intermediate would pad its
    tiny trailing dims to full tiles); compute this ONCE per (grid, kernel
    geometry) and share it across all conv layers on that grid.

    Returns [N_out, K] int32 in [0, N_in].
    """
    ndim = in_grid.ndim
    stride = (1,) * ndim if stride is None else stride
    padding = (1,) * ndim if padding is None else padding
    arr = np.asarray(offsets_or_kernel)
    if arr.ndim == 1:  # kernel_size tuple
        kernel_size = tuple(int(v) for v in arr)
        kx = kernel_size[-1]
        id_space = int(np.prod([int(s) for s in in_grid.spatial_shape], dtype=np.int64))
        # last-axis taps are consecutive in INPUT coords (x = o*s - p + dx)
        # for any stride, so the windowed form applies whenever kx > 1.
        # Submanifold relations rank via merge-path (no pack cap), so only
        # the non-subm windowed form needs ids in 30 bits.
        subm = MP_RANKS and (out_coords is in_grid.coords) and all(
            int(s) == 1 for s in stride
        )
        if kx > 1 and id_space < _WIDE_BAND:
            return _neighbor_index_windowed(
                in_grid, out_coords, out_mask, kernel_size, stride, padding
            )
        offsets = kernel_offsets(kernel_size)
    else:
        offsets = arr
    return _neighbor_index_dense(in_grid, out_coords, out_mask, offsets, stride, padding)


def inverse_neighbor_index(
    in_grid: SparseGrid,
    out_grid: SparseGrid,
    offsets: np.ndarray,
    stride: Sequence[int],
    padding: Sequence[int],
) -> jnp.ndarray:
    """For each INPUT site i and tap k: the output site o that reads i at tap
    k (o = (i + padding - offset_k) / stride when divisible), or N_out.

    This is the transpose of :func:`neighbor_index` for strided convs — it
    turns the conv's backward scatter into a gather (ops/subm_conv.py).
    Returns [N_in, K] int32 in [0, N_out].
    """
    offsets = np.asarray(offsets)
    ndim = in_grid.ndim
    out_strides = _strides_of(out_grid.spatial_shape)
    cols = []
    for k in range(offsets.shape[0]):
        flat = None
        valid = in_grid.mask
        for a in range(ndim):
            num = in_grid.coords[:, a] + int(padding[a]) - int(offsets[k, a])
            sa = int(stride[a])
            valid = valid & (num % sa == 0)
            o = num // sa
            valid = valid & (o >= 0) & (o < out_grid.spatial_shape[a])
            term = o * int(out_strides[a])
            flat = term if flat is None else flat + term
        cols.append(jnp.where(valid, flat, INT32_MAX).astype(jnp.int32))
    queries = jnp.stack(cols, axis=1)
    return lookup(out_grid, queries)


def inverse_from_forward(idx: jnp.ndarray, n_in: int) -> jnp.ndarray:
    """Inverse neighbor index built from the forward one by scatter.

    For a (strided) conv, input row i is read by AT MOST ONE output row o at
    any given tap k (o is a function of (i, k)), so `inv[i, k] = o where
    idx[o, k] == i` is collision-free per tap — one int32 scatter replaces
    the sort-based :func:`inverse_neighbor_index` (a (1+K)·N-key sort).
    Misses -> N_out, forward miss rows (idx == n_in) land in a scratch row.

    Args:
        idx: [N_out, K] forward index (misses -> n_in).
        n_in: static input row count.
    Returns:
        [n_in, K] int32 in [0, N_out].
    """
    n_out, k = idx.shape
    o = jnp.broadcast_to(jnp.arange(n_out, dtype=jnp.int32)[:, None], (n_out, k))
    flat_pos = idx.astype(jnp.int32) * k + jnp.arange(k, dtype=jnp.int32)[None, :]
    inv = jnp.full(((n_in + 1) * k,), n_out, jnp.int32).at[flat_pos.reshape(-1)].set(
        o.reshape(-1), mode="drop"
    )
    return inv[: n_in * k].reshape(n_in, k)


def gather_neighbors(
    features: jnp.ndarray,
    in_grid: SparseGrid,
    out_coords: jnp.ndarray,
    out_mask: jnp.ndarray,
    offsets: np.ndarray,
    stride: Sequence[int] = None,
    padding: Sequence[int] = None,
    idx: jnp.ndarray = None,
) -> jnp.ndarray:
    """img2col gather: per output site, the [K, Cin] neighborhood (0 for misses).

    Args:
        features: [N_in, Cin] aligned with `in_grid` rows.
        idx: optional precomputed neighbor index from :func:`neighbor_index`.
    Returns:
        [N_out, K, Cin].
    """
    if idx is None:
        idx = neighbor_index(in_grid, out_coords, out_mask, offsets, stride, padding)
    feats_pad = jnp.concatenate([features, jnp.zeros((1,) + features.shape[1:], features.dtype)], 0)
    return feats_pad[idx]


def sort_unique(flat_ids: jnp.ndarray, cap: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unique valid flat-ids, ascending, padded to `cap` with the sentinel.

    Args:
        flat_ids: [M] int32 candidates (sentinel = invalid).
    Returns:
        (unique_ids [cap], count scalar int32). Ids beyond `cap` are dropped
        (spatial-order truncation, mirrors max_voxels-style caps).
    """
    s = jnp.sort(flat_ids)
    is_first = jnp.concatenate([s[:1] != INT32_MAX, (s[1:] != s[:-1]) & (s[1:] != INT32_MAX)])
    rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    keep = is_first & (rank < cap)
    out = jnp.full((cap + 1,), INT32_MAX, jnp.int32).at[
        jnp.where(keep, rank, cap)
    ].set(jnp.where(keep, s, INT32_MAX))[:cap]
    count = jnp.minimum(jnp.sum(is_first), cap).astype(jnp.int32)
    return out, count


def _unflatten(flat: jnp.ndarray, spatial_shape) -> jnp.ndarray:
    strides = _strides_of(spatial_shape)
    coords = []
    for st in strides:
        coords.append(flat // int(st))
        flat = flat % int(st)
    return jnp.stack(coords, axis=-1).astype(jnp.int32)


def downsample_sites(
    in_grid: SparseGrid,
    kernel_size: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
    out_cap: int,
) -> SparseGrid:
    """Output active set of a regular (non-submanifold) strided sparse conv.

    spconv semantics: an output position o is active iff its receptive window
    `o*stride - padding + [0, k)` contains an active input. We generate, for
    every input voxel and tap, the candidate `o = (i + padding - tap) / stride`
    (valid when divisible and in range), then sort-unique with a static cap.
    """
    out_shape = tuple(
        (dim + 2 * p - k) // s + 1
        for dim, k, s, p in zip(in_grid.spatial_shape, kernel_size, stride, padding)
    )
    ndim = in_grid.ndim
    out_strides = _strides_of(out_shape)
    # An input i is covered by output o on axis a iff
    # o*s in [i + p - k + 1, i + p], i.e. o in {floor((i+p)/s) - j} for
    # j = 0..ceil(k/s)-1 (with window+bounds checks) — at most ceil(k/s)
    # candidates per axis instead of k taps (8 vs 27 for the k3/s2 downsample),
    # and no divisibility tests. Math on flat [N] vectors (see neighbor_index
    # for why [N, K, ndim] intermediates are poison on TPU).
    per_axis = []  # per axis: list of (o [N], valid [N])
    for a in range(ndim):
        k_a, s_a, p_a = int(kernel_size[a]), int(stride[a]), int(padding[a])
        top = in_grid.coords[:, a] + p_a
        cands = []
        for j in range(-(-k_a // s_a)):  # ceil(k/s)
            o = top // s_a - j
            valid = (
                in_grid.mask
                & (o * s_a >= top - k_a + 1)
                & (o >= 0)
                & (o < out_shape[a])
            )
            cands.append((o, valid))
        per_axis.append(cands)

    import itertools

    cols = []
    for combo in itertools.product(*per_axis):
        flat = None
        valid = in_grid.mask
        for a, (o, v) in enumerate(combo):
            valid = valid & v
            term = o * int(out_strides[a])
            flat = term if flat is None else flat + term
        cols.append(jnp.where(valid, flat, INT32_MAX).astype(jnp.int32))
    flat = jnp.concatenate(cols, axis=0)
    uniq, count = sort_unique(flat, out_cap)
    mask = jnp.arange(out_cap) < count
    coords = jnp.where(
        mask[:, None], _unflatten(jnp.where(mask, uniq, 0), out_shape), -1
    )
    return SparseGrid(uniq, coords, mask, out_shape)


def downsample_with_index(
    in_grid: SparseGrid,
    kernel_size: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
    out_cap: int,
    forward: bool = True,
) -> Tuple[SparseGrid, jnp.ndarray, jnp.ndarray]:
    """Downsample output sites + forward AND inverse neighbor indices from ONE
    candidate sort.

    :func:`downsample_sites` already enumerates every (input site, covering
    output) candidate and sorts them to unique the output set. Each candidate
    additionally determines its kernel tap (tap_a = (i_a + pad_a) mod s_a +
    j_a * s_a), and a candidate's output row is just the unique-rank of its id
    in that same sort. Riding an (input, tap) payload through the sort
    therefore yields the complete inverse index inv[i, k] (collision-free: an
    input is read by at most one output per tap), and the forward index is
    the scatter transpose (:func:`inverse_from_forward` symmetry). This
    replaces the separate (1+G)N-key rank sort of neighbor_index per strided
    layer — the second-largest index cost in the encoder step.

    Returns:
        (out_grid, idx [N_out_cap, K] in [0, N_in], inv [N_in, K] in [0, cap])
        with K = prod(kernel_size); tap order = kernel_offsets order.
    """
    out_shape = tuple(
        (dim + 2 * p - k) // s + 1
        for dim, k, s, p in zip(in_grid.spatial_shape, kernel_size, stride, padding)
    )
    ndim = in_grid.ndim
    out_strides = _strides_of(out_shape)
    K = int(np.prod([int(k) for k in kernel_size]))
    # kernel-tap flattening strides (row-major, same order as kernel_offsets)
    k_strides = _strides_of(tuple(int(k) for k in kernel_size) + (1,))[:-1]
    n = in_grid.flat_ids.shape[0]

    per_axis = []  # per axis: list of (o [N], tap_a [N] or int, valid [N])
    for a in range(ndim):
        k_a, s_a, p_a = int(kernel_size[a]), int(stride[a]), int(padding[a])
        top = in_grid.coords[:, a] + p_a
        cands = []
        for j in range(-(-k_a // s_a)):  # ceil(k/s)
            o = top // s_a - j
            tap = top - o * s_a  # == top % s_a + j*s_a
            valid = (
                in_grid.mask
                & (o * s_a >= top - k_a + 1)
                & (o >= 0)
                & (o < out_shape[a])
            )
            cands.append((o, tap, valid))
        per_axis.append(cands)

    import itertools

    id_cols, pay_cols = [], []
    row_ids = jnp.arange(n, dtype=jnp.int32)
    for combo in itertools.product(*per_axis):
        flat, tap_flat = None, None
        valid = in_grid.mask
        for a, (o, tap, v) in enumerate(combo):
            valid = valid & v
            term = o * int(out_strides[a])
            flat = term if flat is None else flat + term
            tterm = tap * int(k_strides[a])
            tap_flat = tterm if tap_flat is None else tap_flat + tterm
        id_cols.append(jnp.where(valid, flat, INT32_MAX).astype(jnp.int32))
        # payload: (input row * K + tap) + 1; 0 = invalid
        pay_cols.append(
            jnp.where(valid, row_ids * K + tap_flat + 1, 0).astype(jnp.int32)
        )
    cand_ids = jnp.concatenate(id_cols, axis=0)
    cand_pay = jnp.concatenate(pay_cols, axis=0)

    ids_s, pay_s = jax.lax.sort((cand_ids, cand_pay), num_keys=1)
    is_first = jnp.concatenate(
        [ids_s[:1] != INT32_MAX, (ids_s[1:] != ids_s[:-1]) & (ids_s[1:] != INT32_MAX)]
    )
    rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # unique rank per cand
    keep_uniq = is_first & (rank < out_cap)
    uniq = jnp.full((out_cap + 1,), INT32_MAX, jnp.int32).at[
        jnp.where(keep_uniq, rank, out_cap)
    ].set(jnp.where(keep_uniq, ids_s, INT32_MAX))[:out_cap]
    count = jnp.minimum(jnp.sum(is_first), out_cap).astype(jnp.int32)
    mask = jnp.arange(out_cap) < count
    coords = jnp.where(
        mask[:, None], _unflatten(jnp.where(mask, uniq, 0), out_shape), -1
    )
    out_grid = SparseGrid(uniq, coords, mask, out_shape)

    # inverse index: scatter each candidate's unique rank to (input, tap)
    cand_ok = (pay_s > 0) & (rank >= 0) & (rank < out_cap) & (ids_s != INT32_MAX)
    inv = (
        jnp.full((n * K + 1,), out_cap, jnp.int32)
        .at[jnp.where(cand_ok, pay_s - 1, n * K)]
        .set(jnp.where(cand_ok, rank, out_cap), mode="drop")[: n * K]
        .reshape(n, K)
    )
    # forward index = scatter transpose of the inverse (skippable when the
    # forward gather runs on the merge-path kernel, which needs no index)
    idx = inverse_from_forward(inv, out_cap) if forward else None
    return out_grid, idx, inv


def xwin_from_index(
    idx: jnp.ndarray,
    out_coords: jnp.ndarray,
    out_mask: jnp.ndarray,
    kx: int,
    n_in: int,
    stride_x: int,
    pad_x: int,
    w_dim: int,
) -> XWindowInfo:
    """Derive an XWindowInfo from an existing dense [N, K] neighbor index.

    The x-window-table gather only needs SOME anchor row inside each group's
    id window plus its tap offset: if tap t0 is the group's first hit with
    input row r, then table row r*kx + t0 serves taps t as E[r, t - t0] =
    feats[id q0 + t] — identical to anchoring at the insertion rank. So no
    rank sort is needed when a dense index is already available (strided
    convs get theirs for free from :func:`downsample_with_index`).
    """
    n_out, k = idx.shape
    g = k // kx
    idx3 = idx.reshape(n_out, g, kx)
    hit = idx3 < n_in
    t0 = jnp.argmax(hit, axis=2).astype(jnp.int32)  # first hit (0 if none)
    any_hit = jnp.any(hit, axis=2)
    r = jnp.take_along_axis(idx3, t0[:, :, None], axis=2)[:, :, 0]
    rows = jnp.where(any_hit, r * kx + t0, n_in * kx).astype(jnp.int32)

    lx = (out_coords[:, -1] * stride_x - pad_x)[:, None] + jnp.arange(
        kx, dtype=jnp.int32
    )[None, :]
    xvalid = out_mask[:, None] & (lx >= 0) & (lx < w_dim)
    return XWindowInfo(rows, xvalid, kx, n_in)


def dense_gather_map(grid: SparseGrid) -> jnp.ndarray:
    """Per dense cell, the sparse row holding it (or N = empty). [size] int32.

    Structure-only (one int32 scatter over the dense cell count), so the host
    plan carries it; with it, densification becomes a gather
    (:func:`scatter_to_dense_gather`) instead of an N-row feature scatter —
    TPU scatters serialize, gathers run on the gather engine.
    """
    n = grid.flat_ids.shape[0]
    size = int(np.prod([int(s) for s in grid.spatial_shape], dtype=np.int64))
    pos = jnp.where(grid.mask, jnp.minimum(grid.flat_ids, size), size)
    return (
        jnp.full((size + 1,), n, jnp.int32)
        .at[pos]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:size]
    )


@jax.custom_vjp
def _dense_gather(features, dmap, pos):
    feats_pad = jnp.concatenate(
        [features, jnp.zeros((1,) + features.shape[1:], features.dtype)], 0
    )
    return feats_pad[dmap]


def _dg_fwd(features, dmap, pos):
    # zero-size dtype token: residuals must be jax types, not dtypes
    token = jnp.zeros((0,), features.dtype)
    return _dense_gather(features, dmap, pos), (pos, token)


def _dg_bwd(res, g):
    # d_feats[i] = g[cell_of(i)] — another gather (cells are unique per row;
    # padding rows read the zero row), no scatter-add anywhere
    pos, token = res
    g_pad = jnp.concatenate([g, jnp.zeros((1,) + g.shape[1:], g.dtype)], 0)
    return g_pad[pos].astype(token.dtype), None, None


_dense_gather.defvjp(_dg_fwd, _dg_bwd)


def scatter_to_dense_gather(
    features: jnp.ndarray, grid: SparseGrid, dmap: jnp.ndarray
) -> jnp.ndarray:
    """Gather-form densification: exact scatter_to_dense replacement.

    dmap from :func:`dense_gather_map` (plan-carried or traced inline); the
    backward gathers through the row->cell map, computed elementwise from the
    grid's own flat ids — scatter-free in both directions.
    """
    n = grid.flat_ids.shape[0]
    size = dmap.shape[0]
    pos = jnp.where(grid.mask, jnp.minimum(grid.flat_ids, size - 1), size)
    dense = _dense_gather(features, dmap, pos)
    return dense.reshape(tuple(grid.spatial_shape) + (features.shape[-1],))


def scatter_to_dense(features: jnp.ndarray, grid: SparseGrid) -> jnp.ndarray:
    """Scatter sparse features into a dense [*spatial_shape, C] grid."""
    shape = grid.spatial_shape
    c = features.shape[1]
    safe = jnp.where(grid.mask[:, None], grid.coords, 0)
    # route padding rows to a scratch cell along the leading axis
    lead = jnp.where(grid.mask, safe[:, 0], shape[0])
    idx = (lead,) + tuple(safe[:, i] for i in range(1, len(shape)))
    dense = jnp.zeros((shape[0] + 1,) + shape[1:] + (c,), features.dtype).at[idx].add(
        jnp.where(grid.mask[:, None], features, 0.0)
    )
    return dense[: shape[0]]
