"""x-window-table gather conv vs the dense-index reference path.

The xwin form (ops/sparse.neighbor_xwin_info + ops/subm_conv.subm_conv_xwin)
must reproduce the dense [N, K] neighbor-index semantics exactly — same
forward, same gradients — while gathering G*N wide rows through an input-side
resolved table instead of K*N narrow rows. Grids are random over a small
spatial shape so x-edge wraps (including padded base rows straddling y, the
case that forbids any table-side x filtering) occur naturally; a dedicated
case pins the wrap semantics down.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.ops import sparse
from robustpointclouds_tpu.ops import subm_conv as sc


def random_grid(rng, shape=(2, 6, 10, 12), n=160, cap=192):
    total = int(np.prod(shape))
    ids = rng.choice(total, size=n, replace=False)
    coords = np.stack(np.unravel_index(ids, shape), axis=1).astype(np.int32)
    coords = np.concatenate([coords, np.zeros((cap - n, 4), np.int32)], 0)
    mask = np.arange(cap) < n
    return sparse.make_grid(jnp.asarray(coords), jnp.asarray(mask), shape)


SUBM = ((1, 3, 3, 3), (1, 1, 1, 1), (0, 1, 1, 1))
DOWN = ((1, 3, 3, 3), (1, 2, 2, 2), (0, 1, 1, 1))


def xwin_expand_index(g, xwin, idx_ref_shape):
    """Expand XWindowInfo to a dense index by simulating the table gather on
    row-identity features, for exact index-level comparison."""
    n = g.flat_ids.shape[0]
    eye = jnp.eye(n + 1, dtype=jnp.float32)[:n]  # row j -> onehot(j)
    col = sc._gather_col_xwin(eye, g.flat_ids, xwin.rows, xwin.xvalid, xwin.kx)
    col = col.reshape(xwin.rows.shape[0], -1, n + 1)  # [N, K, n+1]
    return jnp.where(
        jnp.sum(col, -1) > 0, jnp.argmax(col, -1).astype(jnp.int32), n
    )


@pytest.mark.parametrize("k,s,p", [SUBM, DOWN])
def test_xwin_matches_dense_index(k, s, p):
    rng = np.random.RandomState(0)
    g = random_grid(rng)
    if s == (1, 1, 1, 1):
        out_coords, out_mask = g.coords, g.mask
    else:
        og = sparse.downsample_sites(g, k, s, p, out_cap=192)
        out_coords, out_mask = og.coords, og.mask
    dense = sparse._neighbor_index_dense(
        g, out_coords, out_mask, sparse.kernel_offsets(k), s, p
    )
    xwin = sparse.neighbor_xwin_info(g, out_coords, out_mask, k, s, p)
    expanded = xwin_expand_index(g, xwin, dense.shape)
    np.testing.assert_array_equal(np.asarray(expanded), np.asarray(dense))


def test_subm_conv_xwin_matches_dense():
    rng = np.random.RandomState(1)
    g = random_grid(rng)
    k, s, p = SUBM
    idx = sparse.neighbor_index(g, g.coords, g.mask, sparse.kernel_offsets(k), s, p)
    xwin = sparse.neighbor_xwin_info(g, g.coords, g.mask, k, s, p)

    n, cin, cout = g.mask.shape[0], 8, 16
    feats = jnp.where(
        g.mask[:, None], jnp.asarray(rng.randn(n, cin).astype(np.float32)), 0.0
    )
    kernel = jnp.asarray(rng.randn(27 * cin, cout).astype(np.float32) * 0.1)

    ref = sc.subm_conv(feats, kernel, idx)
    out = sc.subm_conv_xwin(xwin.kx, feats, kernel, g.flat_ids, xwin.rows, xwin.xvalid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def loss_ref(f, w):
        return jnp.sum(jnp.sin(sc.subm_conv(f, w, idx)) * jnp.arange(cout))

    def loss_xw(f, w):
        o = sc.subm_conv_xwin(xwin.kx, f, w, g.flat_ids, xwin.rows, xwin.xvalid)
        return jnp.sum(jnp.sin(o) * jnp.arange(cout))

    gr = jax.grad(loss_ref, argnums=(0, 1))(feats, kernel)
    gw = jax.grad(loss_xw, argnums=(0, 1))(feats, kernel)
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-4)


def test_strided_conv_xwin_matches_dense():
    rng = np.random.RandomState(2)
    g = random_grid(rng)
    k, s, p = DOWN
    og = sparse.downsample_sites(g, k, s, p, out_cap=192)
    idx = sparse.neighbor_index(g, og.coords, og.mask, sparse.kernel_offsets(k), s, p)
    xwin = sparse.neighbor_xwin_info(g, og.coords, og.mask, k, s, p)
    inv = sparse.inverse_from_forward(idx, g.mask.shape[0])

    n, cin, cout = g.mask.shape[0], 8, 16
    feats = jnp.where(
        g.mask[:, None], jnp.asarray(rng.randn(n, cin).astype(np.float32)), 0.0
    )
    kernel = jnp.asarray(rng.randn(27 * cin, cout).astype(np.float32) * 0.1)

    ref = sc.strided_conv(feats, kernel, idx)
    out = sc.strided_conv_xwin(feats, kernel, g.flat_ids, xwin.rows, xwin.xvalid, inv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def loss_ref(f, w):
        return jnp.sum(jnp.cos(sc.strided_conv(f, w, idx)))

    def loss_xw(f, w):
        return jnp.sum(
            jnp.cos(sc.strided_conv_xwin(f, w, g.flat_ids, xwin.rows, xwin.xvalid, inv))
        )

    gr = jax.grad(loss_ref, argnums=(0, 1))(feats, kernel)
    gw = jax.grad(loss_xw, argnums=(0, 1))(feats, kernel)
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,s,p", [SUBM, DOWN])
def test_xwin_matches_dense_index_tiny_w(k, s, p):
    """W < kx: every window spans multiple y rows; id matching + xvalid must
    still reproduce dense semantics exactly."""
    rng = np.random.RandomState(7)
    g = random_grid(rng, shape=(2, 5, 9, 2), n=90, cap=128)
    if s == (1, 1, 1, 1):
        out_coords, out_mask = g.coords, g.mask
    else:
        og = sparse.downsample_sites(g, k, s, p, out_cap=128)
        out_coords, out_mask = og.coords, og.mask
    dense = sparse._neighbor_index_dense(
        g, out_coords, out_mask, sparse.kernel_offsets(k), s, p
    )
    xwin = sparse.neighbor_xwin_info(g, out_coords, out_mask, k, s, p)
    expanded = xwin_expand_index(g, xwin, dense.shape)
    np.testing.assert_array_equal(np.asarray(expanded), np.asarray(dense))


def test_xwin_padded_base_row_wrap():
    """Padded query at x=-1 whose rank lands on a y-wrapped row (prev y,
    x=W-1): tap 0 (x=-1) must be excluded, taps at x=0,1 must resolve — the
    case where a table-side x filter would wrongly kill true neighbors."""
    shape = (1, 1, 3, 4)  # one z-plane, 3 y rows, W=4
    coords = np.array(
        [
            [0, 0, 0, 3],  # (y=0, x=3) — the wrap row
            [0, 0, 1, 0],  # (y=1, x=0) — true tap of the padded query
            [0, 0, 1, 1],  # (y=1, x=1)
        ],
        np.int32,
    )
    cap = 8
    coords = np.concatenate([coords, np.zeros((cap - 3, 4), np.int32)], 0)
    mask = np.arange(cap) < 3
    g = sparse.make_grid(jnp.asarray(coords), jnp.asarray(mask), shape)
    k, s, p = (1, 1, 1, 3), (1, 1, 1, 1), (0, 0, 0, 1)  # pure-x 3-tap kernel
    dense = sparse._neighbor_index_dense(
        g, g.coords, g.mask, sparse.kernel_offsets(k), s, p
    )
    xwin = sparse.neighbor_xwin_info(g, g.coords, g.mask, k, s, p)
    expanded = xwin_expand_index(g, xwin, dense.shape)
    np.testing.assert_array_equal(np.asarray(expanded), np.asarray(dense))


@pytest.mark.parametrize(
    "k,s,p",
    [
        DOWN,
        ((1, 3, 3, 3), (1, 2, 2, 2), (0, 0, 1, 1)),  # stage-4 z-pad-0 geometry
        ((1, 3, 1, 1), (1, 2, 1, 1), (0, 0, 0, 0)),  # conv_out geometry
    ],
)
def test_downsample_with_index_matches_unfused(k, s, p):
    """The single-sort fused path must reproduce downsample_sites +
    neighbor_index + inverse_from_forward exactly (sites, forward, inverse)."""
    rng = np.random.RandomState(11)
    g = random_grid(rng)
    cap = 192
    og = sparse.downsample_sites(g, k, s, p, out_cap=cap)
    idx = sparse.neighbor_index(
        g, og.coords, og.mask, np.asarray(k, np.int64), s, p
    )
    inv = sparse.inverse_from_forward(idx, g.mask.shape[0])

    og2, idx2, inv2 = sparse.downsample_with_index(g, k, s, p, out_cap=cap)
    np.testing.assert_array_equal(np.asarray(og2.flat_ids), np.asarray(og.flat_ids))
    np.testing.assert_array_equal(np.asarray(og2.coords), np.asarray(og.coords))
    np.testing.assert_array_equal(np.asarray(og2.mask), np.asarray(og.mask))
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx))
    np.testing.assert_array_equal(np.asarray(inv2), np.asarray(inv))


def test_downsample_with_index_cap_truncation():
    """With a cap below the true site count, kept sites and indices must stay
    consistent (dropped outputs -> misses on both sides)."""
    rng = np.random.RandomState(13)
    g = random_grid(rng)
    k, s, p = DOWN
    cap = 40  # deliberately below the real output count
    og2, idx2, inv2 = sparse.downsample_with_index(g, k, s, p, out_cap=cap)
    og = sparse.downsample_sites(g, k, s, p, out_cap=cap)
    np.testing.assert_array_equal(np.asarray(og2.flat_ids), np.asarray(og.flat_ids))
    idx = sparse.neighbor_index(g, og.coords, og.mask, np.asarray(k, np.int64), s, p)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx))
    inv = sparse.inverse_from_forward(idx, g.mask.shape[0])
    np.testing.assert_array_equal(np.asarray(inv2), np.asarray(inv))


@pytest.mark.parametrize("shape", [(2, 6, 10, 12), (2, 5, 9, 2)])
def test_xwin_from_index_matches_dense(shape):
    """Strided forward via the dense-index-derived xwin == dense gather conv
    (incl. the tiny-W multi-wrap regime)."""
    rng = np.random.RandomState(21)
    g = random_grid(rng, shape=shape, n=90, cap=128)
    k, s, p = DOWN
    og, idx, inv = sparse.downsample_with_index(g, k, s, p, out_cap=128)
    xwin = sparse.xwin_from_index(
        idx, og.coords, og.mask, k[-1], g.mask.shape[0], s[-1], p[-1], shape[-1]
    )
    n, cin, cout = g.mask.shape[0], 8, 16
    feats = jnp.where(
        g.mask[:, None], jnp.asarray(rng.randn(n, cin).astype(np.float32)), 0.0
    )
    kernel = jnp.asarray(rng.randn(27 * cin, cout).astype(np.float32) * 0.1)
    ref = sc.strided_conv(feats, kernel, idx)
    out = sc.strided_conv_xwin(feats, kernel, g.flat_ids, xwin.rows, xwin.xvalid, inv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    gr = jax.grad(lambda f, w: jnp.sum(jnp.cos(sc.strided_conv(f, w, idx))),
                  argnums=(0, 1))(feats, kernel)
    gw = jax.grad(
        lambda f, w: jnp.sum(jnp.cos(
            sc.strided_conv_xwin(f, w, g.flat_ids, xwin.rows, xwin.xvalid, inv)
        )),
        argnums=(0, 1),
    )(feats, kernel)
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-4)


def test_rank_and_succ_delta():
    ids = jnp.asarray(np.array([3, 5, 6, 9, sparse.INT32_MAX], np.int32))
    q = jnp.asarray(np.array([0, 3, 4, 6, 7, 9, 10, sparse.INT32_MAX], np.int32))
    rank, d0 = sparse._rank_and_succ_delta(ids, q, 3)
    np.testing.assert_array_equal(np.asarray(rank), [0, 0, 1, 2, 3, 3, 4, 4])
    # d0 = clamp(ids[rank] - q, 0, 3); misses hit the clamped sentinel -> 3,
    # EXCEPT a sentinel query, which aliases the clamped sentinel id (d0=0) —
    # callers must mask q == INT32_MAX themselves (neighbor_xwin_info does)
    np.testing.assert_array_equal(np.asarray(d0), [3, 0, 1, 0, 2, 0, 3, 0])


def test_encoder_rel_falls_back_beyond_pack_cap():
    """Merged-batch id spaces beyond 2^30 (B>=12 at the KITTI grid) must use
    the dense relation (non-packed lookup) instead of asserting."""
    import jax.numpy as jnp

    from robustpointclouds_tpu.nn.sparse_encoder import SparseEncoder

    # id space = 2*1024*1024*1023 ~ 2.145e9: > _PACK_CAP, < int32 max
    shape = (2, 1024, 1024, 1023)
    assert int(np.prod(shape, dtype=np.int64)) > sparse._PACK_CAP
    rng = np.random.RandomState(3)
    n, cap = 60, 64
    coords = np.stack([
        rng.randint(0, 2, n),
        rng.randint(0, 1024, n),
        rng.randint(0, 1024, n),
        rng.randint(0, 1023, n),
    ], axis=1).astype(np.int32)
    coords = np.concatenate([coords, np.zeros((cap - n, 4), np.int32)], 0)
    mask = np.arange(cap) < n
    g = sparse.make_grid(jnp.asarray(coords), jnp.asarray(mask), shape)
    # duplicate random coords possible: rebuild mask from unique ids
    feats = jnp.asarray(rng.randn(cap, 4).astype(np.float32))
    feats = jnp.where(g.mask[:, None], feats, 0.0)

    enc = SparseEncoder(sparse_shape=shape[1:], base_channels=4,
                        encoder_channels=((4,), (8, 8)), out_channels=8)
    import jax

    v = enc.init(jax.random.PRNGKey(0), feats, g, False)
    out = enc.apply(v, feats, g, False)
    assert np.isfinite(np.asarray(out)).all()


class TestMergePathRanks:
    """Sort-free merge-path ranks vs the packed rank sort (exact parity)."""

    def _check(self, ids, queries, dmax=3, tile=64):
        ids = jnp.asarray(np.asarray(ids, np.int32))
        queries = jnp.asarray(np.asarray(queries, np.int32))
        r_ref, d_ref = sparse._rank_and_succ_delta(ids, queries, dmax)
        r_mp, d_mp = sparse.merge_path_ranks(ids, queries, dmax, tile=tile)
        np.testing.assert_array_equal(np.asarray(r_mp), np.asarray(r_ref))
        np.testing.assert_array_equal(np.asarray(d_mp), np.asarray(d_ref))

    def test_small_handmade(self):
        ids = [3, 5, 6, 9, sparse.INT32_MAX]
        qs = [0, 3, 4, 6, 7, 9, 10, sparse.INT32_MAX]
        self._check(ids, qs, tile=4)

    @pytest.mark.parametrize("tile", [16, 64, 1024])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_parity(self, tile, seed):
        rng = np.random.RandomState(seed)
        n_real, n_cap = 300, 384
        ids = np.sort(rng.choice(5000, n_real, replace=False)).astype(np.int32)
        ids = np.concatenate([ids, np.full(n_cap - n_real, sparse.INT32_MAX, np.int32)])
        # sorted query stream: shifted ids (the subm per-group pattern) with
        # sentinels at the end, like a masked grid would produce
        qs = np.sort(
            np.concatenate([
                ids[:n_real] + rng.randint(-3, 4, n_real),
                rng.choice(5200, 100),
            ])
        ).astype(np.int32)
        qs = np.concatenate([qs, np.full(17, sparse.INT32_MAX, np.int32)])
        self._check(ids, qs, tile=tile)

    def test_dense_collision_run(self):
        """A dense run of consecutive ids against spread queries (the case
        that breaks naive fixed-window schemes)."""
        ids = np.arange(1000, 1200, dtype=np.int32)
        qs = np.asarray([0, 500, 1000, 1050, 1100, 1199, 1200, 4000], np.int32)
        self._check(ids, qs, tile=8)

    def test_subm_group_equivalence(self):
        """Building the xwin relation per group via merge_path_ranks matches
        neighbor_xwin_info (packed sort) on a random grid."""
        rng = np.random.RandomState(9)
        g = random_grid(rng)
        k, s, p = SUBM
        ref = sparse.neighbor_xwin_info(g, g.coords, g.mask, k, s, p)
        kx = k[-1]
        n = g.flat_ids.shape[0]
        strides = sparse._strides_of(g.spatial_shape)
        group_offs = sparse.kernel_offsets(k[:-1])
        rows_cols = []
        for gi in range(group_offs.shape[0]):
            # per-group queries MUST stay sorted: pure id arithmetic
            # (ids + delta_g, with padding rows pinned at the sentinel);
            # bounds validity is applied AFTER the rank computation —
            # out-of-range aliases get masked exactly like xvalid wraps
            pad_off = 0
            delta = 0
            valid = g.mask
            for a in range(3):
                q = g.coords[:, a] + int(group_offs[gi, a]) - p[a]
                valid = valid & (q >= 0) & (q < g.spatial_shape[a])
                delta += (int(group_offs[gi, a]) - p[a]) * int(strides[a])
            delta -= p[3]
            q0 = jnp.where(
                g.mask, g.flat_ids + delta, sparse.INT32_MAX
            ).astype(jnp.int32)
            rank, d0 = sparse.merge_path_ranks(g.flat_ids, q0, kx, tile=64)
            hit = valid & (d0 < kx) & (rank < n)
            rows_cols.append(jnp.where(hit, rank * kx + d0, n * kx))
        rows = jnp.stack(rows_cols, axis=1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(rows), np.asarray(ref.rows))
