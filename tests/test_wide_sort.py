"""Wide (two-key) rank sort: exactness vs the packed path.

Merged-batch flat-id spaces past 2^30 cannot pack (value, tag) into int32;
the rank machinery then sorts (value, is_table) as two keys
(ops/sparse.py:_sorted_rank_scan). These tests pin the wide path against the
packed path: identical ranks/hits/deltas on the same data, and identical
neighbor relations when the same coordinates are embedded in a small-id-space
grid (packed regime) vs a B=12-scale grid (wide regime).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from robustpointclouds_tpu.ops import sparse

INT32_MAX = np.iinfo(np.int32).max


@pytest.mark.parametrize("n,m,dmax", [(500, 700, 3), (64, 37, 1), (1000, 1000, 5)])
def test_wide_equals_packed_rank_primitives(n, m, dmax):
    rng = np.random.RandomState(n + m)
    ids = np.unique(rng.randint(0, 5000, size=n)).astype(np.int32)
    tbl = np.concatenate([ids, np.full(n - len(ids), INT32_MAX, np.int32)])
    # queries include negatives (subm deltas) and high sentinels
    qs = rng.randint(-7, 5300, size=m).astype(np.int32)
    qs[-3:] = INT32_MAX

    r_p, h_p = sparse._rank_and_hit(jnp.asarray(tbl), jnp.asarray(qs))
    r_w, h_w = sparse._rank_and_hit(jnp.asarray(tbl), jnp.asarray(qs), wide=True)
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_w))
    np.testing.assert_array_equal(np.asarray(h_p), np.asarray(h_w))

    rp, dp = sparse._rank_and_succ_delta(jnp.asarray(tbl), jnp.asarray(qs), dmax)
    rw, dw = sparse._rank_and_succ_delta(
        jnp.asarray(tbl), jnp.asarray(qs), dmax, wide=True
    )
    np.testing.assert_array_equal(np.asarray(rp), np.asarray(rw))
    np.testing.assert_array_equal(np.asarray(dp), np.asarray(dw))


def _grids_same_coords(shape_small, shape_big, n=48):
    rng = np.random.RandomState(7)
    coords = np.stack(
        [
            np.zeros(n, np.int32),
            rng.randint(0, 30, n).astype(np.int32),
            rng.randint(0, 30, n).astype(np.int32),
            rng.randint(0, 30, n).astype(np.int32),
        ],
        1,
    )
    mask = np.ones(n, bool)
    mask[-5:] = False
    coords = np.where(mask[:, None], coords, -1)
    g_s = sparse.make_grid(jnp.asarray(coords), jnp.asarray(mask), shape_small)
    g_b = sparse.make_grid(jnp.asarray(coords), jnp.asarray(mask), shape_big)
    return g_s, g_b


def test_wide_regime_relations_match_packed_regime():
    # same active sites; the big grid's id space (1.1e9) exceeds the 2^30
    # pack cap, so its relations build on the wide sort — rows/indices must
    # be identical (batch coord 0 everywhere => same local geometry)
    small = (2, 41, 1600, 1408)     # 1.8e8 ids: packed regime
    big = (12, 41, 1600, 1408)      # 1.1e9 ids: wide regime
    assert int(np.prod(small, dtype=np.int64)) < sparse._PACK_CAP
    assert int(np.prod(big, dtype=np.int64)) >= sparse._PACK_CAP
    g_s, g_b = _grids_same_coords(small, big)

    k4, s4, p4 = (1, 3, 3, 3), (1, 1, 1, 1), (0, 1, 1, 1)
    xw_s = sparse.neighbor_xwin_info(g_s, g_s.coords, g_s.mask, k4, s4, p4)
    xw_b = sparse.neighbor_xwin_info(g_b, g_b.coords, g_b.mask, k4, s4, p4)
    np.testing.assert_array_equal(np.asarray(xw_s.rows), np.asarray(xw_b.rows))
    np.testing.assert_array_equal(np.asarray(xw_s.xvalid), np.asarray(xw_b.xvalid))

    idx_s = sparse.neighbor_index(g_s, g_s.coords, g_s.mask, k4, s4, p4)
    idx_b = sparse.neighbor_index(g_b, g_b.coords, g_b.mask, k4, s4, p4)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_b))


def test_wide_regime_lookup():
    small = (2, 41, 1600, 1408)
    big = (12, 41, 1600, 1408)
    g_s, g_b = _grids_same_coords(small, big)
    # hits: the grid's own ids; misses: ids + 1 (mostly absent)
    for g in (g_s, g_b):
        pos = sparse.lookup(g, g.flat_ids)
        n = g.flat_ids.shape[0]
        real = np.asarray(g.mask)
        np.testing.assert_array_equal(
            np.asarray(pos)[real], np.arange(n)[real]
        )
        assert (np.asarray(pos)[~real] == n).all()
