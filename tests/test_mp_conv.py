"""Merge-path one-hot subm conv must match the gather path exactly.

The one-hot matmul is selection (unique ids -> at most one nonzero per row),
so forwards agree bit-for-bit up to f32-accumulation association; gradients
must match the autodiff reference like the other custom-VJP convs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.ops import mp_conv, sparse
from robustpointclouds_tpu.ops.subm_conv import strided_conv, subm_conv

KER = (1, 3, 3, 3)
STR = (1, 1, 1, 1)
PAD = (0, 1, 1, 1)


def _random_grid(rng, shape=(1, 5, 6, 7), n_pad=64, n_active=40):
    total = int(np.prod(shape))
    n_active = min(n_active, total)
    flat = np.sort(rng.choice(total, n_active, replace=False))
    coords = np.stack(np.unravel_index(flat, shape), axis=1).astype(np.int32)
    coords_full = np.full((n_pad, 4), -1, np.int32)
    coords_full[:n_active] = coords
    mask = np.zeros(n_pad, bool)
    mask[:n_active] = True
    return sparse.make_grid(jnp.asarray(coords_full), jnp.asarray(mask), shape)


def _setup(rng, grid, cin, cout, dtype=jnp.float32):
    n = grid.flat_ids.shape[0]
    feats = jnp.asarray(rng.randn(n, cin).astype(np.float32)).astype(dtype)
    feats = jnp.where(grid.mask[:, None], feats, 0)
    w = jnp.asarray(rng.randn(27 * cin, cout).astype(np.float32)).astype(dtype)
    idx = sparse.neighbor_index(grid, grid.coords, grid.mask, KER, STR, PAD)
    return feats, w, idx


@pytest.mark.parametrize("D", [16, 256])
@pytest.mark.parametrize("shape", [(1, 5, 6, 7), (2, 4, 5, 5), (1, 1, 8, 9)])
def test_forward_matches_gather_path(D, shape):
    rng = np.random.RandomState(0)
    grid = _random_grid(rng, shape=shape)
    feats, w, idx = _setup(rng, grid, cin=5, cout=3)
    info = mp_conv.subm_mp_info(grid, KER, D=D)
    ref = subm_conv(feats, w, idx)
    out = mp_conv.mp_subm_conv(3, D, feats, w, info)
    m = np.asarray(grid.mask)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(ref)[m], rtol=1e-5, atol=1e-5
    )
    # padding rows must come out exactly zero (leadvalid masks every stream)
    assert np.all(np.asarray(out)[~m] == 0)


def test_forward_dense_occupancy():
    # every site active: maximal window pressure on the merge-path tiles
    rng = np.random.RandomState(1)
    shape = (1, 3, 6, 6)
    grid = _random_grid(rng, shape=shape, n_pad=128, n_active=108)
    feats, w, idx = _setup(rng, grid, cin=4, cout=6)
    info = mp_conv.subm_mp_info(grid, KER, D=32)
    ref = subm_conv(feats, w, idx)
    out = mp_conv.mp_subm_conv(3, 32, feats, w, info)
    m = np.asarray(grid.mask)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(ref)[m], rtol=1e-5, atol=1e-5
    )


def test_gather_is_exact_for_bf16():
    # selection semantics: bf16 payloads come through bit-for-bat via Cout=Cin
    # identity weights on the center tap only
    rng = np.random.RandomState(2)
    grid = _random_grid(rng)
    cin = 4
    feats = jnp.asarray(rng.randn(64, cin).astype(np.float32)).astype(jnp.bfloat16)
    feats = jnp.where(grid.mask[:, None], feats, 0)
    w = np.zeros((27 * cin, cin), np.float32)
    center = 13  # tap (0,1,1,1): own site
    w[center * cin : (center + 1) * cin] = np.eye(cin)
    w = jnp.asarray(w, jnp.bfloat16)
    info = mp_conv.subm_mp_info(grid, KER, D=16)
    out = mp_conv.mp_subm_conv(3, 16, feats, w, info)
    m = np.asarray(grid.mask)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32)[m], np.asarray(feats, np.float32)[m]
    )


@pytest.mark.parametrize("D", [16, 64])
def test_grads_match_autodiff(D):
    rng = np.random.RandomState(3)
    grid = _random_grid(rng, shape=(2, 4, 6, 5), n_pad=72, n_active=50)
    feats, w, idx = _setup(rng, grid, cin=5, cout=4)
    info = mp_conv.subm_mp_info(grid, KER, D=D)
    g_out = jnp.asarray(rng.randn(72, 4).astype(np.float32))
    g_out = jnp.where(grid.mask[:, None], g_out, 0.0)

    def loss_mp(f, ww):
        return jnp.sum(mp_conv.mp_subm_conv(3, D, f, ww, info) * g_out)

    def loss_ref(f, ww):
        return jnp.sum(strided_conv(f, ww, idx) * g_out)  # autodiff path

    gf_m, gw_m = jax.grad(loss_mp, argnums=(0, 1))(feats, w)
    gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    m = np.asarray(grid.mask)
    np.testing.assert_allclose(
        np.asarray(gf_m)[m], np.asarray(gf_r)[m], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gw_m), np.asarray(gw_r), rtol=1e-4, atol=1e-5
    )


def test_empty_grid():
    grid = sparse.make_grid(
        jnp.full((16, 4), -1, jnp.int32), jnp.zeros(16, bool), (1, 4, 4, 4)
    )
    feats = jnp.zeros((16, 4))
    w = jnp.ones((27 * 4, 2))
    info = mp_conv.subm_mp_info(grid, KER, D=8)
    out = mp_conv.mp_subm_conv(3, 8, feats, w, info)
    assert np.all(np.asarray(out) == 0)


def test_boundaries_cover_all_queries():
    rng = np.random.RandomState(4)
    grid = _random_grid(rng, shape=(1, 4, 9, 9), n_pad=96, n_active=70)
    info = mp_conv.subm_mp_info(grid, KER, D=16)
    q_offs = np.asarray(info.q_offs)
    n = 96
    assert q_offs.shape[0] == 9
    # monotone, starts at 0, ends consuming every query
    assert np.all(q_offs[:, 0] == 0)
    assert np.all(q_offs[:, -1] == n)
    assert np.all(np.diff(q_offs, axis=1) >= 0)
    # per-tile consumption bounded by D
    assert np.all(np.diff(q_offs, axis=1) <= 16)
