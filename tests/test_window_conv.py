"""Windowed wide-row gather conv vs the dense-index reference path.

The windowed form (ops/sparse.neighbor_window_info +
ops/subm_conv.subm_conv_windowed) must reproduce the dense [N, K] neighbor
index semantics exactly — same forward, same gradients — while gathering
G·N wide rows instead of K·N narrow ones.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.ops import sparse
from robustpointclouds_tpu.ops import subm_conv as sc


def random_grid(rng, shape=(2, 6, 10, 12), n=160, cap=192):
    """Random active sites (unique), padded to cap."""
    total = int(np.prod(shape))
    ids = rng.choice(total, size=n, replace=False)
    coords = np.stack(np.unravel_index(ids, shape), axis=1).astype(np.int32)
    coords = np.concatenate([coords, np.zeros((cap - n, 4), np.int32)], 0)
    mask = np.arange(cap) < n
    return sparse.make_grid(jnp.asarray(coords), jnp.asarray(mask), shape)


KSP = [
    ((1, 3, 3, 3), (1, 1, 1, 1), (0, 1, 1, 1)),  # submanifold
    ((1, 3, 3, 3), (1, 2, 2, 2), (0, 1, 1, 1)),  # strided downsample
    ((1, 3, 1, 1), (1, 2, 1, 1), (0, 0, 0, 0)),  # conv_out geometry (kx=1 -> dense)
]


@pytest.mark.parametrize("k,s,p", KSP[:2])
def test_window_info_matches_dense_index(k, s, p):
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
    win = sparse.neighbor_window_info(g, out_coords, out_mask, k, s, p)
    expanded = sparse.window_info_to_index(win)
    np.testing.assert_array_equal(np.asarray(expanded), np.asarray(dense))


def test_subm_conv_windowed_matches_dense():
    rng = np.random.RandomState(1)
    g = random_grid(rng)
    k, s, p = KSP[0]
    idx = sparse.neighbor_index(g, g.coords, g.mask, sparse.kernel_offsets(k), s, p)
    win = sparse.neighbor_window_info(g, g.coords, g.mask, k, s, p)

    n, cin, cout = g.mask.shape[0], 8, 16
    feats = jnp.asarray(rng.randn(n, cin).astype(np.float32))
    feats = jnp.where(g.mask[:, None], feats, 0.0)
    kernel = jnp.asarray(rng.randn(27 * cin, cout).astype(np.float32) * 0.1)

    ref = sc.subm_conv(feats, kernel, idx)
    out = sc.subm_conv_windowed(win.kx, feats, kernel, win.p, win.delta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    # gradients (feats + kernel) match the dense custom-VJP path
    def loss_ref(f, w):
        o = sc.subm_conv(f, w, idx)
        return jnp.sum(jnp.sin(o) * jnp.arange(cout))

    def loss_win(f, w):
        o = sc.subm_conv_windowed(win.kx, f, w, win.p, win.delta)
        return jnp.sum(jnp.sin(o) * jnp.arange(cout))

    gr = jax.grad(loss_ref, argnums=(0, 1))(feats, kernel)
    gw = jax.grad(loss_win, argnums=(0, 1))(feats, kernel)
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-4)


def test_strided_conv_windowed_matches_dense():
    rng = np.random.RandomState(2)
    g = random_grid(rng)
    k, s, p = KSP[1]
    og = sparse.downsample_sites(g, k, s, p, out_cap=192)
    idx = sparse.neighbor_index(g, og.coords, og.mask, sparse.kernel_offsets(k), s, p)
    win = sparse.neighbor_window_info(g, og.coords, og.mask, k, s, p)
    inv = sparse.inverse_from_forward(idx, g.mask.shape[0])

    n, cin, cout = g.mask.shape[0], 8, 16
    feats = jnp.where(
        g.mask[:, None], jnp.asarray(rng.randn(n, cin).astype(np.float32)), 0.0
    )
    kernel = jnp.asarray(rng.randn(27 * cin, cout).astype(np.float32) * 0.1)

    ref = sc.strided_conv(feats, kernel, idx)
    kx_arr = jnp.zeros((win.kx,), jnp.int32)
    out = sc.strided_conv_windowed(feats, kernel, win.p, win.delta, kx_arr, inv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def loss_ref(f, w):
        return jnp.sum(jnp.cos(sc.strided_conv(f, w, idx)))

    def loss_win(f, w):
        return jnp.sum(
            jnp.cos(sc.strided_conv_windowed(f, w, win.p, win.delta, kx_arr, inv))
        )

    gr = jax.grad(loss_ref, argnums=(0, 1))(feats, kernel)
    gw = jax.grad(loss_win, argnums=(0, 1))(feats, kernel)
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-4)


def test_inverse_from_forward_matches_sorted():
    rng = np.random.RandomState(3)
    g = random_grid(rng)
    k, s, p = KSP[1]
    og = sparse.downsample_sites(g, k, s, p, out_cap=192)
    offs = sparse.kernel_offsets(k)
    idx = sparse.neighbor_index(g, og.coords, og.mask, offs, s, p)
    inv_sorted = sparse.inverse_neighbor_index(g, og, offs, s, p)
    inv_scatter = sparse.inverse_from_forward(idx, g.mask.shape[0])
    np.testing.assert_array_equal(np.asarray(inv_scatter), np.asarray(inv_sorted))
