"""Pallas merge-path gather-conv kernel vs the reference paths (interpret).

Runs the kernel in Pallas interpreter mode on CPU: forward must equal the
dense-index subm conv (bf16 tolerance; exact for pure-selection weights),
gradients must match the XLA merge-path VJP (itself pinned to autodiff by
test_mp_conv.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.ops import mp_conv, sparse
from robustpointclouds_tpu.ops.subm_conv import subm_conv

KER = (1, 3, 3, 3)
D, WLEN = 16, 32


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


def _setup(rng, grid, cin, cout):
    n = grid.flat_ids.shape[0]
    feats = jnp.asarray(rng.randn(n, cin).astype(np.float32)).astype(jnp.bfloat16)
    feats = jnp.where(grid.mask[:, None], feats, 0)
    w = (jnp.asarray(rng.randn(27 * cin, cout).astype(np.float32)) * 0.2).astype(
        jnp.bfloat16
    )
    idx = sparse.neighbor_index(
        grid, grid.coords, grid.mask, KER, (1, 1, 1, 1), (0, 1, 1, 1)
    )
    return feats, w, idx


@pytest.mark.parametrize("shape", [(1, 5, 6, 7), (2, 4, 5, 5)])
def test_kernel_forward_matches_dense(shape):
    rng = np.random.RandomState(0)
    grid = _random_grid(rng, shape=shape)
    feats, w, idx = _setup(rng, grid, cin=8, cout=8)
    pack = mp_conv.subm_mp3_pack(grid, KER, D=D, wlen=WLEN)
    ref = np.asarray(subm_conv(feats, w, idx), np.float32)
    out = np.asarray(
        mp_conv.mp3_subm_conv(3, D, WLEN, feats, w, pack, interpret=True),
        np.float32,
    )
    m = np.asarray(grid.mask)
    np.testing.assert_allclose(out[m], ref[m], rtol=5e-2, atol=5e-2)
    assert np.all(out[~m] == 0)


def test_kernel_gather_exact_selection():
    # identity weights on the center tap: pure selection, exact in bf16
    rng = np.random.RandomState(1)
    grid = _random_grid(rng)
    cin = 8
    n = 64
    feats = jnp.asarray(rng.randn(n, cin).astype(np.float32)).astype(jnp.bfloat16)
    feats = jnp.where(grid.mask[:, None], feats, 0)
    w = np.zeros((27 * cin, cin), np.float32)
    center = 13
    w[center * cin: (center + 1) * cin] = np.eye(cin)
    w = jnp.asarray(w, jnp.bfloat16)
    pack = mp_conv.subm_mp3_pack(grid, KER, D=D, wlen=WLEN)
    out = mp_conv.mp3_subm_conv(3, D, WLEN, feats, w, pack, interpret=True)
    m = np.asarray(grid.mask)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32)[m], np.asarray(feats, np.float32)[m]
    )


def test_kernel_grads_match_xla_mp():
    rng = np.random.RandomState(2)
    grid = _random_grid(rng, shape=(2, 4, 5, 5), n_pad=72, n_active=50)
    feats, w, idx = _setup(rng, grid, cin=8, cout=4)
    pack = mp_conv.subm_mp3_pack(grid, KER, D=D, wlen=WLEN)
    info = mp_conv.subm_mp_info(grid, KER, D=D)
    g_out = jnp.asarray(rng.randn(72, 4).astype(np.float32)).astype(jnp.bfloat16)
    g_out = jnp.where(grid.mask[:, None], g_out, 0)

    def loss_kern(f, ww):
        o = mp_conv.mp3_subm_conv(3, D, WLEN, f, ww, pack, interpret=True)
        return jnp.sum(o.astype(jnp.float32) * g_out.astype(jnp.float32))

    def loss_ref(f, ww):
        o = mp_conv.mp_subm_conv(3, D, f, ww, info)
        return jnp.sum(o.astype(jnp.float32) * g_out.astype(jnp.float32))

    gf_k, gw_k = jax.grad(loss_kern, argnums=(0, 1))(feats, w)
    gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    m = np.asarray(grid.mask)
    np.testing.assert_allclose(
        np.asarray(gf_k, np.float32)[m], np.asarray(gf_r, np.float32)[m],
        rtol=1e-1, atol=1e-1,
    )
    np.testing.assert_allclose(
        np.asarray(gw_k, np.float32), np.asarray(gw_r, np.float32),
        rtol=1e-1, atol=1e-1,
    )
