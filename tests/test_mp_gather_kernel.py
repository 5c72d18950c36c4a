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
D, WLEN = 16, 48


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


def test_kernel_strided_forward_and_grads():
    """Strided mp forward must match the dense gather path; grads must match
    the scatter-backward autodiff reference (inverse-index d_feats)."""
    from robustpointclouds_tpu.ops.subm_conv import strided_conv

    rng = np.random.RandomState(7)
    in_grid = _random_grid(rng, shape=(1, 6, 8, 8), n_pad=64)
    k4, s4, p4 = (1, 3, 3, 3), (1, 2, 2, 2), (0, 1, 1, 1)
    out_grid, idx, inv = sparse.downsample_with_index(in_grid, k4, s4, p4,
                                                      out_cap=64)
    cin, cout = 8, 8
    feats = jnp.asarray(rng.randn(64, cin).astype(np.float32)).astype(jnp.bfloat16)
    feats = jnp.where(in_grid.mask[:, None], feats, 0)
    w = (jnp.asarray(rng.randn(27 * cin, cout).astype(np.float32)) * 0.2).astype(
        jnp.bfloat16)
    pack = mp_conv.strided_mp3_pack(in_grid, out_grid, k4, s4, p4, D=D, wlen=WLEN)

    ref = np.asarray(strided_conv(feats, w, idx), np.float32)
    out = np.asarray(
        mp_conv.mp3_strided_conv(3, D, WLEN, feats, w, pack, inv,
                                 interpret=True),
        np.float32,
    )
    m = np.asarray(out_grid.mask)
    np.testing.assert_allclose(out[m], ref[m], rtol=5e-2, atol=5e-2)
    assert np.all(out[~m] == 0)

    g_out = jnp.where(out_grid.mask[:, None],
                      jnp.asarray(rng.randn(64, cout).astype(np.float32)),
                      0.0).astype(jnp.bfloat16)

    def loss_mp(f, ww):
        o = mp_conv.mp3_strided_conv(3, D, WLEN, f, ww, pack, inv,
                                     interpret=True)
        return jnp.sum(o.astype(jnp.float32) * g_out.astype(jnp.float32))

    def loss_ref(f, ww):
        return jnp.sum(strided_conv(f, ww, idx).astype(jnp.float32)
                       * g_out.astype(jnp.float32))

    gf_m, gw_m = jax.grad(loss_mp, argnums=(0, 1))(feats, w)
    gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    mi = np.asarray(in_grid.mask)
    np.testing.assert_allclose(
        np.asarray(gf_m, np.float32)[mi], np.asarray(gf_r, np.float32)[mi],
        rtol=1e-1, atol=1e-1)
    np.testing.assert_allclose(
        np.asarray(gw_m, np.float32), np.asarray(gw_r, np.float32),
        rtol=1e-1, atol=1e-1)


def test_encoder_integrated_mp_path_matches_xla():
    """SparseEncoder(use_mp_kernel=True) in interpreter mode must match the
    XLA-gather encoder: same params (identical ktaps layout), same output.
    Covers the full wiring — per-grid packs, skipped forward indices on the
    downsamples, and the kx=1 conv_out geometry."""
    from robustpointclouds_tpu.nn import sparse_encoder as se

    rng = np.random.RandomState(11)
    shape = (2, 5, 8, 8)
    grid = _random_grid(rng, shape=shape, n_pad=96, n_active=70)
    feats = jnp.where(grid.mask[:, None],
                      jnp.asarray(rng.randn(96, 4).astype(np.float32)),
                      0.0)
    kw = dict(
        sparse_shape=(5, 8, 8), in_channels=4, base_channels=8,
        encoder_channels=((8,), (8, 8), (8, 8)),
        stage_cap_factors=(1.0, 1.0, 1.0), out_cap_factor=1.0,
        out_channels=8, dtype=jnp.bfloat16,
    )
    enc_ref = se.SparseEncoder(use_mp_kernel=False, **kw)
    enc_mp = se.SparseEncoder(use_mp_kernel=True, **kw)
    params = enc_ref.init(jax.random.PRNGKey(0), feats, grid, False)
    ref = enc_ref.apply(params, feats, grid, False)
    old = se.MP_INTERPRET
    se.MP_INTERPRET = True
    try:
        out = enc_mp.apply(params, feats, grid, False)
    finally:
        se.MP_INTERPRET = old
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_kernel_strided_conv_out_geometry():
    """conv_out geometry: kernel (1,3,1,1) stride (1,2,1,1) pad 0 — S=3
    lead groups with kx=1."""
    from robustpointclouds_tpu.ops.subm_conv import strided_conv

    rng = np.random.RandomState(8)
    in_grid = _random_grid(rng, shape=(1, 7, 5, 5), n_pad=48, n_active=35)
    k4, s4, p4 = (1, 3, 1, 1), (1, 2, 1, 1), (0, 0, 0, 0)
    out_grid, idx, inv = sparse.downsample_with_index(in_grid, k4, s4, p4,
                                                      out_cap=48)
    cin, cout = 8, 8
    feats = jnp.where(in_grid.mask[:, None],
                      jnp.asarray(rng.randn(48, cin).astype(np.float32)),
                      0.0).astype(jnp.bfloat16)
    w = (jnp.asarray(rng.randn(3 * cin, cout).astype(np.float32)) * 0.2).astype(
        jnp.bfloat16)
    pack = mp_conv.strided_mp3_pack(in_grid, out_grid, k4, s4, p4, D=D, wlen=WLEN)
    ref = np.asarray(strided_conv(feats, w, idx), np.float32)
    out = np.asarray(
        mp_conv.mp3_strided_conv(1, D, WLEN, feats, w, pack, inv,
                                 interpret=True),
        np.float32,
    )
    m = np.asarray(out_grid.mask)
    np.testing.assert_allclose(out[m], ref[m], rtol=5e-2, atol=5e-2)
