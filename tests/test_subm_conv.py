"""The scatter-free subm-conv VJP must match autodiff exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from robustpointclouds_tpu.ops import sparse
from robustpointclouds_tpu.ops.subm_conv import subm_conv, strided_conv, strided_conv_t


def _random_grid(rng, shape=(1, 5, 6, 7), n_pad=64):
    total = int(np.prod(shape))
    n_active = min(40, total)
    flat = np.sort(rng.choice(total, n_active, replace=False))
    coords = np.stack(np.unravel_index(flat, shape), axis=1).astype(np.int32)
    coords_full = np.full((n_pad, 4), -1, np.int32)
    coords_full[:n_active] = coords
    mask = np.zeros(n_pad, bool)
    mask[:n_active] = True
    return sparse.make_grid(jnp.asarray(coords_full), jnp.asarray(mask), shape)


def test_custom_vjp_matches_autodiff():
    rng = np.random.RandomState(0)
    grid = _random_grid(rng)
    offs = sparse.kernel_offsets((1, 3, 3, 3))
    idx = sparse.neighbor_index(grid, grid.coords, grid.mask, offs,
                                (1, 1, 1, 1), (0, 1, 1, 1))
    cin, cout = 5, 3
    feats = jnp.asarray(rng.randn(64, cin).astype(np.float32))
    feats = jnp.where(grid.mask[:, None], feats, 0.0)
    w = jnp.asarray(rng.randn(27 * cin, cout).astype(np.float32))
    g_out = jnp.asarray(rng.randn(64, cout).astype(np.float32))
    g_out = jnp.where(grid.mask[:, None], g_out, 0.0)  # padding cotangent is 0

    def loss_custom(f, ww):
        return jnp.sum(subm_conv(f, ww, idx) * g_out)

    def loss_ref(f, ww):
        return jnp.sum(strided_conv(f, ww, idx) * g_out)  # autodiff path

    # forward identical
    np.testing.assert_allclose(
        np.asarray(subm_conv(feats, w, idx)),
        np.asarray(strided_conv(feats, w, idx)),
        rtol=1e-5, atol=1e-5,
    )
    gf_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(feats, w)
    gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    # padding-row gradients may differ (they are dead downstream); compare
    # valid rows for feats, everything for weights
    m = np.asarray(grid.mask)
    np.testing.assert_allclose(np.asarray(gf_c)[m], np.asarray(gf_r)[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)


def test_anisotropic_kernel_symmetry():
    # conv_input-style kernel over a grid with z extent 1 in kernel
    rng = np.random.RandomState(1)
    grid = _random_grid(rng, shape=(2, 4, 5, 5), n_pad=48)
    offs = sparse.kernel_offsets((1, 3, 3, 3))
    idx = sparse.neighbor_index(grid, grid.coords, grid.mask, offs,
                                (1, 1, 1, 1), (0, 1, 1, 1))
    feats = jnp.where(grid.mask[:, None],
                      jnp.asarray(rng.randn(48, 4).astype(np.float32)), 0.0)
    w = jnp.asarray(rng.randn(27 * 4, 6).astype(np.float32))
    g_out = jnp.where(grid.mask[:, None],
                      jnp.asarray(rng.randn(48, 6).astype(np.float32)), 0.0)
    gf_c = jax.grad(lambda f: jnp.sum(subm_conv(f, w, idx) * g_out))(feats)
    gf_r = jax.grad(lambda f: jnp.sum(strided_conv(f, w, idx) * g_out))(feats)
    m = np.asarray(grid.mask)
    np.testing.assert_allclose(np.asarray(gf_c)[m], np.asarray(gf_r)[m],
                               rtol=1e-4, atol=1e-5)


def test_strided_conv_t_matches_autodiff():
    """The inverse-index strided backward must equal the scatter backward."""
    rng = np.random.RandomState(2)
    in_grid = _random_grid(rng, shape=(1, 6, 8, 8), n_pad=64)
    k4, s4, p4 = (1, 3, 3, 3), (1, 2, 2, 2), (0, 1, 1, 1)
    offs = sparse.kernel_offsets(k4)
    out_grid = sparse.downsample_sites(in_grid, k4, s4, p4, out_cap=64)
    idx = sparse.neighbor_index(in_grid, out_grid.coords, out_grid.mask, offs, s4, p4)
    inv = sparse.inverse_neighbor_index(in_grid, out_grid, offs, s4, p4)

    cin, cout = 4, 6
    feats = jnp.where(in_grid.mask[:, None],
                      jnp.asarray(rng.randn(64, cin).astype(np.float32)), 0.0)
    w = jnp.asarray(rng.randn(27 * cin, cout).astype(np.float32))
    g_out = jnp.where(out_grid.mask[:, None],
                      jnp.asarray(rng.randn(64, cout).astype(np.float32)), 0.0)

    # forward identical
    np.testing.assert_allclose(
        np.asarray(strided_conv_t(feats, w, idx, inv)),
        np.asarray(strided_conv(feats, w, idx)),
        rtol=1e-5, atol=1e-5,
    )
    gf_t, gw_t = jax.grad(
        lambda f, ww: jnp.sum(strided_conv_t(f, ww, idx, inv) * g_out), argnums=(0, 1)
    )(feats, w)
    gf_r, gw_r = jax.grad(
        lambda f, ww: jnp.sum(strided_conv(f, ww, idx) * g_out), argnums=(0, 1)
    )(feats, w)
    m = np.asarray(in_grid.mask)
    np.testing.assert_allclose(np.asarray(gf_t)[m], np.asarray(gf_r)[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw_r), rtol=1e-4, atol=1e-5)


def test_strided_conv_t_anisotropic():
    rng = np.random.RandomState(3)
    in_grid = _random_grid(rng, shape=(1, 7, 5, 5), n_pad=48)
    k4, s4, p4 = (1, 3, 1, 1), (1, 2, 1, 1), (0, 0, 0, 0)
    offs = sparse.kernel_offsets(k4)
    out_grid = sparse.downsample_sites(in_grid, k4, s4, p4, out_cap=48)
    idx = sparse.neighbor_index(in_grid, out_grid.coords, out_grid.mask, offs, s4, p4)
    inv = sparse.inverse_neighbor_index(in_grid, out_grid, offs, s4, p4)
    feats = jnp.where(in_grid.mask[:, None],
                      jnp.asarray(rng.randn(48, 4).astype(np.float32)), 0.0)
    w = jnp.asarray(rng.randn(3 * 4, 8).astype(np.float32))
    g_out = jnp.where(out_grid.mask[:, None],
                      jnp.asarray(rng.randn(48, 8).astype(np.float32)), 0.0)
    gf_t = jax.grad(lambda f: jnp.sum(strided_conv_t(f, w, idx, inv) * g_out))(feats)
    gf_r = jax.grad(lambda f: jnp.sum(strided_conv(f, w, idx) * g_out))(feats)
    m = np.asarray(in_grid.mask)
    np.testing.assert_allclose(np.asarray(gf_t)[m], np.asarray(gf_r)[m],
                               rtol=1e-4, atol=1e-5)


def test_save_col_variant_matches_default(monkeypatch):
    """RPC_SAVE_COL=1 (forward col saved as the VJP residual instead of
    re-gathered in the backward) must be gradient-identical to the default
    for all three conv families."""
    import robustpointclouds_tpu.ops.subm_conv as sc

    rng = np.random.RandomState(7)
    grid = _random_grid(rng, shape=(1, 5, 6, 7), n_pad=64)
    offs = sparse.kernel_offsets((1, 3, 3, 3))
    idx = sparse.neighbor_index(grid, grid.coords, grid.mask, offs,
                                (1, 1, 1, 1), (0, 1, 1, 1))
    xw = sparse.neighbor_xwin_info(grid, grid.coords, grid.mask,
                                   (1, 3, 3, 3), (1, 1, 1, 1), (0, 1, 1, 1))
    k4, s4, p4 = (1, 3, 3, 3), (1, 2, 2, 2), (0, 1, 1, 1)
    out_grid = sparse.downsample_sites(grid, k4, s4, p4, out_cap=64)
    sidx = sparse.neighbor_index(grid, out_grid.coords, out_grid.mask,
                                 sparse.kernel_offsets(k4), s4, p4)
    sinv = sparse.inverse_neighbor_index(grid, out_grid, sparse.kernel_offsets(k4), s4, p4)

    cin, cout = 4, 6
    feats = jnp.where(grid.mask[:, None],
                      jnp.asarray(rng.randn(64, cin).astype(np.float32)), 0.0)
    w = jnp.asarray(rng.randn(27 * cin, cout).astype(np.float32))
    g_sub = jnp.where(grid.mask[:, None],
                      jnp.asarray(rng.randn(64, cout).astype(np.float32)), 0.0)
    g_str = jnp.where(out_grid.mask[:, None],
                      jnp.asarray(rng.randn(64, cout).astype(np.float32)), 0.0)

    losses = {
        "subm": lambda f, ww: jnp.sum(sc.subm_conv(f, ww, idx) * g_sub),
        "xwin": lambda f, ww: jnp.sum(
            sc.subm_conv_xwin(3, f, ww, grid.flat_ids, xw.rows, xw.xvalid) * g_sub
        ),
        "strided": lambda f, ww: jnp.sum(
            sc.strided_conv_t(f, ww, sidx, sinv) * g_str
        ),
    }
    for name, loss in losses.items():
        monkeypatch.setattr(sc, "SAVE_COL", False)
        ref = jax.grad(loss, argnums=(0, 1))(feats, w)
        monkeypatch.setattr(sc, "SAVE_COL", True)
        got = jax.grad(loss, argnums=(0, 1))(feats, w)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    monkeypatch.setattr(sc, "SAVE_COL", False)
