"""Windowed (grouped) neighbor index must equal the dense per-tap form."""
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.ops import sparse


def random_grid(rng, shape, n_pad):
    total = int(np.prod(shape))
    n_active = min(rng.randint(total // 4, max(total // 2, total // 4 + 2)), n_pad)
    flat = np.sort(rng.choice(total, n_active, replace=False))
    coords = np.stack(np.unravel_index(flat, shape), axis=1).astype(np.int32)
    full = np.full((n_pad, len(shape)), -1, np.int32)
    full[:n_active] = coords
    mask = np.zeros(n_pad, bool)
    mask[:n_active] = True
    return sparse.make_grid(jnp.asarray(full), jnp.asarray(mask), shape)


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("shape", [(1, 4, 6, 8), (2, 3, 5, 7), (1, 2, 2, 3)])
def test_windowed_equals_dense_subm(seed, shape):
    rng = np.random.RandomState(seed)
    g = random_grid(rng, shape, n_pad=64)
    k4, s4, p4 = (1, 3, 3, 3), (1, 1, 1, 1), (0, 1, 1, 1)
    dense = sparse._neighbor_index_dense(
        g, g.coords, g.mask, sparse.kernel_offsets(k4), s4, p4
    )
    windowed = sparse._neighbor_index_windowed(g, g.coords, g.mask, k4, s4, p4)
    np.testing.assert_array_equal(np.asarray(windowed), np.asarray(dense))


def test_dispatch_prefers_windowed_for_subm():
    rng = np.random.RandomState(0)
    g = random_grid(rng, (1, 4, 6, 8), n_pad=64)
    k4, s4, p4 = (1, 3, 3, 3), (1, 1, 1, 1), (0, 1, 1, 1)
    via_kernel = sparse.neighbor_index(g, g.coords, g.mask, k4, s4, p4)
    via_offsets = sparse.neighbor_index(
        g, g.coords, g.mask, sparse.kernel_offsets(k4), s4, p4
    )
    np.testing.assert_array_equal(np.asarray(via_kernel), np.asarray(via_offsets))


def test_strided_last_axis_falls_back():
    # stride 2 on the last axis: consecutive-tap structure broken -> dense
    rng = np.random.RandomState(1)
    g = random_grid(rng, (1, 4, 6, 8), n_pad=64)
    k4, s4, p4 = (1, 3, 3, 3), (1, 2, 2, 2), (0, 1, 1, 1)
    out_g = sparse.downsample_sites(g, k4, s4, p4, out_cap=64)
    via_kernel = sparse.neighbor_index(g, out_g.coords, out_g.mask, k4, s4, p4)
    dense = sparse._neighbor_index_dense(
        g, out_g.coords, out_g.mask, sparse.kernel_offsets(k4), s4, p4
    )
    np.testing.assert_array_equal(np.asarray(via_kernel), np.asarray(dense))


def test_border_alias_case():
    """Sites at x borders: out-of-range x taps alias neighboring rows in flat
    id space; positions must stay exact for the in-range taps."""
    shape = (1, 2, 3, 4)
    # activate an entire y-row pair including x borders
    coords = [(0, 0, y, x) for y in range(3) for x in range(4)]
    full = np.full((16, 4), -1, np.int32)
    mask = np.zeros(16, bool)
    for i, c in enumerate(coords):
        full[i] = c
        mask[i] = True
    g = sparse.make_grid(jnp.asarray(full), jnp.asarray(mask), shape)
    k4, s4, p4 = (1, 3, 3, 3), (1, 1, 1, 1), (0, 1, 1, 1)
    dense = sparse._neighbor_index_dense(
        g, g.coords, g.mask, sparse.kernel_offsets(k4), s4, p4
    )
    windowed = sparse._neighbor_index_windowed(g, g.coords, g.mask, k4, s4, p4)
    np.testing.assert_array_equal(np.asarray(windowed), np.asarray(dense))
