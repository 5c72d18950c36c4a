import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.ops import sparse


def grid_from(coords_list, shape, n_pad=None):
    n = len(coords_list) if n_pad is None else n_pad
    coords = np.full((n, 3), -1, np.int32)
    mask = np.zeros(n, bool)
    for i, c in enumerate(coords_list):
        coords[i] = c
        mask[i] = True
    return sparse.make_grid(jnp.asarray(coords), jnp.asarray(mask), shape)


class TestLookup:
    def test_hits_and_misses(self):
        g = grid_from([(0, 0, 0), (0, 1, 2), (1, 3, 3)], (2, 4, 4), n_pad=6)
        q = sparse.flatten_coords(
            jnp.array([[0, 1, 2], [1, 1, 1], [1, 3, 3]], jnp.int32),
            jnp.ones(3, bool),
            (2, 4, 4),
        )
        idx = np.asarray(sparse.lookup(g, q))
        n = 6
        assert idx[1] == n  # miss
        # hits return positions whose coords match
        got = np.asarray(g.coords)[idx[0]]
        assert got.tolist() == [0, 1, 2]


class TestSubmanifoldGather:
    def test_isolated_voxel_only_center_tap(self):
        g = grid_from([(1, 1, 1)], (3, 3, 3), n_pad=4)
        feats = jnp.zeros((4, 2)).at[0].set(jnp.array([1.0, 2.0]))
        offs = sparse.kernel_offsets((3, 3, 3))
        out = sparse.gather_neighbors(feats, g, g.coords, g.mask, offs)
        out = np.asarray(out)
        # center tap (offset (1,1,1) => index 13) sees the voxel itself
        assert out[0, 13].tolist() == [1.0, 2.0]
        assert np.abs(out[0]).sum() == pytest.approx(3.0)

    def test_neighbor_seen(self):
        g = grid_from([(1, 1, 1), (1, 1, 2)], (3, 3, 4), n_pad=4)
        feats = jnp.zeros((4, 1)).at[0].set(5.0).at[1].set(7.0)
        offs = sparse.kernel_offsets((3, 3, 3))
        out = np.asarray(sparse.gather_neighbors(feats, g, g.coords, g.mask, offs))
        # voxel 0 at (1,1,1): neighbor (1,1,2) = offset (+0,+0,+1) -> tap (1,1,2) idx 14
        assert out[0, 14, 0] == 7.0
        assert out[1, 12, 0] == 5.0  # voxel 1 sees voxel 0 at offset (1,1,0)

    def test_equivalent_to_dense_conv(self):
        # subm conv out == dense conv out at active sites, for random sparsity
        rng = np.random.RandomState(0)
        D, H, W, Cin, Cout = 4, 5, 6, 3, 2
        occ = rng.rand(D, H, W) > 0.6
        coords = np.argwhere(occ).astype(np.int32)
        n = len(coords)
        cap = n + 5
        g = grid_from([tuple(c) for c in coords], (D, H, W), n_pad=cap)
        dense_feat = rng.randn(D, H, W, Cin).astype(np.float32) * occ[..., None]
        feats = np.zeros((cap, Cin), np.float32)
        gc = np.asarray(g.coords)
        gm = np.asarray(g.mask)
        for i in range(cap):
            if gm[i]:
                feats[i] = dense_feat[tuple(gc[i])]
        offs = sparse.kernel_offsets((3, 3, 3))
        w = rng.randn(27, Cin, Cout).astype(np.float32)

        gathered = np.asarray(
            sparse.gather_neighbors(jnp.asarray(feats), g, g.coords, g.mask, offs)
        )  # [cap, 27, Cin]
        out = np.einsum("nkc,kcd->nd", gathered, w)

        # dense reference: correlation with zero padding
        padded = np.pad(dense_feat, ((1, 1), (1, 1), (1, 1), (0, 0)))
        for i in range(cap):
            if not gm[i]:
                continue
            z, y, x = gc[i]
            window = padded[z : z + 3, y : y + 3, x : x + 3].reshape(27, Cin)
            ref = np.einsum("kc,kcd->d", window, w)
            np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-4)


class TestSortUnique:
    def test_dedup_and_order(self):
        ids = jnp.array([5, 3, 5, sparse.INT32_MAX, 1, 3], jnp.int32)
        uniq, count = sparse.sort_unique(ids, 4)
        assert int(count) == 3
        assert np.asarray(uniq)[:3].tolist() == [1, 3, 5]
        assert np.asarray(uniq)[3] == sparse.INT32_MAX

    def test_cap(self):
        ids = jnp.arange(10, dtype=jnp.int32)
        uniq, count = sparse.sort_unique(ids, 4)
        assert int(count) == 4
        assert np.asarray(uniq).tolist() == [0, 1, 2, 3]


class TestDownsample:
    def test_stride2_sites(self):
        # single input at (2,2,2); k=3 s=2 p=1: output o covers [2o-1, 2o+1]
        # => per axis o in {1} U {ceil((2-1)/2)=1}? i=2: o with 2o-1<=2<=2o+1 -> o in {1}?
        # 2o-1<=2 -> o<=1.5; 2o+1>=2 -> o>=0.5 => o=1 only... but i=2 even: also
        # divisibility form: o=(i+p-k_off)/s for k_off in 0..2 -> (2+1-0)/2 no,
        # (2+1-1)/2=1, (2+1-2)/2 no -> o=1.
        g = grid_from([(2, 2, 2)], (5, 6, 6), n_pad=3)
        out = sparse.downsample_sites(g, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_cap=8)
        m = np.asarray(out.mask)
        c = np.asarray(out.coords)[m]
        assert c.shape[0] == 1
        assert c[0].tolist() == [1, 1, 1]

    def test_odd_input_two_outputs(self):
        # input at odd coord 1 per axis contributes to outputs 0 and 1 per axis
        g = grid_from([(1, 1, 1)], (5, 6, 6), n_pad=3)
        out = sparse.downsample_sites(g, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_cap=27)
        m = np.asarray(out.mask)
        c = np.asarray(out.coords)[m]
        assert c.shape[0] == 8  # {0,1}^3
        assert out.spatial_shape == (3, 3, 3)

    def test_anisotropic_conv_out(self):
        # SECOND's conv_out: kernel (3,1,1), stride (2,1,1), padding 0
        g = grid_from([(0, 2, 2), (2, 2, 2), (4, 2, 2)], (5, 6, 6), n_pad=5)
        out = sparse.downsample_sites(g, (3, 1, 1), (2, 1, 1), (0, 0, 0), out_cap=8)
        assert out.spatial_shape == (2, 6, 6)
        m = np.asarray(out.mask)
        c = np.asarray(out.coords)[m]
        # z inputs {0,2,4}: output z sites with window 2o..2o+2 covering them:
        # i=0 -> o=0 ; i=2 -> o in {0,1}; i=4 -> o=1 => {0,1}
        assert sorted(c[:, 0].tolist()) == [0, 1]


def test_scatter_to_dense():
    g = grid_from([(0, 1, 2), (1, 0, 0)], (2, 2, 3), n_pad=4)
    feats = jnp.zeros((4, 2)).at[0].set(jnp.array([1.0, 2.0])).at[1].set(jnp.array([3.0, 4.0]))
    dense = np.asarray(sparse.scatter_to_dense(feats, g))
    assert dense.shape == (2, 2, 3, 2)
    assert dense[0, 1, 2].tolist() == [1.0, 2.0]
    assert dense[1, 0, 0].tolist() == [3.0, 4.0]
    assert np.abs(dense).sum() == pytest.approx(10.0)


def test_int32_id_ceiling_fails_fast():
    """B * prod(sparse_shape) >= 2^31 must raise at trace/config time instead
    of silently corrupting merged flat ids (VERDICT r4 #7). B=24 at the KITTI
    41x1600x1408 grid is just past the ceiling; B=23 is the documented max."""
    import pytest

    kitti_shape = (41, 1600, 1408)
    coords = jnp.zeros((24, 4, 3), jnp.int32)
    mask = jnp.ones((24, 4), bool)
    with pytest.raises(ValueError, match="overflows int32"):
        sparse.with_batch_axis(coords, mask, kitti_shape)
    # one below the ceiling still traces
    grid, order = sparse.with_batch_axis(
        jnp.zeros((23, 4, 3), jnp.int32), jnp.ones((23, 4), bool), kitti_shape
    )
    assert grid.flat_ids.shape == (23 * 4,)
