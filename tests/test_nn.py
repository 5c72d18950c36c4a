import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.nn import (
    Anchor3DHead,
    HardSimpleVFE,
    MaskedBatchNorm,
    SECONDBackbone,
    SECONDFPN,
    SparseEncoder,
    StrongVoxelPerturber,
    VoxelPerturber,
)
from robustpointclouds_tpu.ops import sparse
from robustpointclouds_tpu.ops.voxelize import VoxelizerConfig, voxelize_batch


def test_hard_simple_vfe_masked_mean():
    voxels = jnp.array([[[[1.0, 2.0], [3.0, 4.0], [0.0, 0.0]]]])  # [1,1,3,2]
    mask = jnp.array([[[True, True, False]]])
    out = np.asarray(HardSimpleVFE(voxels, mask))
    np.testing.assert_allclose(out[0, 0], [2.0, 3.0])


class TestMaskedBatchNorm:
    def test_train_stats_ignore_padding(self):
        x = jnp.array([[1.0], [3.0], [100.0]])
        mask = jnp.array([True, True, False])
        bn = MaskedBatchNorm()
        vars_ = bn.init(jax.random.PRNGKey(0), x, mask, True)
        y, new_vars = bn.apply(vars_, x, mask, True, mutable=["batch_stats"])
        y = np.asarray(y)
        # valid rows normalized to +-1 (mean 2, var 1)
        np.testing.assert_allclose(y[0, 0], -1.0, atol=1e-2)
        np.testing.assert_allclose(y[1, 0], 1.0, atol=1e-2)
        assert float(new_vars["batch_stats"]["mean"][0]) == pytest.approx(0.2, abs=1e-5)

    def test_eval_uses_running_stats(self):
        x = jnp.array([[5.0], [5.0]])
        mask = jnp.ones(2, bool)
        bn = MaskedBatchNorm()
        vars_ = bn.init(jax.random.PRNGKey(0), x, mask, True)
        y = bn.apply(vars_, x, mask, False)
        # running stats are (0, 1) at init -> y = (5-0)/sqrt(1+eps)
        np.testing.assert_allclose(np.asarray(y), 5.0 / np.sqrt(1 + 1e-3), atol=1e-4)


def _tiny_batched_grid(rng, B=2, V=64):
    # z: range 4m / 0.125 = 32 cells -> sparse D = 33 (survives 3 stride-2
    # stages + conv_out, like KITTI's 41); y/x: 16 cells
    cfg = VoxelizerConfig((0, -8, -2, 16, 8, 2), (1.0, 1.0, 0.125), 3, V)
    pts = np.concatenate(
        [rng.uniform([0, -8, -2], [16, 8, 2], (B, 200, 3)), rng.rand(B, 200, 1)], axis=2
    ).astype(np.float32)
    res = voxelize_batch(jnp.asarray(pts), jnp.ones((B, 200), bool), cfg)
    grid, order = sparse.with_batch_axis(res.coords, res.voxel_mask, cfg.sparse_shape)
    return res, grid, order, cfg


class TestSparseEncoder:
    def test_forward_shapes_and_masking(self):
        rng = np.random.RandomState(0)
        res, grid, order, cfg = _tiny_batched_grid(rng)
        feats = HardSimpleVFE(res.voxels, res.point_mask).reshape(-1, 4)[order]
        enc = SparseEncoder(
            sparse_shape=cfg.sparse_shape,
            encoder_channels=((8,), (16, 16), (16, 16), (16, 16)),
            base_channels=8,
            out_channels=16,
        )
        variables = enc.init(jax.random.PRNGKey(0), feats, grid, False)
        out = enc.apply(variables, feats, grid, False)
        D, H, W = cfg.sparse_shape  # (33, 16, 16)
        # z chain: 33 -> 17 -> 9 -> (pad0) 4 -> conv_out (4-3)//2+1 = 1
        assert out.shape == (2, H // 8, W // 8, 16 * 1)
        assert np.isfinite(np.asarray(out)).all()

    def test_train_mode_updates_batch_stats(self):
        rng = np.random.RandomState(1)
        res, grid, order, cfg = _tiny_batched_grid(rng)
        feats = HardSimpleVFE(res.voxels, res.point_mask).reshape(-1, 4)[order]
        enc = SparseEncoder(
            sparse_shape=cfg.sparse_shape,
            encoder_channels=((8,), (16, 16), (16, 16), (16, 16)),
            base_channels=8,
            out_channels=16,
        )
        variables = enc.init(jax.random.PRNGKey(0), feats, grid, True)
        _, mutated = enc.apply(variables, feats, grid, True, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))

    def test_gradients_flow(self):
        rng = np.random.RandomState(2)
        res, grid, order, cfg = _tiny_batched_grid(rng)
        feats = HardSimpleVFE(res.voxels, res.point_mask).reshape(-1, 4)[order]
        enc = SparseEncoder(
            sparse_shape=cfg.sparse_shape,
            encoder_channels=((8,), (16, 16), (16, 16), (16, 16)),
            base_channels=8,
            out_channels=16,
        )
        variables = enc.init(jax.random.PRNGKey(0), feats, grid, False)

        def loss(params, f):
            out = enc.apply({"params": params, "batch_stats": variables["batch_stats"]}, f, grid, False)
            return jnp.sum(out**2)

        g_params, g_feats = jax.grad(loss, argnums=(0, 1))(variables["params"], feats)
        gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(g_params))
        assert gnorm > 0
        assert float(jnp.sum(jnp.abs(g_feats))) > 0  # input grads exist (adversary path)


class TestBackboneNeckHead:
    def test_shapes(self):
        x = jnp.ones((2, 16, 16, 32))
        bb = SECONDBackbone(out_channels=(32, 64), layer_nums=(2, 2))
        v = bb.init(jax.random.PRNGKey(0), x, False)
        outs = bb.apply(v, x, False)
        assert outs[0].shape == (2, 16, 16, 32)
        assert outs[1].shape == (2, 8, 8, 64)

        fpn = SECONDFPN(out_channels=(64, 64))
        vf = fpn.init(jax.random.PRNGKey(0), outs, False)
        fused = fpn.apply(vf, outs, False)
        assert fused.shape == (2, 16, 16, 128)

        head = Anchor3DHead(num_classes=3, num_anchors_per_loc=6)
        vh = head.init(jax.random.PRNGKey(0), fused)
        cls, box, dirp = head.apply(vh, fused)
        assert cls.shape == (2, 16, 16, 6, 3)
        assert box.shape == (2, 16, 16, 6, 7)
        assert dirp.shape == (2, 16, 16, 6, 2)

    def test_focal_bias_init(self):
        head = Anchor3DHead()
        v = head.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 4, 32)))
        cls, _, _ = head.apply(v, jnp.zeros((1, 4, 4, 32)))
        p = jax.nn.sigmoid(np.asarray(cls))
        assert np.all(p < 0.02)  # ~0.01 initial foreground prob


class TestVoxelPerturber:
    def _run(self, train=True, attack=False, f=4):
        rng = np.random.RandomState(0)
        feats = jnp.asarray(rng.randn(128, f).astype(np.float32) * 5)
        mask = jnp.asarray(rng.rand(128) > 0.2)
        p = VoxelPerturber(num_features=f, hidden_channels=(8, 16, 32))
        v = p.init(jax.random.PRNGKey(0), feats, mask, train, attack)
        out, aux = p.apply(v, feats, mask, train, attack, mutable=["batch_stats"])[0]
        return feats, mask, out, aux

    def test_train_bounds(self):
        feats, mask, out, aux = self._run(train=True)
        delta = np.asarray(out - feats)
        # train profile: spatial clamp 0.2*0.9*1.2 = 0.216, intensity 0.1
        assert np.abs(delta[:, :3]).max() <= 0.216 + 1e-5
        assert np.abs(delta[:, 3]).max() <= 0.1 + 1e-5

    def test_attack_bounds_much_larger(self):
        feats, mask, out, aux = self._run(train=False, attack=True)
        delta = np.asarray(out - feats)
        # attack scale bound: 0.2*2.5*1.5667*2 = 1.567 (clamp is looser at 5)
        assert np.abs(delta[:, :3]).max() <= 1.567 + 1e-3
        assert np.abs(delta[:, 3]).max() <= 1.5 + 1e-3

    def test_padding_untouched(self):
        feats, mask, out, aux = self._run()
        delta = np.asarray(out - feats)
        assert np.abs(delta[~np.asarray(mask)]).max() == 0.0

    def test_nuscenes_timestamp_frozen(self):
        feats, mask, out, aux = self._run(f=5)
        delta = np.asarray(out - feats)
        assert np.abs(delta[:, 4]).max() == 0.0

    def test_loss_dict_keys_and_grads(self):
        rng = np.random.RandomState(0)
        feats = jnp.asarray(rng.randn(64, 4).astype(np.float32))
        mask = jnp.ones(64, bool)
        p = VoxelPerturber(num_features=4, hidden_channels=(8, 16, 32))
        v = p.init(jax.random.PRNGKey(0), feats, mask, True)

        def l2(params):
            (out, aux), _ = p.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                feats, mask, True, mutable=["batch_stats"],
            )
            return aux["l2_norm"]

        for k in ("l2_norm", "intensity_loss", "bias_loss", "imbalance_loss"):
            pass
        g = jax.grad(l2)(v["params"])
        gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
        assert gnorm > 0, "adversary params must receive gradients through l2"


class TestStrongPerturber:
    def test_forward_and_momentum(self):
        rng = np.random.RandomState(0)
        feats = jnp.asarray(rng.randn(64, 4).astype(np.float32))
        mask = jnp.ones(64, bool)
        p = StrongVoxelPerturber(num_features=4, hidden_channels=(16, 32))
        v = p.init(jax.random.PRNGKey(0), feats, mask, True)
        (pert, aux), _ = p.apply(v, feats, mask, True, 1.0, None, mutable=["batch_stats"])
        assert pert.shape == feats.shape
        (pert2, _), _ = p.apply(v, feats, mask, True, 1.0, pert, mutable=["batch_stats"])
        assert not np.allclose(np.asarray(pert), np.asarray(pert2))

    def test_dynamic_scale(self):
        from robustpointclouds_tpu.nn.perturber import strong_dynamic_scale

        assert strong_dynamic_scale(0, None, None) == pytest.approx(1.0)
        assert strong_dynamic_scale(10, None, None) == pytest.approx(2.0)
        assert strong_dynamic_scale(0, 0.05, None) == pytest.approx(2.0)
        assert strong_dynamic_scale(40, 0.05, 0.05) == pytest.approx(5.0)  # capped


def test_fpn_d2s_matches_conv_transpose():
    """The RPC_FPN_D2S deconv form (matmul + depth-to-space) must match
    nn.ConvTranspose with the SAME parameters to float roundoff."""
    import flax.linen as fnn

    from robustpointclouds_tpu.nn.second import _DeconvD2S

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 7, 8).astype(np.float32))
    ct = fnn.ConvTranspose(6, (2, 2), strides=(2, 2), use_bias=False)
    v = ct.init(jax.random.PRNGKey(0), x)
    ref = ct.apply(v, x)
    got = _DeconvD2S(6, 2).apply(v, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-6)
