"""Checkpoint-converter tests against a fabricated mmdet3d-style state dict."""
import numpy as np
import pytest

from robustpointclouds_tpu.tools import convert_torch_checkpoint as cvt


def fake_mmdet3d_second_state_dict():
    """Shapes follow mmdet3d second_hv_secfpn kitti-3d-3class."""
    rng = np.random.RandomState(0)
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) + 0.5

    def sp(prefix, cin, cout, k=(3, 3, 3)):
        # spconv2 layout (out, kz, ky, kx, in)
        sd[f"{prefix}.0.weight"] = rng.randn(cout, *k, cin).astype(np.float32)
        bn(f"{prefix}.1", cout)

    sp("middle_encoder.conv_input", 4, 16)
    sp("middle_encoder.encoder_layers.encoder_layer1.0", 16, 16)
    sp("middle_encoder.encoder_layers.encoder_layer2.0", 16, 32)
    sp("middle_encoder.encoder_layers.encoder_layer2.1", 32, 32)
    sp("middle_encoder.encoder_layers.encoder_layer2.2", 32, 32)
    sp("middle_encoder.encoder_layers.encoder_layer3.0", 32, 64)
    sp("middle_encoder.encoder_layers.encoder_layer3.1", 64, 64)
    sp("middle_encoder.encoder_layers.encoder_layer3.2", 64, 64)
    sp("middle_encoder.encoder_layers.encoder_layer4.0", 64, 64)
    sp("middle_encoder.encoder_layers.encoder_layer4.1", 64, 64)
    sp("middle_encoder.encoder_layers.encoder_layer4.2", 64, 64)
    sp("middle_encoder.conv_out", 64, 128, k=(3, 1, 1))

    # backbone: stage0 = conv(256->128) + 5 convs; stage1 = conv(128->256)+5
    for s, (cin, cout, n) in enumerate(((256, 128, 6), (128, 256, 6))):
        j = 0
        for ci in range(n):
            c_in = cin if ci == 0 else cout
            sd[f"backbone.blocks.{s}.{j}.weight"] = rng.randn(cout, c_in, 3, 3).astype(np.float32)
            j += 1
            bn(f"backbone.blocks.{s}.{j}", cout)
            j += 1
            j += 1  # relu placeholder (no params)

    # neck: deblock0 conv 1x1 128->256, deblock1 deconv 2x2 256->256
    sd["neck.deblocks.0.0.weight"] = rng.randn(256, 128, 1, 1).astype(np.float32)
    bn("neck.deblocks.0.1", 256)
    sd["neck.deblocks.1.0.weight"] = rng.randn(256, 256, 2, 2).astype(np.float32)
    bn("neck.deblocks.1.1", 256)

    # head
    sd["bbox_head.conv_cls.weight"] = rng.randn(18, 512, 1, 1).astype(np.float32)
    sd["bbox_head.conv_cls.bias"] = rng.randn(18).astype(np.float32)
    sd["bbox_head.conv_reg.weight"] = rng.randn(42, 512, 1, 1).astype(np.float32)
    sd["bbox_head.conv_reg.bias"] = rng.randn(42).astype(np.float32)
    sd["bbox_head.conv_dir_cls.weight"] = rng.randn(12, 512, 1, 1).astype(np.float32)
    sd["bbox_head.conv_dir_cls.bias"] = rng.randn(12).astype(np.float32)
    return sd


class TestKernelConversions:
    def test_sparse_conv_tap_order(self):
        # value at (out=o, z, y, x, in=i) must land at row ((z*9+y*3+x)*Cin + i)
        w = np.zeros((16, 3, 3, 3, 4), np.float32)
        w[1, 2, 0, 1, 3] = 7.0
        k = cvt.convert_sparse_conv_weight(w)
        assert k.shape == (27 * 4, 16)
        tap = 2 * 9 + 0 * 3 + 1
        assert k[tap * 4 + 3, 1] == 7.0

    def test_sparse_conv_spconv1_layout(self):
        # (kz, ky, kx, in, out): same value must land at the same row
        w = np.zeros((3, 3, 3, 4, 16), np.float32)
        w[2, 0, 1, 3, 1] = 7.0
        k = cvt.convert_sparse_conv_weight(w)
        assert k.shape == (27 * 4, 16)
        tap = 2 * 9 + 0 * 3 + 1
        assert k[tap * 4 + 3, 1] == 7.0

    def test_sparse_conv_ambiguous_layout_raises(self):
        # tiny channels on both ends: cannot disambiguate -> hard error, not
        # a silent mis-transpose (ADVICE round 1)
        with pytest.raises(ValueError):
            cvt.convert_sparse_conv_weight(np.zeros((2, 3, 3, 3, 2), np.float32))

    def test_merge_strict_prefix_raises_on_drop(self):
        model = {"middle_encoder": {"conv_input": {"kernel": np.zeros((108, 16))}}}
        bad = {"middle_encoder": {"conv_input": {"kernel": np.zeros((16, 108))}}}
        with pytest.raises(ValueError):
            cvt.merge_into_params(model, bad, strict_prefixes=("middle_encoder",))

    def test_conv2d(self):
        w = np.zeros((8, 4, 3, 3), np.float32)
        w[5, 2, 1, 0] = 3.0
        k = cvt.convert_conv2d(w)
        assert k.shape == (3, 3, 4, 8)
        assert k[1, 0, 2, 5] == 3.0

    def test_deconv_flip(self):
        w = np.zeros((4, 8, 2, 2), np.float32)
        w[1, 3, 0, 1] = 2.0
        k = cvt.convert_deconv2d(w)
        assert k.shape == (2, 2, 4, 8)
        assert k[1, 0, 1, 3] == 2.0  # spatially flipped


class TestFullConversion:
    def test_merge_into_model(self):
        import jax
        import jax.numpy as jnp

        from robustpointclouds_tpu.data import synthetic_kitti_batch
        from robustpointclouds_tpu.data.structures import PointCloudBatch
        from robustpointclouds_tpu.models import AdversarialVoxelNet, VoxelNetConfig
        from robustpointclouds_tpu.ops.voxelize import VoxelizerConfig

        sd = fake_mmdet3d_second_state_dict()
        params_c, stats_c = cvt.convert_second_state_dict(sd)

        # tiny grid, but REAL channel widths so shapes line up with the zoo ckpt
        cfg = VoxelNetConfig(
            voxelizer=VoxelizerConfig(
                point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
                voxel_size=(0.25, 0.25, 0.1), max_points_per_voxel=3, max_voxels=256,
            ),
            anchor_ranges=tuple((0, -8.0, -0.6, 16.0, 8.0, -0.6) for _ in range(3)),
            adversary=None,
        )
        model = AdversarialVoxelNet(cfg=cfg)
        b = synthetic_kitti_batch(
            np.random.RandomState(0), 1, 512, point_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
        )
        batch = PointCloudBatch(*(jnp.asarray(x) for x in b))
        variables = model.init(jax.random.PRNGKey(0), batch.points, batch.points_mask, False, 0)

        params_np = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
        stats_np = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))
        new_params, loaded, skipped = cvt.merge_into_params(params_np, params_c)
        new_stats, loaded_s, skipped_s = cvt.merge_into_params(stats_np, stats_c)

        # every converted tensor must land (the fabricated dict matches the arch)
        assert not skipped, skipped
        assert not skipped_s, skipped_s
        assert len(loaded) > 30

        # model must run with the converted weights
        outs = model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, new_params),
             "batch_stats": jax.tree_util.tree_map(jnp.asarray, new_stats)},
            batch.points, batch.points_mask, False, 0,
        )
        assert np.isfinite(np.asarray(outs.cls_scores)).all()

    def test_torch_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")
        sd = fake_mmdet3d_second_state_dict()
        path = tmp_path / "ckpt.pth"
        torch.save({"state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}}, path)
        loaded = cvt.load_torch_checkpoint(str(path))
        assert set(loaded) == set(sd)
        np.testing.assert_allclose(loaded["bbox_head.conv_cls.bias"], sd["bbox_head.conv_cls.bias"])
