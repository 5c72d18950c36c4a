"""Checkpoint-converter tests against a fabricated mmdet3d-style state dict."""
import numpy as np
import pytest

from robustpointclouds_tpu.tools import convert_torch_checkpoint as cvt


def fake_mmdet3d_second_state_dict():
    """EXACT key/shape layout of the mmdet3d second_hv_secfpn kitti-3d-3class
    zoo checkpoint (VERDICT r4 #6): spconv2 sparse kernels, BN with
    num_batches_tracked, and — the subtle one — neck.deblocks.0.0 as a
    ConvTranspose2d(128, 256, k=1, s=1) with weight (in, out, 1, 1): mmdet3d
    SECONDFPN builds a transposed conv even at stride 1 under the default
    use_conv_for_no_stride=False."""
    rng = np.random.RandomState(0)
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(1000, np.int64)

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

    # neck: deblock0 ConvTranspose2d(128,256,k=1,s=1) — weight (IN, OUT, 1, 1)
    # — deblock1 ConvTranspose2d(256,256,k=2,s=2)
    sd["neck.deblocks.0.0.weight"] = rng.randn(128, 256, 1, 1).astype(np.float32)
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

    def test_stride1_deblock_transpose_orientation(self):
        """The real zoo deblocks.0.0 is a 1x1 ConvTranspose2d (in, out, 1, 1):
        math says conv_transpose(x, w)[...,o] = sum_i x[...,i] * w[i,o,0,0],
        so the flax Conv kernel must be w transposed to (1,1,in,out) — the
        pre-fix converter produced (1,1,out,in) and the weights were silently
        dropped on shape mismatch (random-init deblock0 in every warm start)."""
        sd = fake_mmdet3d_second_state_dict()
        params_c, _ = cvt.convert_second_state_dict(sd)
        k = params_c["neck"]["deblock0_conv"]["kernel"]
        w = sd["neck.deblocks.0.0.weight"]
        assert k.shape == (1, 1, 128, 256)
        np.testing.assert_array_equal(k[0, 0], w[:, :, 0, 0])
        # reference semantics: y = x @ w[:, :, 0, 0] for a 1x1 stride-1
        # transposed conv; the flax conv with kernel k computes x @ k[0, 0]
        x = np.random.RandomState(1).randn(3, 128).astype(np.float32)
        np.testing.assert_allclose(x @ w[:, :, 0, 0], x @ k[0, 0])

    def test_torch_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")
        sd = fake_mmdet3d_second_state_dict()
        path = tmp_path / "ckpt.pth"
        torch.save({"state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}}, path)
        loaded = cvt.load_torch_checkpoint(str(path))
        assert set(loaded) == set(sd)
        np.testing.assert_allclose(loaded["bbox_head.conv_cls.bias"], sd["bbox_head.conv_cls.bias"])


def fake_mmdet3d_centerpoint_head_state_dict(n_tasks=6):
    """EXACT key/shape layout of the zoo
    centerpoint_01voxel_second_secfpn_dcn_circlenms pts_bbox_head: shared
    ConvModule (512->64), then per task a DCNSeparateHead — DeformConv2dPack
    feature_adapt_{cls,reg} (grouped weight [64, 16, 3, 3] for groups=4 +
    zero-init conv_offset [18, 64, 3, 3]), cls_head (ConvModule + final
    heatmap conv), task_head.{reg,height,dim,rot,vel} SeparateHead stacks."""
    from robustpointclouds_tpu.nn.center_head import NUSCENES_TASKS

    rng = np.random.RandomState(7)
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32) * 0.01
        sd[f"{prefix}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) * 0.01 + 1.0
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(1000, np.int64)

    sd["pts_bbox_head.shared_conv.conv.weight"] = rng.randn(64, 512, 3, 3).astype(np.float32) * 0.02
    bn("pts_bbox_head.shared_conv.bn", 64)
    for t in range(n_tasks):
        ncls = len(NUSCENES_TASKS[t])
        base = f"pts_bbox_head.task_heads.{t}"
        for branch in ("cls", "reg"):
            # DeformConv2dPack: grouped weight + offset conv (zero-init in
            # fresh models, non-zero after training — use non-zero here)
            sd[f"{base}.feature_adapt_{branch}.weight"] = (
                rng.randn(64, 16, 3, 3).astype(np.float32) * 0.05
            )
            sd[f"{base}.feature_adapt_{branch}.conv_offset.weight"] = (
                rng.randn(18, 64, 3, 3).astype(np.float32) * 0.01
            )
            sd[f"{base}.feature_adapt_{branch}.conv_offset.bias"] = (
                rng.randn(18).astype(np.float32) * 0.01
            )
        sd[f"{base}.cls_head.0.conv.weight"] = rng.randn(64, 64, 3, 3).astype(np.float32) * 0.05
        bn(f"{base}.cls_head.0.bn", 64)
        sd[f"{base}.cls_head.1.weight"] = rng.randn(ncls, 64, 3, 3).astype(np.float32) * 0.05
        sd[f"{base}.cls_head.1.bias"] = np.full(ncls, -2.19, np.float32)
        for name, dim in (("reg", 2), ("height", 1), ("dim", 3), ("rot", 2), ("vel", 2)):
            sd[f"{base}.task_head.{name}.0.conv.weight"] = (
                rng.randn(64, 64, 3, 3).astype(np.float32) * 0.05
            )
            bn(f"{base}.task_head.{name}.0.bn", 64)
            sd[f"{base}.task_head.{name}.1.weight"] = (
                rng.randn(dim, 64, 3, 3).astype(np.float32) * 0.05
            )
            sd[f"{base}.task_head.{name}.1.bias"] = rng.randn(dim).astype(np.float32) * 0.01
    return sd


class TestCenterPointHeadConversion:
    def test_dcn_head_roundtrip_forward(self):
        """init -> convert -> merge (every tensor lands) -> forward: the zoo
        DCN CenterHead layout loads into CenterHead(use_dcn=True) with no
        silent skips (VERDICT r4 #6 done criterion)."""
        import jax
        import jax.numpy as jnp

        from robustpointclouds_tpu.nn.center_head import CenterHead, NUSCENES_TASKS

        sd = fake_mmdet3d_centerpoint_head_state_dict()
        params_c, stats_c = cvt.convert_centerpoint_state_dict(sd)
        assert set(params_c) == {"pts_bbox_head"}

        head = CenterHead(tasks=NUSCENES_TASKS, use_dcn=True)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 512), jnp.float32)
        variables = head.init(jax.random.PRNGKey(0), x, False)
        params_np = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
        stats_np = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))

        new_params, loaded, skipped = cvt.merge_into_params(
            params_np, params_c["pts_bbox_head"],
            strict_prefixes=("shared_conv", "task"),
        )
        new_stats, loaded_s, skipped_s = cvt.merge_into_params(
            stats_np, stats_c["pts_bbox_head"]
        )
        assert not skipped, skipped
        # the only unconverted stats are the _DCNAdapt BNs (identity at init;
        # mmdet3d's feature_adapt has no BN) — everything else lands
        assert len(loaded) > 100
        assert all("adapt" in s for s in skipped_s), skipped_s

        outs = head.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, new_params),
             "batch_stats": jax.tree_util.tree_map(jnp.asarray, new_stats)},
            x, False,
        )
        assert len(outs) == 6
        for t, task in enumerate(outs):
            assert task["heatmap"].shape[-1] == len(NUSCENES_TASKS[t])
            for k in ("reg", "height", "dim", "rot", "vel"):
                assert np.isfinite(np.asarray(task[k])).all()

    def test_second_backbone_neck_ride_pts_prefix(self):
        """pts_backbone/pts_neck keys reuse the SECOND converter."""
        sd = {
            f"pts_{k}": v for k, v in fake_mmdet3d_second_state_dict().items()
            if k.startswith(("backbone.", "neck."))
        }
        params_c, stats_c = cvt.convert_centerpoint_state_dict(sd)
        assert "pts_backbone" in params_c and "pts_neck" in params_c
        assert params_c["pts_neck"]["deblock0_conv"]["kernel"].shape == (1, 1, 128, 256)


def fake_mmdet3d_centerpoint_encoder_state_dict():
    """EXACT pts_middle_encoder layout of the zoo CenterPoint: the
    block_type='basicblock' SparseEncoder — residual SparseBasicBlocks
    (conv1/bn1/conv2/bn2) with the strided downsample as each stage's LAST
    element and none on the final stage; channels
    (16,16,32)/(32,32,64)/(64,64,128)/(128,128), in_channels=5."""
    rng = np.random.RandomState(11)
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32) * 0.01
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32) * 0.01
        sd[f"{prefix}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) * 0.01 + 1.0
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(1000, np.int64)

    def basic(prefix, c):
        sd[f"{prefix}.conv1.weight"] = rng.randn(c, 3, 3, 3, c).astype(np.float32) * 0.02
        bn(f"{prefix}.bn1", c)
        sd[f"{prefix}.conv2.weight"] = rng.randn(c, 3, 3, 3, c).astype(np.float32) * 0.02
        bn(f"{prefix}.bn2", c)

    def down(prefix, cin, cout, k=(3, 3, 3)):
        sd[f"{prefix}.0.weight"] = rng.randn(cout, *k, cin).astype(np.float32) * 0.02
        bn(f"{prefix}.1", cout)

    pme = "pts_middle_encoder"
    down(f"{pme}.conv_input", 5, 16)
    chans = ((16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    for s, stage in enumerate(chans):
        layer = f"{pme}.encoder_layers.encoder_layer{s + 1}"
        last = s == len(chans) - 1
        n_res = len(stage) if last else len(stage) - 1
        for j in range(n_res):
            basic(f"{layer}.{j}", stage[j])
        if not last:
            down(f"{layer}.{n_res}", stage[0], stage[-1])
    down(f"{pme}.conv_out", 128, 128, k=(3, 1, 1))
    return sd


def test_centerpoint_encoder_conversion_shapes():
    """Default-tier shape check: every zoo encoder tensor converts to the
    residual SparseEncoder's param names/shapes (stage{s}_res{j}/conv1 ...,
    stage{s}_down, conv_input/conv_out)."""
    sd = fake_mmdet3d_centerpoint_encoder_state_dict()
    params_c, stats_c = cvt.convert_centerpoint_state_dict(sd)
    enc = params_c["pts_middle_encoder"]
    assert enc["conv_input"]["kernel"].shape == (27 * 5, 16)
    assert enc["stage0_res0"]["conv1"]["kernel"].shape == (27 * 16, 16)
    assert enc["stage0_res1"]["conv2"]["kernel"].shape == (27 * 16, 16)
    assert enc["stage0_down"]["kernel"].shape == (27 * 16, 32)
    assert enc["stage1_down"]["kernel"].shape == (27 * 32, 64)
    assert enc["stage2_down"]["kernel"].shape == (27 * 64, 128)
    assert enc["stage3_res1"]["conv1"]["kernel"].shape == (27 * 128, 128)
    assert "stage3_down" not in enc
    assert enc["conv_out"]["kernel"].shape == (3 * 128, 128)
    st = stats_c["pts_middle_encoder"]
    assert st["stage0_res0"]["bn1"]["mean"].shape == (16,)
    assert st["stage2_down"]["MaskedBatchNorm_0"]["var"].shape == (128,)


@pytest.mark.heavy
def test_full_centerpoint_zoo_roundtrip_forward():
    """Heavy tier, VERDICT r4 #6 done criterion for the CenterPoint family:
    a full zoo-layout state dict (basicblock encoder + SECOND backbone +
    SECFPN neck + DCN head) converts, merges into AdversarialCenterPoint
    with strict prefixes (no silent drops), and forwards finite."""
    import jax
    import jax.numpy as jnp

    from robustpointclouds_tpu.models.centerpoint import (
        AdversarialCenterPoint, CenterPointConfig,
    )
    from robustpointclouds_tpu.models.center_detection import CenterHeadConfig
    from robustpointclouds_tpu.nn.center_head import NUSCENES_TASKS
    from robustpointclouds_tpu.ops.voxelize import VoxelizerConfig

    sd = fake_mmdet3d_centerpoint_encoder_state_dict()
    sd.update({
        f"pts_{k}": v for k, v in fake_mmdet3d_second_state_dict().items()
        if k.startswith(("backbone.", "neck."))
    })
    sd.update(fake_mmdet3d_centerpoint_head_state_dict())
    params_c, stats_c = cvt.convert_centerpoint_state_dict(sd)

    # tiny x/y grid, REAL z plan: 41 z planes (8.2 m / 0.2 m) fold to
    # 2 * 128 = 256 BEV channels after the encoder's 4 z-halvings, matching
    # the zoo backbone's in_channels=256
    cfg = CenterPointConfig(
        voxelizer=VoxelizerConfig(
            point_cloud_range=(-6.4, -6.4, -5.0, 6.4, 6.4, 3.2),
            voxel_size=(0.1, 0.1, 0.2),
            max_points_per_voxel=3,
            max_voxels=512,
        ),
        head=CenterHeadConfig(
            tasks=NUSCENES_TASKS,
            point_cloud_range=(-6.4, -6.4, -5.0, 6.4, 6.4, 3.2),
            voxel_size=(0.1, 0.1),
            max_objs=16,
            nms_pre=64,
        ),
        adversary=None,
        use_dcn_head=True,
    )
    model = AdversarialCenterPoint(cfg=cfg)
    rng = np.random.RandomState(0)
    pts = np.concatenate([
        rng.uniform([-6, -6, -4.5], [6, 6, 3.0], (1, 256, 3)),
        rng.rand(1, 256, 2),
    ], -1).astype(np.float32)
    points = jnp.asarray(pts)
    mask = jnp.ones((1, 256), bool)
    variables = model.init(jax.random.PRNGKey(0), points, mask, False, 0)

    params_np = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats_np = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))
    new_params, loaded, skipped = cvt.merge_into_params(
        params_np, params_c,
        strict_prefixes=("pts_middle_encoder", "pts_backbone", "pts_neck",
                         "pts_bbox_head"),
    )
    new_stats, loaded_s, skipped_s = cvt.merge_into_params(stats_np, stats_c)
    assert not skipped, skipped
    assert all("adapt" in s for s in skipped_s), skipped_s
    assert len(loaded) > 150

    outs = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, new_params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, new_stats)},
        points, mask, False, 0,
    )
    for task in outs.task_preds:
        assert np.isfinite(np.asarray(task["heatmap"])).all()
        assert np.isfinite(np.asarray(task["reg"])).all()


def fake_mmdet3d_pointpillars_state_dict():
    """EXACT key/shape layout of the mmdet3d
    pointpillars_hv_secfpn_8xb6-160e_kitti-3d-3class zoo checkpoint:
    PillarFeatureNet with ONE PFNLayer (bias-free Linear 9->64 + BatchNorm1d),
    SECOND backbone (64,128,256) x (1+3, 1+5, 1+5) convs at strides (2,2,2),
    SECFPN neck with ConvTranspose2d deblocks at strides (1,2,4) (k == stride;
    transposed even at stride 1 under the default use_conv_for_no_stride),
    Anchor3DHead 1x1 convs on the 384ch concat (6 anchors/loc, 3 classes)."""
    rng = np.random.RandomState(3)
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32) * 0.01
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32) * 0.01
        sd[f"{prefix}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) * 0.01 + 1.0
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(1000, np.int64)

    sd["voxel_encoder.pfn_layers.0.linear.weight"] = (
        rng.randn(64, 9).astype(np.float32) * 0.05
    )
    bn("voxel_encoder.pfn_layers.0.norm", 64)

    for s, (cin, cout, n) in enumerate(((64, 64, 4), (64, 128, 6), (128, 256, 6))):
        j = 0
        for ci in range(n):
            c_in = cin if ci == 0 else cout
            sd[f"backbone.blocks.{s}.{j}.weight"] = (
                rng.randn(cout, c_in, 3, 3).astype(np.float32) * 0.05
            )
            j += 1
            bn(f"backbone.blocks.{s}.{j}", cout)
            j += 2  # bn + relu placeholder

    # ConvTranspose2d weight layout (in, out, kh, kw); k == upsample stride
    sd["neck.deblocks.0.0.weight"] = rng.randn(64, 128, 1, 1).astype(np.float32) * 0.05
    bn("neck.deblocks.0.1", 128)
    sd["neck.deblocks.1.0.weight"] = rng.randn(128, 128, 2, 2).astype(np.float32) * 0.05
    bn("neck.deblocks.1.1", 128)
    sd["neck.deblocks.2.0.weight"] = rng.randn(256, 128, 4, 4).astype(np.float32) * 0.05
    bn("neck.deblocks.2.1", 128)

    for name, c in (("conv_cls", 18), ("conv_reg", 42), ("conv_dir_cls", 12)):
        sd[f"bbox_head.{name}.weight"] = rng.randn(c, 384, 1, 1).astype(np.float32) * 0.05
        sd[f"bbox_head.{name}.bias"] = rng.randn(c).astype(np.float32) * 0.01
    return sd


def _tiny_pillar_cfg():
    from robustpointclouds_tpu.models import PointPillarsConfig
    from robustpointclouds_tpu.ops.voxelize import VoxelizerConfig

    return PointPillarsConfig(
        voxelizer=VoxelizerConfig(
            point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
            voxel_size=(0.5, 0.5, 4.0),
            max_points_per_voxel=8, max_voxels=128,
        ),
        anchor_ranges=(
            (0, -8.0, -1.78, 16.0, 8.0, -1.78),
            (0, -8.0, -0.6, 16.0, 8.0, -0.6),
            (0, -8.0, -0.6, 16.0, 8.0, -0.6),
        ),
        adversary=None,
    )


class TestPointPillarsConversion:
    def test_layout_detection(self):
        assert cvt.detect_state_dict_layout(
            fake_mmdet3d_pointpillars_state_dict()) == "pointpillars"
        assert cvt.detect_state_dict_layout(
            fake_mmdet3d_second_state_dict()) == "second"
        assert cvt.detect_state_dict_layout(
            fake_mmdet3d_centerpoint_encoder_state_dict()) == "centerpoint"
        with pytest.raises(ValueError):
            cvt.detect_state_dict_layout({"foo.bar": np.zeros(3)})

    def test_pfn_linear_orientation(self):
        """torch Linear weight [out=64, in=9] must transpose to the flax
        Dense kernel [9, 64]: y = x @ kernel must equal x @ W.T."""
        sd = fake_mmdet3d_pointpillars_state_dict()
        params_c, stats_c = cvt.convert_pointpillars_state_dict(sd)
        k = params_c["pfn"]["Dense_0"]["kernel"]
        w = sd["voxel_encoder.pfn_layers.0.linear.weight"]
        assert k.shape == (9, 64)
        x = np.random.RandomState(1).randn(5, 9).astype(np.float32)
        np.testing.assert_allclose(x @ k, x @ w.T)
        np.testing.assert_array_equal(
            stats_c["pfn"]["MaskedBatchNorm_0"]["mean"],
            sd["voxel_encoder.pfn_layers.0.norm.running_mean"],
        )

    def test_full_pointpillars_zoo_roundtrip_forward(self):
        """VERDICT r4 #6 done criterion for the pillar family: the full zoo
        layout converts, merges into AdversarialPointPillars with ZERO skips
        (tiny grid, REAL channel widths), and forwards finite."""
        import jax
        import jax.numpy as jnp

        from robustpointclouds_tpu.data import synthetic_kitti_batch
        from robustpointclouds_tpu.data.structures import PointCloudBatch
        from robustpointclouds_tpu.models import AdversarialPointPillars

        sd = fake_mmdet3d_pointpillars_state_dict()
        params_c, stats_c = cvt.convert_pointpillars_state_dict(sd)

        model = AdversarialPointPillars(cfg=_tiny_pillar_cfg())
        b = synthetic_kitti_batch(
            np.random.RandomState(0), 1, 512,
            point_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
        )
        batch = PointCloudBatch(*(jnp.asarray(x) for x in b))
        variables = model.init(
            jax.random.PRNGKey(0), batch.points, batch.points_mask, False, 0
        )
        params_np = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
        stats_np = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))
        new_params, loaded, skipped = cvt.merge_into_params(
            params_np, params_c, strict_prefixes=("pfn", "backbone", "neck")
        )
        new_stats, loaded_s, skipped_s = cvt.merge_into_params(stats_np, stats_c)
        assert not skipped, skipped
        assert not skipped_s, skipped_s
        assert len(loaded) > 25

        outs = model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, new_params),
             "batch_stats": jax.tree_util.tree_map(jnp.asarray, new_stats)},
            batch.points, batch.points_mask, False, 0,
        )
        assert np.isfinite(np.asarray(outs.cls_scores)).all()
        assert np.isfinite(np.asarray(outs.bbox_preds)).all()


class TestLoadPretrainedDispatch:
    def test_pillar_pth_warm_start(self, tmp_path):
        """load_pretrained detects the pointpillars layout and lands the PFN
        + trunk tensors into a pillar Trainer state."""
        torch = pytest.importorskip("torch")
        import jax
        import jax.numpy as jnp

        from robustpointclouds_tpu.data import synthetic_kitti_batch
        from robustpointclouds_tpu.data.structures import PointCloudBatch
        from robustpointclouds_tpu.train import TrainConfig, Trainer
        from robustpointclouds_tpu.train.checkpoint import load_pretrained

        sd = fake_mmdet3d_pointpillars_state_dict()
        path = tmp_path / "pillars.pth"
        torch.save(
            {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
            path,
        )
        trainer = Trainer(model_cfg=_tiny_pillar_cfg(), train_cfg=TrainConfig())
        b = synthetic_kitti_batch(
            np.random.RandomState(0), 1, 512,
            point_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
        )
        batch = PointCloudBatch(*(jnp.asarray(x) for x in b))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state2 = load_pretrained(state, str(path))
        np.testing.assert_allclose(
            np.asarray(state2.params["pfn"]["Dense_0"]["kernel"]),
            sd["voxel_encoder.pfn_layers.0.linear.weight"].T,
            rtol=1e-6,
        )

    def test_zero_loaded_raises(self, tmp_path):
        """A recognized family whose tensors all fail to land must raise, not
        silently train from random init (the pre-fix behavior for any
        non-SECOND .pth)."""
        torch = pytest.importorskip("torch")
        import jax
        import jax.numpy as jnp

        from robustpointclouds_tpu.data import synthetic_kitti_batch
        from robustpointclouds_tpu.data.structures import PointCloudBatch
        from robustpointclouds_tpu.train import TrainConfig, Trainer
        from robustpointclouds_tpu.train.checkpoint import load_pretrained

        sd = {"middle_encoder.unknown_block.0.weight": np.zeros((8, 3, 3, 3, 4), np.float32)}
        path = tmp_path / "junk.pth"
        torch.save(
            {"state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}}, path
        )
        trainer = Trainer(model_cfg=_tiny_pillar_cfg(), train_cfg=TrainConfig())
        b = synthetic_kitti_batch(
            np.random.RandomState(0), 1, 256,
            point_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
        )
        batch = PointCloudBatch(*(jnp.asarray(x) for x in b))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        with pytest.raises(ValueError, match="ZERO"):
            load_pretrained(state, str(path))


def test_pillar_variant_centerpoint_rejected():
    """centerpoint_pillar02_* checkpoints (pts_voxel_encoder.pfn_layers.*)
    must hard-error, not silently drop the PFN under a converted trunk."""
    sd = {"pts_voxel_encoder.pfn_layers.0.linear.weight": np.zeros((64, 10)),
          "pts_backbone.blocks.0.0.weight": np.zeros((128, 256, 3, 3))}
    with pytest.raises(ValueError, match="pillar-variant"):
        cvt.detect_state_dict_layout(sd)
