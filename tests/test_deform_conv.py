"""Deformable conv (gather-based XLA DCN) and the DCN CenterHead variant.

Reference base config is head-dcn-circlenms
(adversarial-centerpoint_voxel-nuscenes.py:11-13); mmcv's CUDA DeformConv2d
is rebuilt as offset-conv + bilinear gather + img2col matmul.
"""
import jax
import jax.numpy as jnp
import numpy as np

from robustpointclouds_tpu.nn.deform_conv import DeformConv2d, _bilinear_gather


def test_zero_offsets_equal_plain_conv():
    """With the (zero-initialized) offset conv untouched, DCN must equal a
    standard 3x3 conv with the same kernel."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 10, 4).astype(np.float32))
    m = DeformConv2d(6)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)

    # same kernel as a lax conv: [K*Cin, Cout] -> HWIO [3, 3, 4, 6]
    k = np.asarray(params["params"]["kernel"]).reshape(3, 3, 4, 6)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_integer_offset_shifts_sampling():
    """A constant integer offset of (0, +1) on every tap equals running the
    plain conv on the input shifted left by one column."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 8, 3).astype(np.float32))
    m = DeformConv2d(5)
    params = m.init(jax.random.PRNGKey(0), x)
    p = jax.tree_util.tree_map(lambda v: v, params)  # copy
    off_bias = np.zeros(18, np.float32)
    off_bias[1::2] = 1.0  # dx = +1 for all 9 taps
    p["params"]["conv_offset"]["bias"] = jnp.asarray(off_bias)
    out = m.apply(p, x)

    x_shift = jnp.concatenate([x[:, :, 1:], jnp.zeros_like(x[:, :, :1])], axis=2)
    ref = m.apply(params, x_shift)
    # interior columns agree exactly (borders differ: zero-padding vs shift)
    np.testing.assert_allclose(
        np.asarray(out[:, 1:-1, 1:-2]), np.asarray(ref[:, 1:-1, 1:-2]),
        rtol=1e-4, atol=1e-4,
    )


def test_bilinear_gather_fractional():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    py = jnp.full((1, 1, 1, 1), 0.5)
    px = jnp.full((1, 1, 1, 1), 1.5)
    out = _bilinear_gather(x, py, px)
    # average of x[0,0,1], x[0,0,2], x[0,1,1], x[0,1,2] = (1+2+5+6)/4
    assert float(out[0, 0, 0, 0, 0]) == 3.5


def test_gradients_flow_through_offsets():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
    m = DeformConv2d(4)
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(m.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    # offset conv receives gradient through the bilinear sampling weights
    gb = np.asarray(g["params"]["conv_offset"]["kernel"])
    assert np.isfinite(gb).all()
    assert np.abs(gb).max() > 0


def test_dcn_center_head_shapes():
    from robustpointclouds_tpu.nn.center_head import CenterHead

    x = jnp.zeros((2, 16, 16, 32))
    head = CenterHead(tasks=(("car",), ("pedestrian", "traffic_cone")), use_dcn=True)
    vars_ = head.init(jax.random.PRNGKey(0), x, False)
    outs = head.apply(vars_, x, False)
    assert len(outs) == 2
    assert outs[0]["heatmap"].shape == (2, 16, 16, 1)
    assert outs[1]["heatmap"].shape == (2, 16, 16, 2)
    assert outs[0]["reg"].shape == (2, 16, 16, 2)
    # DCN adapters present in the param tree
    assert "task0_adapt_cls" in vars_["params"]
    assert "dcn" in vars_["params"]["task0_adapt_cls"]


def test_grouped_dcn_zero_offsets_equals_grouped_conv():
    """groups=4 (the zoo DCN CenterHead config) at zero offsets must equal
    lax's grouped convolution exactly."""
    rng = np.random.RandomState(3)
    g, c, cout = 4, 8, 12
    x = jnp.asarray(rng.randn(2, 7, 9, c).astype(np.float32))
    m = DeformConv2d(cout, groups=g)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)

    # rebuild the torch/HWIO grouped weight from the param layout
    kern = np.asarray(params["params"]["kernel"])  # [g, K*(c/g), cout/g]
    cg, og = c // g, cout // g
    hwio = np.zeros((3, 3, cg, cout), np.float32)
    for gi in range(g):
        hwio[..., gi * og:(gi + 1) * og] = kern[gi].reshape(3, 3, cg, og)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(hwio), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=g,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_torch_grouped_weight_conversion():
    """A synthetic torch-layout grouped DCN weight [Cout, Cin/g, 3, 3] must
    convert to the param layout and reproduce torch's grouped conv at zero
    offsets (VERDICT r2 task 7)."""
    from robustpointclouds_tpu.nn.deform_conv import torch_dcn_weight_to_params

    rng = np.random.RandomState(4)
    g, c, cout = 4, 8, 8
    w_torch = rng.randn(cout, c // g, 3, 3).astype(np.float32)
    x = jnp.asarray(rng.randn(1, 6, 6, c).astype(np.float32))

    m = DeformConv2d(cout, groups=g)
    params = m.init(jax.random.PRNGKey(0), x)
    conv = torch_dcn_weight_to_params(w_torch, groups=g)
    assert conv.shape == np.asarray(params["params"]["kernel"]).shape
    params = jax.tree_util.tree_map(lambda v: v, params)
    params["params"]["kernel"] = jnp.asarray(conv)
    out = m.apply(params, x)

    # torch grouped conv reference: OIHW -> HWIO blocks per group
    hwio = np.zeros((3, 3, c // g, cout), np.float32)
    og = cout // g
    for gi in range(g):
        blk = w_torch[gi * og:(gi + 1) * og]          # [og, c/g, 3, 3]
        hwio[..., gi * og:(gi + 1) * og] = blk.transpose(2, 3, 1, 0)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(hwio), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=g,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_deform_groups_split_offsets():
    """deform_groups=2: each channel half samples at its own offsets; with
    group-0 offsets shifted (0, +1) and group-1 zero, channels split."""
    rng = np.random.RandomState(5)
    c = 4
    x = jnp.asarray(rng.randn(1, 5, 7, c).astype(np.float32))
    m = DeformConv2d(c, deform_groups=2)
    params = m.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(lambda v: v, params)
    K = 9
    bias = np.zeros(2 * 2 * K, np.float32)
    # deform group 0 (channel block [dg, K, (y, x)]): x offset +1 on all taps
    bias.reshape(2, K, 2)[0, :, 1] = 1.0
    params["params"]["conv_offset"]["bias"] = jnp.asarray(bias)
    out = m.apply(params, x)

    # reference: col from channels 0:2 sampled at x+1, channels 2:4 in place
    x_shift = jnp.concatenate(
        [jnp.roll(x[..., :2], -1, axis=2).at[:, :, -1, :].set(0.0), x[..., 2:]],
        axis=-1,
    )
    m0 = DeformConv2d(c, deform_groups=2)
    # zero offsets on the mixed input, same kernel
    p0 = jax.tree_util.tree_map(lambda v: v, params)
    p0["params"]["conv_offset"]["bias"] = jnp.zeros(2 * 2 * K)
    ref = m0.apply(p0, x_shift)
    # interior columns agree (border columns differ because true DCN samples
    # beyond the roll's zero fill)
    np.testing.assert_allclose(
        np.asarray(out)[:, 1:-1, 1:-2], np.asarray(ref)[:, 1:-1, 1:-2],
        rtol=1e-4, atol=1e-4,
    )
