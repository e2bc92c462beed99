"""Tests for WS-ResNet and MRRP backbones."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sos_wsod_tpu.models.backbones.resnet_ws import WSResNet, WSBottleneckBlock
from sos_wsod_tpu.models.backbones.mrrp import MRRPConv, MRRPVGG16


def test_ws_resnet_stride8_dilated():
    """RES5_DILATION=2: the whole trunk is stride 8 (resnet_ws.py:690-692)."""
    model = WSResNet(depth=14, res5_dilation=2,
                     out_features=("res2", "res3", "res4", "res5"),
                     stem_out_channels=8, res2_out_channels=16,
                     width_per_group=4)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["res2"].shape[1:3] == (8, 8)     # 64 / 8
    # res3's pad+pool(stride 1) keeps size; res4/res5 dilated, stride-free
    assert out["res3"].shape[1:3] == (8, 8)
    assert out["res4"].shape[1:3] == (8, 8)
    assert out["res5"].shape[1:3] == (8, 8)
    assert out["res5"].shape[-1] == 16 * 8


def test_ws_resnet_stride16_undilated():
    model = WSResNet(depth=14, res5_dilation=1, out_features=("res5",),
                     stem_out_channels=8, res2_out_channels=16,
                     width_per_group=4)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["res5"].shape[1:3] == (4, 4)     # 64 / 16


def test_ws_bottleneck_never_strides_in_conv():
    blk = WSBottleneckBlock(in_channels=8, out_channels=16,
                            bottleneck_channels=4, has_pool=True,
                            pool_stride=2)
    x = jnp.zeros((1, 16, 16, 8))
    params = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(params, x)
    assert out.shape == (1, 8, 8, 16)  # downsampled by the POOL only
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = [".".join(str(k) for k in path) for path, _ in flat]
    assert any("shortcut" in n for n in names)


def test_mrrp_conv_shared_weights_and_dilations():
    conv = MRRPConv(features=4, dilations=(1, 2, 3), use_bias=False)
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.rand(3, 16, 16, 2), jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), xs)
    # exactly ONE kernel parameter despite 3 branches
    leaves = jax.tree_util.tree_leaves(params)
    assert len(leaves) == 1 and leaves[0].shape == (3, 3, 2, 4)
    out = conv.apply(params, xs)
    assert out.shape == (3, 16, 16, 4)
    # identical branch inputs + dilation 1 vs 2 -> different receptive fields
    same = jnp.broadcast_to(xs[0], xs.shape)
    out2 = conv.apply(params, same)
    assert not np.allclose(np.asarray(out2[0]), np.asarray(out2[1]))
    # but on a constant input all dilations agree in the interior
    const = jnp.ones((3, 16, 16, 2))
    oc = np.asarray(conv.apply(params, const))
    np.testing.assert_allclose(oc[0][6:-6, 6:-6], oc[2][6:-6, 6:-6],
                               rtol=1e-5)


def test_mrrp_vgg_shapes_and_sharing():
    model = MRRPVGG16(num_branch=3, branch_dilations=(1, 2, 3))
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    # dilated-C5 layout: stride 8, minus 1 for the stride-1 plain4 pool
    assert out["plain5"].shape == (1, 3, 7, 7, 512)
    # plain5's three convs hold exactly one kernel each (shared across branches)
    p5 = params["params"]["plain5"]
    assert set(p5.keys()) == {"conv1", "conv2", "conv3"}
    assert p5["conv1"]["kernel"].shape == (3, 3, 512, 512)


def test_deform_bottleneck_block():
    from sos_wsod_tpu.models.backbones.resnet_ws import DeformBottleneckBlock

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 12, 12, 8), jnp.float32)
    for modulated in (False, True):
        blk = DeformBottleneckBlock(in_channels=8, out_channels=16,
                                    bottleneck_channels=4,
                                    deform_modulated=modulated)
        params = blk.init(jax.random.PRNGKey(0), x)
        out = blk.apply(params, x)
        assert out.shape == (1, 12, 12, 16)
        # offset conv zero-init: first forward == plain bottleneck behaviour
        g = jax.grad(lambda p: jnp.sum(blk.apply(p, x) ** 2))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(l)) for l in leaves)
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        off_grads = [np.abs(v).max() for path, v in flat
                     if any("conv2_offset" in str(k) for k in path)]
        assert len(off_grads) > 0 and max(off_grads) > 0
