"""Tests for auxiliary building blocks (sg2im/layers.py:190-258 and
spade base_network.py:10-59 counterparts)."""
import jax
import jax.numpy as jnp
import numpy as np

from canonicalsg2im_tpu.models.layers import (
    ConditionalBatchNorm2d,
    Interpolate,
    ResidualBlock,
    apply_init_weights,
    resize_nearest,
    upsample_nearest,
    weight_initializer,
)


def test_residual_block_shape_and_skip():
    m = ResidualBlock(channels=16)
    x = jnp.ones((2, 8, 8, 16))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(vars_, x, train=False)
    assert y.shape == x.shape
    # zeroing the conv kernels makes the block the identity (residual skip)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, vars_["params"])
    y0 = m.apply({**vars_, "params": zeroed}, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x), atol=1e-6)


def test_interpolate_module():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    up = Interpolate(scale_factor=2).apply({}, x)
    np.testing.assert_array_equal(np.asarray(up),
                                  np.asarray(upsample_nearest(x, 2)))
    rs = Interpolate(size=(2, 2)).apply({}, x)
    np.testing.assert_array_equal(np.asarray(rs),
                                  np.asarray(resize_nearest(x, (2, 2))))


def test_conditional_batchnorm():
    m = ConditionalBatchNorm2d(num_classes=5)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 6))
    y_cls = jnp.array([0, 1, 2, 3])
    vars_ = m.init(jax.random.PRNGKey(0), x, y_cls, train=False)
    out = m.apply(vars_, x, y_cls, train=False)
    assert out.shape == x.shape
    # different classes produce different (gamma, beta) -> different outputs
    out2 = m.apply(vars_, x, jnp.array([1, 1, 1, 1]), train=False)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out2[0]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[1]),
                               atol=1e-6)


def test_weight_initializer_xavier_gain_matches_torch_formula():
    # torch xavier_normal_(gain): std = gain * sqrt(2 / (fan_in + fan_out))
    k = weight_initializer("xavier", gain=0.02)(
        jax.random.PRNGKey(0), (256, 512), jnp.float32)
    expect = 0.02 * np.sqrt(2.0 / (256 + 512))
    # truncated normal shrinks std slightly; allow 15%
    assert abs(np.asarray(k).std() - expect) / expect < 0.15


def test_weight_initializer_orthogonal():
    k = weight_initializer("orthogonal", gain=1.0)(
        jax.random.PRNGKey(0), (64, 64), jnp.float32)
    eye = np.asarray(k) @ np.asarray(k).T
    np.testing.assert_allclose(eye, np.eye(64), atol=1e-4)


def test_apply_init_weights_kernels_only():
    m = ResidualBlock(channels=8)
    x = jnp.ones((1, 4, 4, 8))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=True)
    new = apply_init_weights(vars_["params"], jax.random.PRNGKey(9),
                             "normal", gain=0.5)
    leaves_old = jax.tree_util.tree_flatten_with_path(vars_["params"])[0]
    leaves_new = jax.tree_util.tree_leaves(new)
    changed = unchanged = 0
    for (path, old), nw in zip(leaves_old, leaves_new):
        if "kernel" in str(path[-1]):
            assert not np.allclose(np.asarray(old), np.asarray(nw))
            changed += 1
        else:
            np.testing.assert_array_equal(np.asarray(old), np.asarray(nw))
            unchanged += 1
    assert changed >= 2 and unchanged >= 2


def test_conv_via_patches_matches_lax_conv():
    """conv_via_patches (the lane-friendly small-C_in conv) must equal
    lax.conv_general_dilated in value AND in both gradients — it replaces the
    first convs of the PatchGAN (4x4 s2 pad2) and VGG19 (3x3 s1 SAME)."""
    from canonicalsg2im_tpu.models.layers import conv_via_patches

    rng = np.random.default_rng(7)
    for (H, ci, co, k, s, pad) in [
        (16, 3, 8, 4, 2, ((2, 2), (2, 2))),   # PatchGAN first conv geometry
        (15, 3, 8, 3, 1, ((1, 1), (1, 1))),   # VGG conv0 geometry (odd H)
        (12, 5, 4, 2, 2, ((0, 0), (0, 0))),
    ]:
        x = jnp.asarray(rng.standard_normal((2, H, H, ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.1,
                        jnp.float32)

        def ref(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (s, s), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def ours(x, w):
            return conv_via_patches(x, w, (s, s), pad)

        y_ref, y_ours = ref(x, w), ours(x, w)
        assert y_ours.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_ref),
                                   atol=1e-5)

        ct = jnp.asarray(rng.standard_normal(y_ref.shape), jnp.float32)
        loss_ref = lambda x, w: (ref(x, w) * ct).sum()
        loss_ours = lambda x, w: (ours(x, w) * ct).sum()
        gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        gx_ours, gw_ours = jax.grad(loss_ours, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_ours), np.asarray(gx_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_ours), np.asarray(gw_ref),
                                   rtol=1e-4, atol=1e-4)


def test_small_cin_conv_is_nn_conv_dropin():
    """SmallCinConv: identical param tree and outputs to nn.Conv."""
    import flax.linen as nn

    from canonicalsg2im_tpu.models.layers import SmallCinConv

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 10, 10, 3)), jnp.float32)
    ours = SmallCinConv(6, (3, 3), (1, 1), ((1, 1), (1, 1)))
    ref = nn.Conv(6, (3, 3), padding="SAME")
    v_ours = ours.init(jax.random.PRNGKey(3), x)
    v_ref = ref.init(jax.random.PRNGKey(3), x)
    assert (jax.tree_util.tree_structure(v_ours)
            == jax.tree_util.tree_structure(v_ref))
    for a, b in zip(jax.tree.leaves(v_ours), jax.tree.leaves(v_ref)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.apply(v_ours, x)),
                               np.asarray(ref.apply(v_ref, x)), atol=1e-5)


def test_max_pool_2x2_matches_flax_values_and_grads():
    """max_pool_2x2 (fused-backward pool) vs nn.max_pool: equal values, and
    equal gradients including exact-tie windows (first max wins, the torch /
    select-and-scatter rule)."""
    import flax.linen as nn

    from canonicalsg2im_tpu.models.layers import max_pool_2x2

    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    # force ties: zero out whole windows (the post-relu case) and duplicate
    # values within others
    x[0, 0:2, 0:2, :] = 0.0
    x[1, 4, 4, :] = x[1, 4, 5, :] = x[1, 5, 4, :] = 7.0
    x = jnp.asarray(x)

    ref = lambda x: nn.max_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(max_pool_2x2(x)),
                                  np.asarray(ref(x)))

    ct = jnp.asarray(rng.standard_normal((2, 4, 4, 5)), jnp.float32)
    g_ref = jax.grad(lambda x: (ref(x) * ct).sum())(x)
    g_ours = jax.grad(lambda x: (max_pool_2x2(x) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               atol=1e-6)


def test_spade_batch_stats_norm_gate_is_equivalent():
    """The spade_batch_stats_norm gate must be a pure program-expression
    change: same init param/batch_stats tree (checkpoints interchangeable),
    same outputs and updated statistics to f32 reduction-order tolerance."""
    from canonicalsg2im_tpu.models.spade import SPADE

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 16), jnp.float32)
    seg = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 12), jnp.float32)

    outs, stats, trees = [], [], []
    for gate in (False, True):
        m = SPADE("spadesyncbatch3x3", 16, batch_stats_norm=gate)
        v = m.init(jax.random.PRNGKey(2), x, seg)
        trees.append(jax.tree_util.tree_structure(v))
        y, mut = m.apply(v, x, seg, train=True, mutable=["batch_stats"])
        outs.append(np.asarray(y))
        stats.append(mut["batch_stats"])
    assert trees[0] == trees[1]
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-5)
    for a, b in zip(jax.tree.leaves(stats[0]), jax.tree.leaves(stats[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_vgg_custom_pool_gate_matches_default_loss_and_grad():
    """vgg_custom_pool must not change the VGG loss value or its gradient
    (max_pool_2x2 shares XLA's first-maximum tie rule)."""
    from canonicalsg2im_tpu.models.vgg import VGGLoss, load_vgg_params

    params, _ = load_vgg_params("/nonexistent")  # fixed-seed random net
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 64, 3), jnp.float32)

    vals, grads = [], []
    for gate in (False, True):
        loss = VGGLoss(params, custom_pool=gate)
        v, g = jax.value_and_grad(lambda xx: loss(xx, y))(x)
        vals.append(float(v))
        grads.append(np.asarray(g))
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-6)
    np.testing.assert_allclose(grads[0], grads[1], rtol=1e-5, atol=1e-6)
