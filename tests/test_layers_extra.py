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
