"""Equivalence tests for benchmarks/candidate_layers.py — TPU primitives
that measured neutral/negative on-chip (docs/logs/ab_r3.log) and were demoted
from the product tree, kept runnable for future re-A/B."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.candidate_layers import (
    BatchStatsNorm,
    SmallCinConv,
    conv_via_patches,
    max_pool_2x2,
)


def test_batch_stats_norm_is_flax_batchnorm_dropin():
    """BatchStatsNorm (the no-f32-materialization rewrite) must be
    indistinguishable from nn.BatchNorm(use_bias=False, use_scale=False):
    same variable tree, same outputs, same running-stat updates, and an
    eval-mode path driven by the running statistics."""
    rng = np.random.default_rng(4)
    x = rng.normal(1.0, 2.5, size=(4, 5, 5, 7)).astype(np.float32)

    ours = BatchStatsNorm(momentum=0.9, epsilon=1e-5)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                       use_bias=False, use_scale=False)
    v_ours = ours.init(jax.random.PRNGKey(0), x, use_running_average=False)
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v_ours)
            == jax.tree_util.tree_structure(v_ref))

    y_ours, s_ours = ours.apply(v_ours, x, use_running_average=False,
                                mutable=["batch_stats"])
    y_ref, s_ref = ref.apply(v_ref, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_ref),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(s_ours), jax.tree.leaves(s_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # eval path reads the updated running stats
    y_eval = ours.apply({**v_ours, **s_ours}, x, use_running_average=True)
    m = s_ours["batch_stats"]["mean"]
    v = s_ours["batch_stats"]["var"]
    want = (x - np.asarray(m)) / np.sqrt(np.asarray(v) + 1e-5)
    np.testing.assert_allclose(np.asarray(y_eval), want, atol=1e-5)


def test_batch_stats_norm_bf16_statistics_are_f32():
    """bf16 input: statistics must accumulate in f32 (match the cast-to-f32
    oracle tightly) and the output must ride bf16."""
    rng = np.random.default_rng(5)
    xf = rng.normal(3.0, 1.5, size=(8, 16, 16, 5)).astype(np.float32)
    x = jnp.asarray(xf).astype(jnp.bfloat16)

    model = BatchStatsNorm()
    v = model.init(jax.random.PRNGKey(0), x, use_running_average=False)
    y, s = model.apply(v, x, use_running_average=False,
                       mutable=["batch_stats"])
    assert y.dtype == jnp.bfloat16

    x32 = np.asarray(x, dtype=np.float32)  # exact bf16 values
    # momentum 0.9 from a zero init: the stored running mean is batch_mean/10
    np.testing.assert_allclose(np.asarray(s["batch_stats"]["mean"]) * 10,
                               x32.mean(axis=(0, 1, 2)), atol=1e-5)
    want = (x32 - x32.mean(axis=(0, 1, 2))) / np.sqrt(
        x32.var(axis=(0, 1, 2)) + 1e-5)
    np.testing.assert_allclose(np.asarray(y, dtype=np.float32), want,
                               atol=1e-2)  # bf16 output quantization


def test_conv_via_patches_matches_lax_conv():
    """conv_via_patches (the lane-friendly small-C_in conv) must equal
    lax.conv_general_dilated in value AND in both gradients — it was built
    for the first convs of the PatchGAN (4x4 s2 pad2) and VGG19 (3x3 s1)."""
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
