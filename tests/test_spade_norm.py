"""SPADE normalization statistics vs. a manual reimplementation (mirroring
the reference's batchnorm_reimpl comparison, SURVEY.md §4), plus the
cross-replica claim: batch statistics under a data-sharded jit equal the
single-device statistics — i.e. plain BatchNorm IS SyncBN on the mesh."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from canonicalsg2im_tpu.models.spade import SPADE, ParamFreeNorm
from canonicalsg2im_tpu.parallel import create_mesh, replicate
from jax.sharding import NamedSharding, PartitionSpec as P


def test_param_free_batchnorm_matches_manual():
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 3.0, size=(8, 6, 6, 5)).astype(np.float32)
    model = ParamFreeNorm("syncbatch")
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    y, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    mean = x.mean(axis=(0, 1, 2))
    var = x.var(axis=(0, 1, 2))
    want = (x - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)


def test_param_free_instance_norm():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    model = ParamFreeNorm("instance")
    y = model.apply({}, x, train=True)
    y = np.asarray(y)
    np.testing.assert_allclose(y.mean(axis=(1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.var(axis=(1, 2)), 1.0, atol=1e-3)


def test_batchnorm_is_synced_across_mesh():
    """Same global batch, 1 device vs 8-way data sharding: identical output
    and identical running statistics — the reference needed 638 LoC of
    master/slave thread pipes for this (spade sync_batchnorm)."""
    rng = np.random.default_rng(2)
    x = rng.normal(1.5, 2.0, size=(8, 4, 4, 3)).astype(np.float32)
    model = ParamFreeNorm("syncbatch")
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    apply = jax.jit(lambda v, x: model.apply(v, x, train=True,
                                             mutable=["batch_stats"]))
    y1, s1 = apply(variables, x)

    mesh = create_mesh((8, 1))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    vs = replicate(variables, mesh)
    y8, s8 = apply(vs, xs)

    np.testing.assert_allclose(np.asarray(y8), np.asarray(y1), atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_spade_applies_conditional_affine():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    seg = rng.normal(size=(2, 16, 16, 6)).astype(np.float32)
    model = SPADE("spadesyncbatch3x3", 4)
    variables = model.init(jax.random.PRNGKey(0), x, seg, train=True)
    y, _ = model.apply(variables, x, seg, train=True,
                       mutable=["batch_stats"])
    assert y.shape == x.shape
    # zero seg -> gamma/beta from conv bias only; different seg changes output
    y2, _ = model.apply(variables, x, seg * 2.0, train=True,
                        mutable=["batch_stats"])
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_resize_nearest_halving_chain_matches_direct():
    """The generator's seg pyramid halves by [:, ::2, ::2] slices; for
    power-of-two ratios the chain must select exactly the pixels of the
    direct floor-convention nearest resize (torch F.interpolate)."""
    import numpy as np

    from canonicalsg2im_tpu.models.layers import resize_nearest

    rng = np.random.default_rng(0)
    seg = rng.standard_normal((2, 64, 64, 5)).astype(np.float32)
    x = seg
    for size in (32, 16, 8):
        x = x[:, ::2, ::2]
        direct = np.asarray(resize_nearest(seg, (size, size)))
        np.testing.assert_array_equal(np.asarray(x), direct)
    # identity short-circuit
    assert resize_nearest(seg, (64, 64)) is seg
