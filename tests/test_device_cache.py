"""DeviceImagePool: pool-fed batches must be bit-identical to loader-rendered
ones (the cached path only moves WHERE the pixels come from, never their
values), across meshes and stacked multi-step blocks."""
import jax
import numpy as np
import pytest

from canonicalsg2im_tpu.data import BucketedLoader
from canonicalsg2im_tpu.data.device_cache import DeviceImagePool
from canonicalsg2im_tpu.data.synthetic_clevr import SyntheticClevrDataset
from canonicalsg2im_tpu.parallel import create_mesh, shard_batch


def _dataset(render):
    return SyntheticClevrDataset(
        num_samples=32, min_objects=3, max_objects=6, image_size=(32, 32),
        learned_converse=True, learned_transitivity=True,
        render_images=render, seed=7)


def _loader(ds):
    return BucketedLoader(ds, 8, shuffle=False, seed=0, prefetch=0,
                          num_workers=1, bucket_objects=(8,),
                          bucket_triplets=(128,))


@pytest.mark.parametrize("mesh_shape", [(-1, 1), (4, 2)])
def test_pool_batches_bit_identical(mesh_shape):
    mesh = create_mesh(mesh_shape)
    ds = _dataset(render=True)
    pool = DeviceImagePool(ds, mesh, chunk=10)
    assert ds.render_images is False  # pool disables loader rendering

    ref_batches = list(_loader(_dataset(render=True)))
    for ref, cached in zip(ref_batches, _loader(ds)):
        assert cached.imgs is None
        dev = pool.attach(shard_batch(cached, mesh), cached.image_ids)
        np.testing.assert_array_equal(np.asarray(dev.imgs), ref.imgs)
        # the graph tensors still come from the live canonicalization path
        np.testing.assert_array_equal(np.asarray(dev.triplets), ref.triplets)
    assert len(ref_batches) == 4


def test_pool_stacked_block_and_sharding():
    mesh = create_mesh((-1, 1))
    ds = _dataset(render=True)
    pool = DeviceImagePool(ds, mesh, chunk=32)
    ref = list(_loader(_dataset(render=True)))
    cached = list(_loader(ds))
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *cached[:3])
    dev = shard_batch(stacked, mesh, stacked=True)
    dev = pool.attach(dev, stacked.image_ids)
    assert dev.imgs.shape == (3, 8, 32, 32, 3)
    np.testing.assert_array_equal(
        np.asarray(dev.imgs), np.stack([b.imgs for b in ref[:3]]))
    # batch dim rides the 'data' mesh axis, like every shard_batch output
    assert dev.imgs.sharding.spec == dev.objs.sharding.spec


def test_pool_bfloat16_storage_decodes_to_f32():
    mesh = create_mesh((-1, 1))
    ds = _dataset(render=True)
    pool = DeviceImagePool(ds, mesh, dtype="bfloat16")
    b = next(iter(_loader(ds)))
    dev = pool.attach(shard_batch(b, mesh), b.image_ids)
    assert dev.imgs.dtype == np.float32  # step signature unchanged
    ref = next(iter(_loader(_dataset(render=True))))
    np.testing.assert_allclose(np.asarray(dev.imgs), ref.imgs, atol=1 / 128)


def test_pool_rejects_unknown_ids_and_unrenderable_datasets():
    mesh = create_mesh((-1, 1))
    ds = _dataset(render=True)
    pool = DeviceImagePool(ds, mesh)
    with pytest.raises(KeyError):
        pool.gather(np.array([10_000], dtype=np.int64))

    class NoFlag:
        def __len__(self):
            return 0

    from canonicalsg2im_tpu.data.device_cache import _disable_rendering

    with pytest.raises(ValueError, match="render_images"):
        _disable_rendering(NoFlag())
