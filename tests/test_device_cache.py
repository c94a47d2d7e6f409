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


# ---------------------------------------------------------------------------
# RotatingDevicePool (round 4): segment-streamed pool for datasets that
# exceed HBM. Same bit-identity contract as the flat pool, plus rotation
# across segment boundaries, multi-pass emission, and the stale-buffer
# host-render fallback.
# ---------------------------------------------------------------------------
from canonicalsg2im_tpu.data.device_cache import RotatingDevicePool


def _rot_pool(ds, mesh, **kw):
    kw.setdefault("segment_size", 8)
    kw.setdefault("batch_size", 8)
    return RotatingDevicePool(ds, mesh, seed=3, **kw)


def _ref_images_by_id(n=32):
    ds = _dataset(render=True)
    return {ds.image_id_of(i): ds.render_image(i)[1] for i in range(n)}


def test_rotating_pool_epoch_bit_identical():
    """One full epoch over 4 segments: every batch's images must equal the
    loader-rendered images for the same ids, and the sampler must cover the
    dataset exactly once at passes=1."""
    mesh = create_mesh((-1, 1))
    ds = _dataset(render=True)
    pool = _rot_pool(ds, mesh)
    assert ds.render_images is False
    by_id = _ref_images_by_id()

    loader = _loader(ds)
    loader.index_sampler = pool.sampler
    seen = []
    for b in loader:
        assert b.imgs is None
        dev = pool.attach(shard_batch(b, mesh), b.image_ids)
        want = np.stack([by_id[int(i)] for i in b.image_ids])
        np.testing.assert_array_equal(np.asarray(dev.imgs), want)
        seen.extend(int(i) for i in b.image_ids)
    assert sorted(seen) == list(range(32))  # full single-pass coverage
    pool.close()


def test_rotating_pool_boundary_blocks_and_passes():
    """Stacked dispatch blocks that straddle a segment boundary are served
    from both buffers; passes=2 emits each segment's images twice."""
    mesh = create_mesh((4, 2))
    ds = _dataset(render=True)
    # segment 16, batch 8, block of 3 batches: blocks at (0,8,16) straddle
    pool = _rot_pool(ds, mesh, segment_size=16, passes_per_segment=2,
                     block_batches=3)
    by_id = _ref_images_by_id()
    loader = _loader(ds)
    loader.index_sampler = pool.sampler
    batches = list(loader)
    counts = {}
    k = 3
    for start in range(0, len(batches) - len(batches) % k, k):
        blk = batches[start:start + k]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *blk)
        dev = shard_batch(stacked, mesh, stacked=True)
        dev = pool.attach(dev, stacked.image_ids)
        want = np.stack([b.imgs if b.imgs is not None else
                         np.stack([by_id[int(i)] for i in b.image_ids])
                         for b in blk])
        np.testing.assert_array_equal(np.asarray(dev.imgs), want)
        for i in stacked.image_ids.ravel():
            counts[int(i)] = counts.get(int(i), 0) + 1
    # 2 passes over each 16-image segment emit 32 ids, trimmed to whole
    # dispatch blocks (granule 8*3=24) -> 24 per segment, 48 total,
    # so each image appears 1-2x
    assert sum(counts.values()) == 48
    assert set(counts.values()) <= {1, 2}
    pool.close()


def test_rotating_pool_stale_fallback_renders_host():
    """Abandoning an epoch mid-cycle then starting a new one must not
    corrupt images: the fallback renders on host and self-heals."""
    mesh = create_mesh((-1, 1))
    ds = _dataset(render=True)
    pool = _rot_pool(ds, mesh)
    by_id = _ref_images_by_id()
    loader = _loader(ds)
    loader.index_sampler = pool.sampler

    it = iter(loader)
    b = next(it)
    dev = pool.attach(shard_batch(b, mesh), b.image_ids)
    np.testing.assert_array_equal(
        np.asarray(dev.imgs), np.stack([by_id[int(i)] for i in b.image_ids]))
    it = None  # abandon epoch 1 mid-cycle

    for b in loader:  # epoch 2 must still serve correct pixels throughout
        dev = pool.attach(shard_batch(b, mesh), b.image_ids)
        np.testing.assert_array_equal(
            np.asarray(dev.imgs),
            np.stack([by_id[int(i)] for i in b.image_ids]))
    pool.close()


def test_rotating_pool_validates_sizes():
    mesh = create_mesh((-1, 1))
    ds = _dataset(render=True)
    with pytest.raises(ValueError, match="segment_size"):
        RotatingDevicePool(ds, mesh, segment_size=1000, batch_size=8)
    with pytest.raises(ValueError, match="dispatch"):
        RotatingDevicePool(ds, mesh, segment_size=8, batch_size=8,
                           block_batches=4)
