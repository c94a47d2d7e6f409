"""Large-graph (triplet-axis) sharding: dp x graph-parallel mesh must match
the single-device result — the graph analogue of sequence parallelism
(SURVEY.md §5.7)."""
import jax
import numpy as np

from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.data import BucketedLoader, get_dataset
from canonicalsg2im_tpu.data.vocab import non_meta_relation_ids
from canonicalsg2im_tpu.parallel import create_mesh, replicate, shard_batch
from canonicalsg2im_tpu.train import create_layout_state, layout_train_step


def test_edge_sharded_step_matches_unsharded():
    cfg = Config(dataset="packed_clevr_syn", compute_dtype="float32",
                 num_train_samples=8, batch_size=2,
                 min_objects=8, max_objects=12, image_size=(32, 32),
                 gconv_num_layers=2, gconv_hidden_dim=64, gconv_dim=32,
                 embedding_dim=8, learned_transitivity=True)
    ds = get_dataset(cfg.dataset, "train", cfg)
    cfg.vocab = ds.vocab
    cfg.finalize()
    loader = BucketedLoader(ds, 2, seed=0, prefetch=0,
                            bucket_objects=(16,), bucket_triplets=(512,))
    batch = next(iter(loader))
    assert batch.triplets.shape[1] == 512
    non_meta = tuple(non_meta_relation_ids(cfg.vocab))
    rng = jax.random.PRNGKey(0)

    s_plain = create_layout_state(cfg, jax.random.PRNGKey(0))
    s_plain, m_plain, _ = layout_train_step(s_plain, batch, rng,
                                            non_meta_rels=non_meta)

    mesh = create_mesh((2, 4))  # 2-way data x 4-way graph parallel
    s_shard = replicate(create_layout_state(cfg, jax.random.PRNGKey(0)), mesh)
    sharded = shard_batch(batch, mesh, shard_graph=True)
    assert sharded.triplets.sharding.spec == jax.sharding.PartitionSpec(
        "data", "model")
    s_shard, m_shard, _ = layout_train_step(s_shard, sharded, rng,
                                            non_meta_rels=non_meta)

    np.testing.assert_allclose(float(m_plain["bbox_pred"]),
                               float(m_shard["bbox_pred"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_plain.params),
                    jax.tree.leaves(s_shard.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_shard_batch_stacked_places_data_on_axis1():
    """K-stacked scan batches: K replicated, batch dim (axis 1) on 'data'."""
    from canonicalsg2im_tpu.data.pipeline import Batch

    mesh = create_mesh((4, 2))
    K, B = 3, 8
    batch = Batch(
        imgs=None,
        objs=np.zeros((K, B, 4, 2), np.int32),
        boxes=np.zeros((K, B, 4, 4), np.float32),
        triplets=np.zeros((K, B, 16, 3), np.int32),
        conv_counts=np.zeros((K, B, 8, 9), np.float32),
        triplet_type=np.zeros((K, B, 16), np.int32),
        masks=None,
        image_ids=np.zeros((K, B), np.int64),
    )
    out = shard_batch(batch, mesh, stacked=True, shard_graph=True)
    spec_objs = out.objs.sharding.spec
    assert tuple(spec_objs)[:2] == (None, "data")
    spec_trip = out.triplets.sharding.spec
    assert tuple(spec_trip)[:3] == (None, "data", "model")
    # non-stacked keeps the old contract: leading dim on 'data'
    flat = jax.tree.map(lambda x: x[0] if x is not None else None, batch)
    out2 = shard_batch(flat, mesh)
    assert tuple(out2.objs.sharding.spec)[:1] == ("data",)
