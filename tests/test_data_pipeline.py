"""Canonicalization + bucketed batching contract tests."""
import numpy as np

from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.data import BucketedLoader, get_dataset
from canonicalsg2im_tpu.data.canonicalize import location_triplets
from canonicalsg2im_tpu.data.synthetic_clevr import SyntheticClevrDataset
from canonicalsg2im_tpu.data.vocab import build_clevr_vocab


def _naive_location_triplets(boxes, centers, real_mask, vocab):
    """Literal port of the reference's pairwise loop
    (base_dataset.py:35-87) minus the per-relation minimal reduction."""
    p2i = vocab["pred_name_to_idx"]
    out = []
    real = np.nonzero(real_mask)[0]
    for s in real:
        for o in real:
            if s == o:
                continue
            sx0, sy0, sw, sh = boxes[s]
            sx1, sy1 = sx0 + sw / 2, sy0 + sh / 2
            ox0, oy0, ow, oh = boxes[o]
            ox1, oy1 = ox0 + ow / 2, oy0 + oh / 2
            d = centers[s] - centers[o]
            if sx0 < ox0 and sx1 > ox1 and sy0 < oy0 and sy1 > oy1:
                out.append([s, p2i["__surrounding__"], o])
            elif sx0 > ox0 and sx1 < ox1 and sy0 > oy0 and sy1 < oy1:
                out.append([s, p2i["__inside__"], o])
            else:
                if d[0] > 0:
                    out.append([s, p2i["__right of__"], o])
                elif d[0] < 0:
                    out.append([s, p2i["__left of__"], o])
                if d[1] > 0:
                    out.append([s, p2i["__below__"], o])
                elif d[1] < 0:
                    out.append([s, p2i["__above__"], o])
    return out


def test_location_triplets_match_naive_prereduction():
    from canonicalsg2im_tpu.graphs import triplets_to_minimal

    vocab = build_clevr_vocab()
    rng = np.random.default_rng(0)
    n = 9
    boxes = np.concatenate(
        [rng.uniform(0, 0.8, (n, 2)), rng.uniform(0.05, 0.2, (n, 2))], axis=1
    ).astype(np.float32)
    centers = boxes[:, :2] + boxes[:, 2:] / 2
    real = np.ones(n, dtype=bool)

    got = location_triplets(boxes, centers, real, vocab)
    naive = np.asarray(_naive_location_triplets(boxes, centers, real, vocab))

    # per relation, the vectorized result equals minimal(naive)
    got_arr = np.asarray(got)
    for p in set(naive[:, 1]):
        naive_p = naive[naive[:, 1] == p]
        want = np.asarray(triplets_to_minimal(naive_p))
        have = got_arr[got_arr[:, 1] == p]
        want_set = {tuple(t) for t in want.tolist()}
        have_set = {tuple(t) for t in have.tolist()}
        assert want_set == have_set, f"relation {p}"


def test_synthetic_dataset_sample_contract():
    ds = SyntheticClevrDataset(num_samples=8, min_objects=3, max_objects=6,
                               learned_converse=True, learned_transitivity=True,
                               include_dummies=True, seed=7)
    s = ds[0]
    O = s.objs.shape[0]
    assert s.objs.shape[1] == 4
    assert s.boxes.shape == (O, 4)
    assert s.triplets.shape[1] == 3
    assert s.triplet_type.shape[0] == s.triplets.shape[0]
    P = len(ds.vocab["pred_name_to_idx"])
    assert s.conv_counts.shape == (P, P + 1)
    # dummy row is all zeros and box -1
    assert (s.objs[-1] == 0).all()
    assert (s.boxes[-1] == -1).all()
    # determinism
    s2 = ds[0]
    assert np.array_equal(s.triplets, s2.triplets)
    assert np.array_equal(s.objs, s2.objs)


def test_bucketed_loader_shapes():
    cfg = Config(dataset="packed_clevr_syn", num_train_samples=16, batch_size=4,
                 min_objects=3, max_objects=6, learned_converse=True,
                 image_size=(64, 64))
    ds = get_dataset(cfg.dataset, "train", cfg)
    loader = BucketedLoader(ds, cfg.batch_size, bucket_objects=(8, 16),
                            bucket_triplets=(32, 64, 128), seed=0, prefetch=0)
    pad_pred = ds.vocab["pred_name_to_idx"]["__padding__"]
    batches = list(loader)
    assert len(batches) == 4
    for b in batches:
        B, O, A = b.objs.shape
        assert B == 4 and O in (8, 16) and A == 4
        assert b.boxes.shape == (B, O, 4)
        assert b.triplets.shape[0] == B and b.triplets.shape[2] == 3
        assert b.triplets.shape[1] in (32, 64, 128)
        # padding triplets carry the padding predicate and zero endpoints
        t = b.triplets
        pad_rows = t[:, :, 1] == pad_pred
        assert (t[..., 0][pad_rows] == 0).all()
        assert b.imgs.shape == (B, 64, 64, 3)


def test_loader_weight_feedback():
    ds = SyntheticClevrDataset(num_samples=4, learned_converse=True, seed=1)
    loader = BucketedLoader(ds, 2, prefetch=0)
    P = len(ds.vocab["pred_name_to_idx"])
    w = np.full((P, P), 3.14)
    loader.set_converse_weights(w)
    next(iter(loader))
    assert np.allclose(ds.converse_candidates_weights, 3.14)


def test_canonical_graph_sampling_preserves_semantics():
    """sample_graph drops converse directions / subsets of transitive edges
    but never invents new endpoints (canonical_packed_coco.py:366-404)."""
    from canonicalsg2im_tpu.data.canonicalize import sample_canonical_graph

    vocab = build_clevr_vocab()
    p2i = vocab["pred_name_to_idx"]
    tri = [[0, p2i["__left of__"], 1], [1, p2i["__left of__"], 2],
           [0, p2i["__left of__"], 2], [2, p2i["__right of__"], 0],
           [0, p2i["__above__"], 1]]
    rng = np.random.default_rng(0)
    seen_sizes = set()
    for _ in range(16):
        out = sample_canonical_graph(tri, vocab, rng)
        seen_sizes.add(len(out))
        pairs = {(s, o) for s, _, o in tri}
        for s, p, o in out:
            assert (s, o) in pairs or (o, s) in pairs
    assert len(seen_sizes) > 1  # actually samples different variants


def test_process_worker_loader():
    """Spawned process workers (the reference's DataLoader-worker analogue)
    produce identical batches to the in-process path."""
    ds = SyntheticClevrDataset(num_samples=8, min_objects=3, max_objects=5,
                               learned_converse=True, render_images=False,
                               seed=3)
    a = BucketedLoader(ds, 4, seed=0, prefetch=0, num_workers=1)
    b = BucketedLoader(ds, 4, seed=0, prefetch=0, num_workers=2,
                       worker_type="process")
    try:
        for ba, bb in zip(a, b):
            assert np.array_equal(ba.objs, bb.objs)
            assert np.array_equal(ba.triplets, bb.triplets)
    finally:
        b.close()


def test_prefetch_worker_exits_on_abandoned_iteration():
    """Breaking out of a prefetching loader must release the producer
    thread (it used to block forever on q.put, pinning prefetched batches
    for the life of the process — one leak per abandoned val loop)."""
    import gc
    import threading
    import time

    ds = SyntheticClevrDataset(num_samples=16, seed=3)
    # num_workers=1: no fetch pool, so any surviving thread IS the producer
    loader = BucketedLoader(ds, 2, prefetch=2, num_workers=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)  # worker started, queue filling
    it.close()  # consumer abandons -> generator finally -> stop event
    del it
    gc.collect()
    deadline = time.monotonic() + 5.0
    while threading.active_count() > before and time.monotonic() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"


def test_merge_default_ladders_uncaps_checkpoint_config():
    # run_args.json pins the training-time ladder; inference-time probes of
    # bigger graphs must get the current default top rungs back (the Config
    # method every inference CLI calls after Config.load)
    from canonicalsg2im_tpu.data.pipeline import bucket_for
    cfg = Config()
    cfg.bucket_triplets = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096,
                           8192, 16384, 32768, 65536)  # old training ladder
    cfg.bucket_objects = (8, 16, 24)  # custom rung must survive the merge
    cfg.merge_default_ladders()
    dflt = Config()
    assert cfg.bucket_triplets[-1] == dflt.bucket_triplets[-1]
    assert bucket_for(600_000, cfg.bucket_triplets) == 1048576
    assert 24 in cfg.bucket_objects  # custom rungs kept
    assert list(cfg.bucket_triplets) == sorted(cfg.bucket_triplets)


def test_synthetic_nested_fraction_gives_inside_surrounding_signal():
    """Scenes with a small box strictly inside a large one must emit
    __inside__/__surrounding__ location triplets (pure random placement
    almost never nests, leaving those converse REINFORCE rows unlearnable).
    Containment follows the reference's x0/"center" convention
    (base_dataset.py:46-49)."""
    import numpy as np

    from canonicalsg2im_tpu.data.synthetic_clevr import SyntheticClevrDataset

    ds = SyntheticClevrDataset(num_samples=100, min_objects=3, max_objects=8,
                               nested_fraction=1.0, render_images=False,
                               seed=0)
    p2i = ds.vocab["pred_name_to_idx"]
    for i in range(20):
        s = ds[i]
        preds = [int(t[1]) for t in np.asarray(s.triplets)]
        assert p2i["__inside__"] in preds, i
        assert p2i["__surrounding__"] in preds, i

    # fraction 0 keeps the old behavior: nesting is (almost) never emitted
    ds0 = SyntheticClevrDataset(num_samples=100, min_objects=3, max_objects=8,
                                nested_fraction=0.0, render_images=False,
                                seed=0)
    n = sum(int(t[1]) == p2i["__inside__"] for i in range(50)
            for t in np.asarray(ds0[i].triplets))
    assert n <= 2


def test_bucket_ratchet_converges_to_one_shape():
    """With ratchet_buckets the loader pads every batch at least up to the
    largest bucket seen, so a mixed-bucket epoch converges to ONE shape
    (each distinct shape is a separate multi-minute XLA compile of the
    trainer's K-step scan program). Without it, batches land in their
    natural buckets."""
    import numpy as np

    from canonicalsg2im_tpu.data.synthetic_clevr import SyntheticClevrDataset
    from canonicalsg2im_tpu.data.pipeline import BucketedLoader

    ds = SyntheticClevrDataset(num_samples=128, min_objects=3, max_objects=10,
                               learned_converse=True, learned_transitivity=True,
                               render_images=False, seed=0)

    shapes_nat = {(b.objs.shape[1], b.triplets.shape[1])
                  for b in BucketedLoader(ds, 8, seed=0, prefetch=0)}
    assert len(shapes_nat) >= 2  # the distribution genuinely mixes buckets

    ldr = BucketedLoader(ds, 8, seed=0, prefetch=0, ratchet_buckets=True)
    shapes = [(b.objs.shape[1], b.triplets.shape[1]) for b in ldr]
    # monotone non-decreasing in both axes...
    assert all(a <= b for a, b in zip(shapes, shapes[1:])) or True
    for (o1, t1), (o2, t2) in zip(shapes, shapes[1:]):
        assert o2 >= o1 and t2 >= t1
    # ...and the floor persists into the next epoch
    shapes2 = [(b.objs.shape[1], b.triplets.shape[1]) for b in ldr]
    assert all(s == shapes[-1] for s in shapes2), set(shapes2)
    # padding stays masked: pad rows are -1 boxes / 0 objs
    b = next(iter(ldr))
    assert np.all(b.boxes[b.objs[..., 0] == 0] == -1.0)
