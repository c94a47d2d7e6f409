"""Fixed-shape batching for XLA.

The reference pads each batch to the *per-batch max* number of objects and
triplets (`sg2im/data/base_dataset.py:164-241`), which under jit would force a
recompile for nearly every batch. Here batches are padded up to a small ladder
of bucket sizes so the whole run touches only a handful of compiled shapes
(SURVEY.md §5.7). The padded-batch contract is otherwise identical to the
reference collate output:

  objs pad 0, boxes pad [-1,-1,-1,-1], triplets pad [0, __padding__, 0],
  triplet_type pad 0 (`sg2im/data/packed_clevr_dialog.py:286-334`).

Arrays are NumPy on the host; the trainer moves them to device. Images are
NHWC (TPU-native), not the reference's NCHW.
"""
from __future__ import annotations

import threading
import queue as queue_mod
from dataclasses import dataclass
from typing import Iterator, NamedTuple, Optional, Sequence

import numpy as np


class Batch(NamedTuple):
    """Device-bound batch. Mirrors the reference batch tuple
    (SURVEY.md §2.7) with images in NHWC."""

    imgs: Optional[np.ndarray]        # (B, H, W, 3) float32 in [-1, 1], or None
    objs: np.ndarray                  # (B, O, A) int32 attribute ids; dummy/pad rows are 0
    boxes: np.ndarray                 # (B, O, 4) float32 xywh in [0,1]; pad rows -1
    triplets: np.ndarray              # (B, T, 3) int32 [s, p, o]
    conv_counts: np.ndarray           # (B, P, P+1) float32 converse draw tallies
    triplet_type: np.ndarray          # (B, T) int32 edge-type tags
    masks: Optional[np.ndarray]       # (B, O, M, M) float32 or None
    image_ids: np.ndarray             # (B,) int64


@dataclass
class SceneGraphSample:
    """One canonicalized scene, pre-padding."""

    image: Optional[np.ndarray]       # (H, W, 3) float32 or None
    objs: np.ndarray                  # (O, A) int
    boxes: np.ndarray                 # (O, 4) float32 xywh
    triplets: np.ndarray              # (T, 3) int
    conv_counts: np.ndarray           # (P, P+1) float32
    triplet_type: np.ndarray          # (T,) int
    masks: Optional[np.ndarray]       # (O, M, M) or None
    image_id: int


_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_fetch(idx: int, converse_weights):
    if converse_weights is not None:
        _WORKER_DATASET.converse_candidates_weights = converse_weights
    return _WORKER_DATASET[idx]


def bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"size {n} exceeds largest bucket {buckets[-1]}")


def pad_batch(samples: Sequence[SceneGraphSample], padding_pred: int,
              bucket_objects: Sequence[int], bucket_triplets: Sequence[int],
              floor_objects: int = 0, floor_triplets: int = 0) -> Batch:
    B = len(samples)
    O = max(bucket_for(max(s.objs.shape[0] for s in samples), bucket_objects),
            floor_objects)
    T = max(bucket_for(max(max(s.triplets.shape[0], 1) for s in samples),
                       bucket_triplets), floor_triplets)
    A = samples[0].objs.shape[1]
    P1 = samples[0].conv_counts.shape[1]

    objs = np.zeros((B, O, A), dtype=np.int32)
    boxes = np.full((B, O, 4), -1.0, dtype=np.float32)
    triplets = np.zeros((B, T, 3), dtype=np.int32)
    triplets[:, :, 1] = padding_pred
    triplet_type = np.zeros((B, T), dtype=np.int32)
    conv_counts = np.zeros((B, P1 - 1, P1), dtype=np.float32)
    image_ids = np.zeros((B,), dtype=np.int64)

    has_img = samples[0].image is not None
    has_masks = samples[0].masks is not None
    imgs = (np.zeros((B,) + samples[0].image.shape, dtype=np.float32)
            if has_img else None)
    masks = (np.zeros((B, O) + samples[0].masks.shape[1:], dtype=np.float32)
             if has_masks else None)

    for i, s in enumerate(samples):
        o, t = s.objs.shape[0], s.triplets.shape[0]
        objs[i, :o] = s.objs
        boxes[i, :o] = s.boxes
        if t:
            triplets[i, :t] = s.triplets
            triplet_type[i, :t] = s.triplet_type
        conv_counts[i] = s.conv_counts
        image_ids[i] = s.image_id
        if has_img:
            imgs[i] = s.image
        if has_masks:
            masks[i, :o] = s.masks
    return Batch(imgs, objs, boxes, triplets, conv_counts, triplet_type, masks,
                 image_ids)


class BucketedLoader:
    """Minimal host data loader: shuffles, canonicalizes (inside the dataset's
    __getitem__), pads to buckets, and optionally prefetches on a thread.

    The trainer pushes updated converse weights here each step
    (the model->dataset feedback loop of scripts/train.py:274-278,383-385);
    they are applied before each sample is drawn.
    """

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 bucket_objects: Sequence[int] = (8, 16, 32, 64, 128, 256, 512, 1024),
                 bucket_triplets: Sequence[int] = (16, 32, 64, 128, 256, 512, 1024,
                                                   2048, 4096, 8192, 16384,
                                                   32768, 65536, 131072,
                                                   262144, 524288, 1048576),
                 seed: int = 0, drop_last: bool = True, prefetch: int = 2,
                 num_workers: int = 4, worker_type: str = "thread",
                 ratchet_buckets: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.bucket_objects = tuple(bucket_objects)
        self.bucket_triplets = tuple(bucket_triplets)
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.prefetch = prefetch
        # Per-sample canonicalization is many small NumPy calls (GIL-heavy).
        # 'thread' workers overlap modestly; 'process' workers (spawned, the
        # reference's DataLoader-worker analogue) sidestep the GIL — the
        # current converse weights ride along with every task.
        self.num_workers = num_workers
        self.worker_type = worker_type
        # Monotonic bucket floors: once a batch lands in a bucket, every later
        # batch pads at least up to it. Mixed bucket shapes otherwise split
        # the trainer's K-step dispatch blocks into odd-length lax.scan
        # programs — each a separate XLA compile (tens of minutes apiece over
        # this chip's network tunnel) — so a two-bucket epoch can spend hours
        # compiling. The ratchet collapses a run to its largest working shape
        # after at most one step per ascending bucket; padding rows are
        # masked everywhere by the batch contract, so this is shape-only.
        self.ratchet_buckets = ratchet_buckets
        self._floor_objects = 0
        self._floor_triplets = 0
        self._pool = None
        self._lock = threading.Lock()
        self._pending_weights: Optional[np.ndarray] = None
        # Optional epoch-order override: callable(rng) -> index array.
        # RotatingDevicePool installs its segment-blocked sampler here.
        self.index_sampler = None

    def set_converse_weights(self, weights: np.ndarray) -> None:
        with self._lock:
            self._pending_weights = np.asarray(weights)

    def _apply_pending_weights(self) -> None:
        with self._lock:
            w, self._pending_weights = self._pending_weights, None
        if w is not None and hasattr(self.dataset, "converse_candidates_weights"):
            self.dataset.converse_candidates_weights = w

    def _epoch_batches(self) -> Iterator[Batch]:
        n = len(self.dataset)
        if self.index_sampler is not None:
            order = np.asarray(self.index_sampler(self.rng))
            n = order.size
        else:
            order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        padding_pred = self.dataset.vocab["pred_name_to_idx"]["__padding__"]
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                return
            self._apply_pending_weights()
            if self.worker_type == "process" and self.num_workers > 1:
                if self._pool is None:
                    import multiprocessing as mp

                    ctx = mp.get_context("spawn")
                    self._pool = ctx.Pool(
                        self.num_workers, initializer=_init_worker,
                        initargs=(self.dataset,))
                w = getattr(self.dataset, "converse_candidates_weights", None)
                samples = self._pool.starmap(
                    _worker_fetch, [(int(i), w) for i in idx])
            elif self.num_workers > 1 and len(idx) > 1:
                if self._pool is None:
                    from concurrent.futures import ThreadPoolExecutor

                    self._pool = ThreadPoolExecutor(self.num_workers)
                samples = list(self._pool.map(
                    lambda i: self.dataset[int(i)], idx))
            else:
                samples = [self.dataset[int(i)] for i in idx]
            b = pad_batch(samples, padding_pred,
                          self.bucket_objects, self.bucket_triplets,
                          floor_objects=self._floor_objects,
                          floor_triplets=self._floor_triplets)
            if self.ratchet_buckets:
                self._floor_objects = max(self._floor_objects,
                                          b.objs.shape[1])
                self._floor_triplets = max(self._floor_triplets,
                                           b.triplets.shape[1])
            yield b

    def __iter__(self) -> Iterator[Batch]:
        if self.prefetch <= 0:
            yield from self._epoch_batches()
            return
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def worker():
            try:
                for b in self._epoch_batches():
                    # bounded put so an abandoned iterator (consumer broke
                    # out early, e.g. the val loop) doesn't pin this thread
                    # + prefetch batches forever on a full queue
                    while not stop.is_set():
                        try:
                            q.put(b, timeout=0.2)
                            break
                        except queue_mod.Full:
                            continue
                    if stop.is_set():
                        return
                q.put(sentinel)
            except BaseException as e:  # propagate to the consumer
                if not stop.is_set():
                    q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # runs on generator close/GC when the consumer abandons the loop
            stop.set()

    def close(self) -> None:
        if self._pool is not None:
            try:
                if hasattr(self._pool, "terminate"):  # mp.Pool
                    self._pool.terminate()
                    self._pool.join()
                else:  # ThreadPoolExecutor
                    self._pool.shutdown(wait=False)
            except Exception:
                pass
            self._pool = None

    def __del__(self):
        self.close()

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)
