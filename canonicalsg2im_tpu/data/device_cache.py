"""Device-resident image pool for fixed datasets.

The reference's DataLoader re-reads and re-transforms every image each epoch
(`sg2im/data/coco.py:253-311` via torch DataLoader workers); images do not
depend on the canonicalization state, so that work — and, on this host, the
recurring ~12 MB/step image upload over the host<->TPU network tunnel that
caps the GAN CLI at ~8 imgs/s against an ~80 imgs/s device step — is pure
waste after the first epoch.

`DeviceImagePool` uploads each sample's image ONCE, keeps the pool resident
in HBM (replicated over the mesh), and serves per-batch images by an
on-device gather keyed by `Batch.image_ids`. The host loader then runs with
rendering/decoding disabled: per epoch it only re-canonicalizes (the
model->loader converse feedback stays exactly as live as before — triplets,
conv_counts and triplet_type are still built fresh per draw) and uploads the
small graph tensors (~0.1 MB/step at 256^2 batch 16 vs ~12 MB with images).

The pool stores float32 by default so attached batches are bit-identical to
loader-rendered ones (equivalence pinned in tests/test_device_cache.py);
`dtype="bfloat16"` halves HBM/upload at a precision cost and is decoded back
to float32 during the gather so the train step's signature (and its cached
XLA executable) is unchanged.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def _disable_rendering(dataset) -> None:
    if not hasattr(dataset, "render_images"):
        raise ValueError(
            f"{type(dataset).__name__} has no render_images attribute; "
            "DeviceImagePool cannot skip its per-epoch image loads")
    dataset.render_images = False


class DeviceImagePool:
    """Upload a fixed dataset's images once; gather per-batch on device.

    Args:
      dataset: any dataset yielding `SceneGraphSample`s with a stable
        `image_id` per index and a `render_images` attribute.
      mesh: the run's device mesh; the pool is replicated over it and
        gathers emit batch-dim-sharded (`P('data')`) outputs, matching
        `shard_batch`'s placement.
      chunk: host->device upload granularity (bounds host peak memory).
      dtype: pool storage dtype (default float32 = bit-exact).
      disable_rendering: flip `dataset.render_images = False` after the
        build so subsequent loader epochs skip image work entirely.
    """

    def __init__(self, dataset, mesh, *, chunk: int = 256,
                 dtype: str | np.dtype = "float32",
                 disable_rendering: bool = True,
                 progress: bool = False):
        self.mesh = mesh
        self._store_dtype = jnp.dtype(dtype)
        repl = NamedSharding(mesh, P())
        row_of_id = {}
        parts = []
        n = len(dataset)
        for start in range(0, n, chunk):
            imgs = []
            for i in range(start, min(n, start + chunk)):
                s = dataset[i]
                if s.image is None:
                    raise ValueError(
                        "dataset returned image=None; build the pool before "
                        "disabling rendering")
                row_of_id[int(s.image_id)] = len(row_of_id)
                imgs.append(s.image)
            arr = np.stack(imgs).astype(self._store_dtype)
            parts.append(jax.device_put(arr, repl))
            if progress:
                print(f"DeviceImagePool: uploaded {min(n, start + chunk)}/{n} "
                      f"images ({arr.nbytes / 1e6:.1f} MB chunk)")
        self.pool = (parts[0] if len(parts) == 1
                     else jnp.concatenate(parts, axis=0))
        self.pool = jax.device_put(self.pool, repl)  # pin placement post-concat
        # image_id -> pool row as a vectorized lookup table when ids are
        # dense smallish ints; dict fallback otherwise
        ids = np.fromiter(row_of_id.keys(), dtype=np.int64, count=len(row_of_id))
        self._lut: Optional[np.ndarray] = None
        if ids.size and ids.min() >= 0 and ids.max() < 4 * ids.size + 1024:
            lut = np.full(int(ids.max()) + 1, -1, dtype=np.int32)
            lut[ids] = np.fromiter(row_of_id.values(), dtype=np.int32,
                                   count=len(row_of_id))
            self._lut = lut
        self._row_of_id = row_of_id
        self._gather_cache = {}
        if disable_rendering:
            _disable_rendering(dataset)

    def nbytes(self) -> int:
        return int(np.prod(self.pool.shape)) * self.pool.dtype.itemsize

    def _rows(self, image_ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(image_ids)
        if self._lut is not None:
            if (ids < 0).any() or (ids >= self._lut.size).any():
                raise KeyError("image_id not in pool")
            rows = self._lut[ids]
            if (rows < 0).any():
                raise KeyError("image_id not in pool")
            return rows
        return np.vectorize(self._row_of_id.__getitem__,
                            otypes=[np.int32])(ids)

    def _gather_fn(self, lead_axes: int):
        fn = self._gather_cache.get(lead_axes)
        if fn is None:
            out_s = NamedSharding(
                self.mesh, P(*([None] * (lead_axes - 1) + ["data"])))

            def gather(pool, rows):
                return pool[rows].astype(jnp.float32)

            fn = jax.jit(gather, out_shardings=out_s)
            self._gather_cache[lead_axes] = fn
        return fn

    def gather(self, image_ids: np.ndarray):
        """(..., B) image_ids -> (..., B, H, W, 3) float32 device images,
        sharded along the batch dim like `shard_batch` output."""
        rows = self._rows(image_ids)
        return self._gather_fn(rows.ndim)(self.pool, rows)

    def attach(self, dev_batch, host_image_ids: np.ndarray):
        """Fill `imgs` on a device-resident Batch from the pool.

        `host_image_ids` must be the HOST copy of the batch's image_ids
        (avoids a device->host readback in the feed path)."""
        return dev_batch._replace(imgs=self.gather(host_image_ids))
