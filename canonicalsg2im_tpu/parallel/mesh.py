"""Device mesh + sharding rules.

The reference's only parallelism is single-process multi-GPU DataParallel plus
a thread-pipe SyncBN (SURVEY.md §2.9). Here the same (and more) falls out of
the XLA SPMD partitioner: we build a ('data', 'model') mesh, shard every batch
tensor along 'data', replicate parameters, and jit the train step. Gradient
all-reduce and cross-replica BatchNorm statistics are collectives XLA inserts
on its own — batch-dim means inside a data-sharded jit ARE synchronized
BatchNorm, replacing the reference's 638-LoC sync_batchnorm package.

The 'model' axis is reserved for sharding the object/triplet axes of very
large packed graphs (the graph analogue of sequence parallelism, SURVEY.md
§5.7) and for spatially-sharded convolutions at high resolution.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(mesh_shape=(-1, 1), devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = mesh_shape
    if data == -1:
        data = len(devices) // model
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh, *, shard_graph: bool = False,
                stacked: bool = False):
    """Place every array of a Batch/pytree with its batch dim on 'data'.

    With ``stacked=True`` the pytree has a leading K (scan-steps) axis in
    front of the batch axis — K is replicated and axis 1 (the true batch
    dim) is sharded instead.

    With ``shard_graph=True`` the triplet axis is additionally sharded over
    the 'model' mesh axis — the graph analogue of sequence parallelism for
    packed scenes whose O(O^2) dense triplets exceed one chip (SURVEY.md
    §5.7). The GCN's gathers/MLPs then run edge-parallel and XLA inserts the
    psum over object segments on its own.
    """
    lead = (None,) if stacked else ()
    s = NamedSharding(mesh, P(*lead, "data"))
    if not shard_graph or not hasattr(batch, "triplets"):
        return jax.tree.map(
            lambda x: jax.device_put(x, s) if x is not None else None, batch)
    edge = NamedSharding(mesh, P(*lead, "data", "model"))
    moved = {}
    for name, x in batch._asdict().items():
        if x is None:
            moved[name] = None
        elif name in ("triplets", "triplet_type"):
            moved[name] = jax.device_put(x, edge)
        else:
            moved[name] = jax.device_put(x, s)
    return type(batch)(**moved)


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
