"""Checkpointing — one pytree per step, like the reference's single
``itr_<t>.pt`` dict (scripts/train.py:488-519): model + all discriminator
params, every optimizer state, the vocab, and counters. Serialized with flax
msgpack; config rides alongside as ``run_args.json``.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import flax.serialization
import jax


def save_checkpoint(path: str, tree: Dict[str, Any], *, vocab=None,
                    counters=None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"state": jax.device_get(flax.serialization.to_state_dict(tree))}
    if counters is not None:
        payload["counters"] = dict(counters)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    if vocab is not None:
        with open(path + ".vocab.json", "w") as f:
            json.dump(vocab, f)


def restore_checkpoints(gan_path: str, graph_path: str, like):
    """Cross-checkpoint surgery (reference restore_checkpoints,
    scripts/train.py:63-101): start from a GAN checkpoint, then overlay the
    SG->Layout subtree (params + canonical weights) from a separately trained
    graph checkpoint. Mask-discriminator input layers whose shapes disagree
    keep the freshly initialized values (the reference pops those keys and
    loads strict=False)."""
    import numpy as np

    state, counters = restore_checkpoint(gan_path, like=like)
    graph_state, _ = restore_checkpoint(graph_path, like=None)

    def find_subtree(tree, key):
        if isinstance(tree, dict):
            if key in tree:
                return tree[key]
            for v in tree.values():
                found = find_subtree(v, key)
                if found is not None:
                    return found
        return None

    graph_params = find_subtree(graph_state, "sg_to_layout")
    if graph_params is None:
        # layout-only checkpoints store the model at params root
        graph_params = find_subtree(graph_state, "params")

    def overlay(dst, src):
        out = dict(dst)
        for k, v in (src or {}).items():
            if k in out and isinstance(v, dict) and isinstance(out[k], dict):
                out[k] = overlay(out[k], v)
            elif k in out and np.shape(out[k]) == np.shape(v):
                out[k] = v
        return out

    g = state.g.replace(params=overlay(
        state.g.params,
        {"sg_to_layout": graph_params} if graph_params else {}))
    return state.replace(g=g), {"t": 0, "epoch": 0}


def restore_checkpoint(path: str, like: Dict[str, Any] | None = None):
    """Returns (state tree, counters dict). ``like`` restores into matching
    array types/shapes when given; a checkpoint whose leaf shapes disagree
    with ``like`` raises instead of silently corrupting the run (the
    reference hard-raises on restore failure, scripts/train.py:57-59)."""
    import numpy as np

    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    state = payload["state"]
    if like is not None:
        state = flax.serialization.from_state_dict(like, state)
        for (path_a, a), b in zip(
                jax.tree_util.tree_flatten_with_path(state)[0],
                jax.tree_util.tree_leaves(like)):
            if np.shape(a) != np.shape(b):
                name = "/".join(str(p) for p in path_a)
                raise ValueError(
                    f"checkpoint leaf {name!r} has shape {np.shape(a)} but "
                    f"the model expects {np.shape(b)} — wrong config for "
                    "this checkpoint?")
    return state, payload.get("counters", {"t": 0, "epoch": 0})
