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


def restore_checkpoint(path: str, like: Dict[str, Any] | None = None):
    """Returns (state tree, counters dict). ``like`` restores into matching
    array types/shapes when given."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    state = payload["state"]
    if like is not None:
        state = flax.serialization.from_state_dict(like, state)
    return state, payload.get("counters", {"t": 0, "epoch": 0})
