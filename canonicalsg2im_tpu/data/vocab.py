"""Vocabulary construction shared by all datasets.

Mirrors the reference's vocab layout: ``vocab["attributes"]`` maps attribute
name -> {label name -> index}, ``pred_name_to_idx``/``pred_idx_to_name`` carry
the predicates including the meta relations (``__padding__``, ``__in_image__``)
and the six spatial augmented relations
(`sg2im/data/base_dataset.py:14-15,152-161`;
CLEVR attribute tables: `sg2im/data/packed_clevr_dialog.py:120-143`).
"""
from __future__ import annotations

META_RELATIONS = ["__padding__", "__in_image__"]
AUGMENTED_RELATIONS = [
    "__below__", "__above__", "__left of__", "__right of__",
    "__inside__", "__surrounding__",
]

CLEVR_ATTRIBUTES = {
    "shape": {"__image__": 0, "cube": 1, "sphere": 2, "cylinder": 3},
    "color": {"__image__": 0, "gray": 1, "red": 2, "blue": 3, "green": 4,
              "brown": 5, "purple": 6, "cyan": 7, "yellow": 8},
    "material": {"__image__": 0, "rubber": 1, "metal": 2},
    "size": {"__image__": 0, "small": 1, "large": 2},
}


def register_relations(vocab: dict, extra_relations=()) -> dict:
    """Add meta + augmented (+dataset-specific) relations to the vocab in the
    reference's registration order (base_dataset.py:152-161)."""
    vocab.setdefault("pred_name_to_idx", {})
    vocab.setdefault("pred_idx_to_name", [])
    for p in META_RELATIONS + AUGMENTED_RELATIONS + list(extra_relations):
        if p not in vocab["pred_name_to_idx"]:
            existing = list(vocab["pred_name_to_idx"].values()) + [-1]
            vocab["pred_name_to_idx"][p] = max(existing) + 1
            vocab["pred_idx_to_name"].append(p)
    return vocab


def build_clevr_vocab() -> dict:
    """The 4-attribute CLEVR vocab (packed_clevr_dialog.py:113-143)."""
    vocab: dict = {"use_object_embedding": False}
    register_relations(vocab)
    vocab["attributes"] = {k: dict(v) for k, v in CLEVR_ATTRIBUTES.items()}
    vocab["reverse_attributes"] = {
        attr: {v: k for k, v in table.items()}
        for attr, table in vocab["attributes"].items()
    }
    vocab["object_name_to_idx"] = {}
    ind = 0
    for attr, table in vocab["attributes"].items():
        for label in table:
            key = label if ind == 0 else f"{label}_{ind}"
            vocab["object_name_to_idx"][key] = ind
            ind += 1
    vocab["object_idx_to_name"] = {v: k for k, v in vocab["object_name_to_idx"].items()}
    return vocab


def non_meta_relation_ids(vocab: dict):
    meta = {vocab["pred_name_to_idx"][p] for p in META_RELATIONS}
    return sorted(set(vocab["pred_name_to_idx"].values()) - meta)
