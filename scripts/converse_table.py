"""Print the learned converse/transitivity tables of a saved checkpoint,
plus an argmax-vs-ground-truth verdict per relation.

The WSGC converse matrix is a model parameter
(`converse_candidates_weights`, models/sg2layout.py:91, mirroring reference
sg2im/model.py:33); the trainer prints these tables at checkpoint time, but
post-hoc analysis of a run's basin (docs/RESULTS.md "Converse outcome")
needs them straight off the .ckpt without reconstructing the model:

  python -m scripts.converse_table out/wsgc_gan_256_r4/itr_10000.ckpt

Works for both stages (layout-stage TrainState and GAN-stage GanStates
trees) by locating the parameter anywhere in the serialized tree. Exit
status is the number of WRONG relations (0 = full six-relation recovery),
so shell arms can gate on it.
"""
from __future__ import annotations

import json
import sys

import numpy as np

from canonicalsg2im_tpu.data.vocab import non_meta_relation_ids
from canonicalsg2im_tpu.graphs.converse import format_probability_tables

TRUE_CONVERSE = {
    "__below__": "__above__", "__above__": "__below__",
    "__left of__": "__right of__", "__right of__": "__left of__",
    "__inside__": "__surrounding__", "__surrounding__": "__inside__",
}


def _find(tree, key, in_params=False):
    """Leaf named ``key`` under a ``params`` subtree. The same leaf name
    exists inside ``opt_state`` (Adam mu/nu) — reading those instead of the
    parameter produces a silently-wrong near-uniform table, which is how the
    first cut of this script misread conv_rec_coco_r4/itr_2000."""
    if isinstance(tree, dict):
        if in_params and key in tree and not isinstance(tree[key], dict):
            return tree[key]
        for k, v in tree.items():
            if k == "opt_state":
                continue
            hit = _find(v, key, in_params or k == "params")
            if hit is not None:
                return hit
    return None


def checkpoint_tables(path: str):
    """(conv_weights, trans_weights, vocab) from a .ckpt + sidecar vocab."""
    import flax.serialization

    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    with open(path + ".vocab.json") as f:
        vocab = json.load(f)
    conv = _find(payload["state"], "converse_candidates_weights")
    trans = _find(payload["state"], "trans_candidates_weights")
    if conv is not None:
        # checkpoints store the RAW parameter; every consumer (sampler,
        # trainer diagnostics) sees it through triu+triu.T symmetrization
        from canonicalsg2im_tpu.models.sg2layout import symmetrize_converse

        conv = np.asarray(symmetrize_converse(np.asarray(conv)))
    return conv, trans, vocab


def verdict_lines(conv, vocab, non_meta):
    """Argmax of the sampler's own probability rows vs the geometric truth
    ("No Edge" counts as a candidate — a relation whose argmax is No Edge has
    not recovered its converse either)."""
    from canonicalsg2im_tpu.graphs.converse import converse_probability_table

    table = converse_probability_table(np.asarray(conv), vocab, non_meta)
    lines, wrong = [], 0
    for name, row in table.items():
        if name not in TRUE_CONVERSE:
            continue
        best, p = max(row.items(), key=lambda kv: kv[1])
        ok = best == TRUE_CONVERSE[name]
        wrong += not ok
        lines.append(f"{name}: argmax {best} p={p:.3f} "
                     f"{'ok' if ok else 'WRONG (true ' + TRUE_CONVERSE[name] + ')'}")
    return lines, wrong


def main(argv=None):
    path = (argv or sys.argv[1:])[0]
    conv, trans, vocab = checkpoint_tables(path)
    non_meta = tuple(non_meta_relation_ids(vocab))
    print(format_probability_tables(conv, trans, vocab, non_meta))
    lines, wrong = verdict_lines(conv, vocab, non_meta)
    print("argmax vs truth:")
    for ln in lines:
        print(" ", ln)
    print(f"{6 - wrong}/6 relations correct")
    return wrong


if __name__ == "__main__":
    sys.exit(main())
