"""Unit tests for scripts/run_model.py's pure parsing layer.

The scene-graph-JSON -> padded-sample path (reference run_model.py:19-52's
input format and auto_create_graphs at run_model.py:56+) is the bug-prone
host-side part of the CLI; the device forward it feeds is covered by the
GAN tests.
"""
import numpy as np

from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.data.vocab import build_clevr_vocab
from scripts.run_model import (
    CLEVR_REL_MAP,
    auto_create_graphs,
    graph_to_sample,
)


def _cfg():
    cfg = Config()
    cfg.dataset = "packed_clevr_syn"
    cfg.vocab = build_clevr_vocab()
    cfg.finalize()
    return cfg


def test_graph_to_sample_maps_clevr_relations():
    cfg = _cfg()
    vocab = cfg.vocab
    sg = {
        "objects": [
            {"shape": "cube", "color": "brown", "material": "metal",
             "size": "large"},
            {"shape": "sphere", "color": "red", "material": "rubber",
             "size": "small"},
        ],
        # relationships[name][i] lists j with (i, name, j)
        "relationships": {"right": [[1], []], "behind": [[], [0]]},
    }
    rng = np.random.default_rng(0)
    objs, triplets, conv_counts, ttype = graph_to_sample(
        sg, vocab, cfg, None, rng)

    assert objs.shape == (2, len(vocab["attributes"]))
    attr_names = list(vocab["attributes"])
    assert objs[0, attr_names.index("shape")] \
        == vocab["attributes"]["shape"]["cube"]
    assert objs[1, attr_names.index("color")] \
        == vocab["attributes"]["color"]["red"]

    # the two authored edges survive with the mapped predicate ids
    p2i = vocab["pred_name_to_idx"]
    as_tuples = {tuple(t) for t in triplets.tolist()}
    assert (0, p2i[CLEVR_REL_MAP["right"]], 1) in as_tuples
    assert (1, p2i[CLEVR_REL_MAP["behind"]], 0) in as_tuples
    assert triplets.shape[0] == ttype.shape[0]
    # (P, P+1): converse-sample tallies + the no-sample column
    assert conv_counts.shape == (len(p2i), len(p2i) + 1)


def test_graph_to_sample_unmapped_relation_passthrough():
    """A relation already in the framework's vocabulary bypasses the CLEVR
    alias map."""
    cfg = _cfg()
    vocab = cfg.vocab
    sg = {
        "objects": [
            {"shape": "cube", "color": "brown", "material": "metal",
             "size": "large"},
            {"shape": "sphere", "color": "red", "material": "rubber",
             "size": "small"},
        ],
        "relationships": {"__above__": [[1], []]},
    }
    _, triplets, _, _ = graph_to_sample(
        sg, vocab, cfg, None, np.random.default_rng(0))
    p = vocab["pred_name_to_idx"]["__above__"]
    assert (0, p, 1) in {tuple(t) for t in triplets.tolist()}


def test_auto_create_graphs_densities():
    rng = np.random.default_rng(0)
    graphs = auto_create_graphs(6, rng)
    assert len(graphs) == 3  # sparse / dense / hyper
    counts = []
    for sg in graphs:
        assert len(sg["objects"]) == 6
        n = sum(len(js) for per in sg["relationships"].values()
                for js in per)
        # no self-edges, indices in range
        for per in sg["relationships"].values():
            for i, js in enumerate(per):
                assert i not in js
                assert all(0 <= j < 6 for j in js)
        counts.append(n)
    assert counts[0] < counts[1] < counts[2]
