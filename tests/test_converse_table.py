"""scripts/converse_table.py: checkpoint -> converse tables + verdict."""
import json

import flax.serialization
import numpy as np

from scripts.converse_table import checkpoint_tables, verdict_lines
from canonicalsg2im_tpu.data.vocab import non_meta_relation_ids

PREDS = ["__padding__", "__in_image__", "__below__", "__above__",
         "__left of__", "__right of__", "__inside__", "__surrounding__"]


def _vocab():
    return {"pred_idx_to_name": list(PREDS),
            "pred_name_to_idx": {p: i for i, p in enumerate(PREDS)}}


def _write_ckpt(tmp_path, conv):
    path = str(tmp_path / "itr_10.ckpt")
    P = len(PREDS)
    state = {"g": {
        # decoy FIRST in iteration order: Adam moments carry the same leaf
        # names — the reader must skip opt_state or it produces a silently
        # near-uniform table (the bug this guards against)
        "opt_state": {"0": {"mu": {"sg_to_layout": {
            "converse_candidates_weights": np.zeros((P, P), np.float32),
            "trans_candidates_weights": np.zeros((P,), np.float32)}}}},
        "params": {"sg_to_layout": {
            "converse_candidates_weights": np.asarray(conv, np.float32),
            "trans_candidates_weights": np.zeros((P,), np.float32),
        }}}}
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(
            {"state": state, "counters": {"t": 10, "epoch": 1}}))
    with open(path + ".vocab.json", "w") as f:
        json.dump(_vocab(), f)
    return path


def test_correct_equilibrium_scores_6_of_6(tmp_path):
    P = len(PREDS)
    conv = np.full((P, P), -4.0, np.float32)
    truth = {2: 3, 3: 2, 4: 5, 5: 4, 6: 7, 7: 6}
    for i, j in truth.items():
        # upper-triangular entry only: symmetrize_converse (triu+triu.T)
        # must propagate it to both directions
        conv[min(i, j), max(i, j)] = 6.0
    path = _write_ckpt(tmp_path, conv)
    c, t, vocab = checkpoint_tables(path)
    assert c is not None and t is not None
    lines, wrong = verdict_lines(c, vocab, non_meta_relation_ids(vocab))
    assert wrong == 0 and len(lines) == 6


def test_wrong_basin_detected(tmp_path):
    P = len(PREDS)
    conv = np.full((P, P), -4.0, np.float32)
    conv[2, 3] = 6.0  # below<->above correct
    conv[4, 7] = 6.0  # left<->surrounding: the r3b flagship's wrong tie
    conv[3, 5] = 5.0  # right->above wrong (above itself still prefers below)
    conv[2, 6] = 5.0  # inside->below wrong (below itself still prefers above)
    path = _write_ckpt(tmp_path, conv)
    c, _, vocab = checkpoint_tables(path)
    lines, wrong = verdict_lines(c, vocab, non_meta_relation_ids(vocab))
    assert wrong == 4
    assert any("__left of__: argmax __surrounding__" in ln for ln in lines)
