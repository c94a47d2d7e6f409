"""Visualization smoke tests (graphviz shell-out + PIL overlays)."""
import os

import numpy as np

from canonicalsg2im_tpu.data.vocab import build_clevr_vocab
from canonicalsg2im_tpu.utils.vis import draw_boxes_on_image, draw_scene_graph


def test_draw_scene_graph(tmp_path):
    vocab = build_clevr_vocab()
    p2i = vocab["pred_name_to_idx"]
    triplets = [[0, p2i["__left of__"], 1], [1, p2i["__above__"], 2],
                [0, p2i["__padding__"], 0]]
    out = draw_scene_graph(["cube", "sphere", "cylinder"], triplets, vocab,
                           str(tmp_path / "sg.png"))
    if isinstance(out, str) and out.endswith(".png"):
        assert os.path.getsize(out) > 0
    else:  # graphviz missing -> DOT source returned
        assert "digraph" in out and "__padding__" not in out


def test_draw_boxes(tmp_path):
    img = np.zeros((64, 64, 3), np.float32)
    boxes = [[0.1, 0.1, 0.3, 0.4], [-1, -1, -1, -1]]
    path = draw_boxes_on_image(img, boxes, ["cube", "pad"],
                               str(tmp_path / "boxes.png"))
    assert os.path.getsize(path) > 0
