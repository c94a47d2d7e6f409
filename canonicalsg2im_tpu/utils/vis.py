"""Visualization helpers (reference `sg2im/vis.py`).

- ``draw_scene_graph``: graphviz DOT shell-out rendering of a triplet list
  (vis.py:44-116); returns the PNG path or the DOT source if graphviz is
  unavailable.
- ``draw_boxes_on_image``: box + label overlays via PIL (the reference's
  matplotlib `draw_box`/`draw_item`, vis.py:119-158).
"""
from __future__ import annotations

import subprocess
import tempfile
from typing import List, Optional, Sequence

import numpy as np


def draw_scene_graph(objs: Sequence[str], triplets, vocab=None,
                     output_path: Optional[str] = None,
                     orientation: str = "V"):
    """Render a scene graph with graphviz `dot`.

    Args:
      objs: object display names (or attribute-id rows if vocab given).
      triplets: (T, 3) [s, p, o] with predicate ids (vocab) or names.
    Returns the written PNG path, or the DOT source string if `dot` is
    missing.
    """
    if vocab is not None and len(objs) and not isinstance(objs[0], str):
        names = []
        for row in objs:
            row = np.atleast_1d(row)
            attr = list(vocab["attributes"])[0]
            rev = vocab["reverse_attributes"][attr]
            names.append(str(rev.get(int(row[0]), int(row[0]))))
        objs = names

    lines = [
        "digraph{",
        'graph [size="5,3",ratio="compress"]',
        f"rankdir={'TB' if orientation == 'V' else 'LR'}",
        'nodesep="0.5"', 'ranksep="0.5"',
    ]
    node_style = ('[shape="box",style="rounded,filled",fillcolor="#ffe4c4",'
                  'fontsize="16"]')
    rel_style = ('[shape="box",style="filled",fillcolor="#add8e6",'
                 'fontsize="16"]')
    for i, name in enumerate(objs):
        lines.append(f'o{i} {node_style} [label="{name}"]')
    for t, (s, p, o) in enumerate(np.asarray(triplets).tolist()):
        pname = p
        if vocab is not None and not isinstance(p, str):
            pname = vocab["pred_idx_to_name"][int(p)]
        if str(pname) == "__padding__":
            continue
        lines.append(f'r{t} {rel_style} [label="{pname}"]')
        lines.append(f"o{int(s)} -> r{t}")
        lines.append(f"r{t} -> o{int(o)}")
    lines.append("}")
    dot = "\n".join(lines)

    if output_path is None:
        output_path = tempfile.mktemp(suffix=".png")
    try:
        proc = subprocess.run(["dot", "-Tpng", "-o", output_path],
                              input=dot.encode(), capture_output=True)
        if proc.returncode == 0:
            return output_path
    except OSError:
        pass
    return dot


def draw_boxes_on_image(image: np.ndarray, boxes, labels: Optional[List[str]] = None,
                        output_path: Optional[str] = None):
    """Overlay xywh [0,1] boxes (+labels) on an HWC [-1,1] or [0,255] image."""
    from PIL import Image, ImageDraw

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
    im = Image.fromarray(arr)
    draw = ImageDraw.Draw(im)
    H, W = arr.shape[:2]
    palette = [(255, 64, 64), (64, 255, 64), (64, 64, 255), (255, 255, 64),
               (255, 64, 255), (64, 255, 255)]
    for i, box in enumerate(np.asarray(boxes)):
        x0, y0, w, h = box
        if w <= 0 or h <= 0:
            continue
        color = palette[i % len(palette)]
        draw.rectangle([x0 * W, y0 * H, (x0 + w) * W, (y0 + h) * H],
                       outline=color, width=2)
        if labels is not None and i < len(labels):
            draw.text((x0 * W + 2, y0 * H + 2), str(labels[i]), fill=color)
    if output_path:
        im.save(output_path)
        return output_path
    return im
