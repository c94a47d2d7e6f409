"""COCO segmentation decoding (reference `seg_to_mask`,
sg2im/data/packed_coco.py:371-382, which calls the pycocotools C codec).

Uses the C++ codec in canonicalsg2im_tpu/native (built on first use); pure
NumPy fallbacks keep the pipeline functional without a toolchain.
"""
from __future__ import annotations

import ctypes
from typing import List, Sequence

import numpy as np

from canonicalsg2im_tpu.native import load_cocomask


def _rle_counts_from_string(s: bytes) -> List[int]:
    counts, i = [], 0
    while i < len(s):
        x, k, more = 0, 0, True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def _expand_counts(counts: Sequence[int], h: int, w: int) -> np.ndarray:
    flat = np.zeros(h * w, dtype=np.uint8)
    pos, val = 0, 0
    for run in counts:
        if val:
            flat[pos:pos + run] = 1
        pos += run
        val ^= 1
    return flat.reshape(w, h).T  # column-major storage


def decode_rle(rle: dict) -> np.ndarray:
    """{'size': [h, w], 'counts': str|list} -> (h, w) uint8 mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    lib = load_cocomask()
    out = np.zeros((h, w), dtype=np.uint8)
    if isinstance(counts, str):
        if lib is not None:
            rc = lib.rle_decode_string(
                counts.encode(), h, w,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if rc == 0:
                return out
        return _expand_counts(_rle_counts_from_string(counts.encode()), h, w)
    arr = np.asarray(counts, dtype=np.int64)
    if lib is not None:
        rc = lib.rle_decode_counts(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(arr), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc == 0:
            return out
    return _expand_counts(arr.tolist(), h, w)


def polygons_to_mask(polys: Sequence[Sequence[float]], h: int,
                     w: int) -> np.ndarray:
    """List of flat [x0, y0, x1, y1, ...] polygons -> OR-merged (h, w) mask."""
    lib = load_cocomask()
    out = np.zeros((h, w), dtype=np.uint8)
    for poly in polys:
        xy = np.asarray(poly, dtype=np.float64)
        n = len(xy) // 2
        if n < 3:
            continue
        if lib is not None:
            lib.polygon_fill(
                xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, h, w,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        else:
            from PIL import Image, ImageDraw

            im = Image.new("L", (w, h), 0)
            ImageDraw.Draw(im).polygon(
                [(xy[2 * i], xy[2 * i + 1]) for i in range(n)], fill=1)
            out |= np.asarray(im, dtype=np.uint8)
    return out


def seg_to_mask(seg, width: int, height: int) -> np.ndarray:
    """Dispatch exactly like the reference seg_to_mask."""
    if isinstance(seg, list):
        return polygons_to_mask(seg, height, width)
    return decode_rle(seg)
