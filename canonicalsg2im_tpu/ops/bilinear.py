"""Differentiable box cropping — separable bilinear gathers as matmuls.

Counterpart of the reference's `crop_bbox_batch`/`crop_bbox`/`bilinear_sample`
(`sg2im/bilinear.py:13-184`). The reference's sampling grid is an outer
product of two linspaces (X varies only with the output column, Y only with
the row), so bilinear interpolation factorizes into one (HH x H) and one
(WW x W) interpolation matrix per box — two matmuls on the MXU instead of
gathers. Matches grid_sample(align_corners=True, zeros padding), i.e. the
PyTorch <= 1.2 behavior the reference was built on.

Unlike the reference, which dynamically drops dummy objects before cropping
(`bilinear.py:34-40`), we crop every (batch, object) slot at a fixed shape and
return a validity mask; dummy crops are zeroed and excluded from losses.
"""
from __future__ import annotations

import jax.numpy as jnp

from canonicalsg2im_tpu.ops.layout import _interp_matrix


def _linspace_pixels(a, b, steps: int, src_size: int):
    """tensor_linspace(a, b, steps) in [0,1] box space -> source pixel coords
    under align_corners=True (bilinear.py:84-89,155-184)."""
    t = jnp.linspace(0.0, 1.0, steps, dtype=jnp.float32)
    x = a[:, None] * (1.0 - t)[None, :] + b[:, None] * t[None, :]
    return x * (src_size - 1)


def crop_bbox(feats, bbox, HH: int, WW: int | None = None):
    """Crop each image to its box with bilinear resampling.

    Args:
      feats: (N, H, W, C)
      bbox: (N, 4) [x0, y0, w, h] in [0, 1] (converted to corner form
        internally, as reference xywh_to_points does — sg2im/metrics.py:4).
    Returns:
      (N, HH, WW, C) crops.
    """
    if WW is None:
        WW = HH
    N, H, W, C = feats.shape
    x0, y0 = bbox[:, 0], bbox[:, 1]
    x1, y1 = bbox[:, 0] + bbox[:, 2], bbox[:, 1] + bbox[:, 3]
    wx = _interp_matrix(_linspace_pixels(x0, x1, WW, W), W)   # (N, WW, W)
    wy = _interp_matrix(_linspace_pixels(y0, y1, HH, H), H)   # (N, HH, H)
    rows = jnp.einsum("nqh,nhwc->nqwc", wy, feats)
    return jnp.einsum("nqwc,npw->nqpc", rows, wx)


def crop_bbox_batch(imgs, objs, bbox, HH: int, WW: int | None = None):
    """Crop every object slot of every image (reference crop_bbox_batch,
    bilinear.py:13-62) at fixed shape.

    Args:
      imgs: (B, H, W, C)
      objs: (B, O, A) attribute ids — slot is real iff objs[..., 0] != 0
        (covers both padding and the __image__ dummy, whose first-attribute id
        is 0 in every vocab — see remove_dummy_objects, sg2im/utils.py:56).
      bbox: (B, O, 4) xywh.
    Returns:
      (crops (B, O, HH, WW, C) with dummy slots zeroed, real (B, O) bool).
    """
    if WW is None:
        WW = HH
    B, O = bbox.shape[:2]
    B2, H, W, C = imgs.shape
    real = objs[..., 0] != 0
    feats = jnp.broadcast_to(imgs[:, None], (B, O, H, W, C)).reshape(B * O, H, W, C)
    crops = crop_bbox(feats, bbox.reshape(B * O, 4), HH, WW)
    crops = crops.reshape(B, O, HH, WW, C)
    return crops * real[:, :, None, None, None], real
