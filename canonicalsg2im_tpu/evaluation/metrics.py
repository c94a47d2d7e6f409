"""Box / mask IoU metrics (reference `sg2im/metrics.py`)."""
from __future__ import annotations

import jax.numpy as jnp


def xywh_to_points(boxes):
    return jnp.concatenate([boxes[..., :2], boxes[..., :2] + boxes[..., 2:]], axis=-1)


def jaccard(bbox_pred, bbox_gt):
    """Per-box IoU between xywh boxes; returns (iou, iou>0.5, iou>0.3)
    (metrics.py:18-36)."""
    p = xywh_to_points(bbox_pred)
    g = xywh_to_points(bbox_gt)
    lo = jnp.maximum(p[..., :2], g[..., :2])
    hi = jnp.minimum(p[..., 2:], g[..., 2:])
    wh = jnp.clip(hi - lo, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_p = (p[..., 2] - p[..., 0]) * (p[..., 3] - p[..., 1])
    area_g = (g[..., 2] - g[..., 0]) * (g[..., 3] - g[..., 1])
    union = area_p + area_g - inter
    iou = inter / union
    return iou, iou > 0.5, iou > 0.3


def jaccard_masks(masks_pred, masks_gt):
    inter = (masks_pred * masks_gt).sum()
    union = masks_pred.sum() + masks_gt.sum() - inter
    return inter / union


def masked_batch_iou(boxes_pred, boxes_gt, objs):
    """Fixed-shape version of the reference's per-image IoU eval loop
    (scripts/train.py:203-231): clamp predictions, exclude dummy/padding rows,
    and return summed (iou, iou05, iou03, count) over the batch plus per-image
    means."""
    from canonicalsg2im_tpu.losses.bbox import real_object_mask

    pred = jnp.clip(boxes_pred, 0.0, 1.0)
    iou, iou05, iou03 = jaccard(pred, boxes_gt)
    mask = real_object_mask(objs).astype(iou.dtype)
    iou = jnp.where(mask > 0, iou, 0.0)
    count = mask.sum()
    per_image = iou.sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)
    totals = {
        "iou_sum": (iou * mask).sum(),
        "iou05_sum": (iou05 * mask).sum(),
        "iou03_sum": (iou03 * mask).sum(),
        "count": count,
    }
    return totals, per_image
