"""Box / mask prediction losses (reference Pix2PixModel.compute_generator_loss,
`sg2im/pix2pix_model.py:71-92`)."""
from __future__ import annotations

import jax.numpy as jnp


def smooth_l1(pred, target, beta: float = 1.0):
    """Elementwise smooth-L1 (Huber), torch F.smooth_l1_loss semantics."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def real_object_mask(objs):
    """(B, O) — True for non-dummy, non-padding object rows.

    Multi-attribute vocabs (CLEVR): dummy rows are all-zero; single-attribute:
    id 0 (pix2pix_model.py:74-79).
    """
    if objs.shape[-1] > 1:
        return jnp.sum(objs, axis=-1) != 0
    return objs[..., 0] != 0


def bbox_losses(boxes_pred, boxes_gt, objs, weight: float = 10.0):
    """Masked smooth-L1 box loss.

    Returns (per_sample (B,) — the REINFORCE reward `bbox_pred_all`,
             scalar mean — `bbox_pred`).
    """
    elem = smooth_l1(boxes_pred, boxes_gt) * weight          # (B, O, 4)
    mask = real_object_mask(objs).astype(elem.dtype)          # (B, O)
    per_sample = (elem * mask[..., None]).sum(axis=(1, 2)) / jnp.maximum(
        mask.sum(axis=1), 1.0)
    return per_sample, per_sample.mean()


def mask_pred_loss(masks_pred, masks_gt, objs, weight: float):
    """Per-object BCE on predicted masks, averaged over real objects
    (pix2pix_model.py:87-92)."""
    eps = 1e-7
    p = jnp.clip(masks_pred, eps, 1.0 - eps)
    bce = -(masks_gt * jnp.log(p) + (1.0 - masks_gt) * jnp.log1p(-p))
    per_obj = bce.mean(axis=(-2, -1))                         # (B, O)
    mask = real_object_mask(objs).astype(per_obj.dtype)
    return (per_obj * mask).sum() / jnp.maximum(mask.sum(), 1.0) * weight
