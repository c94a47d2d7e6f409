"""Jitted train / eval steps for the SG->Layout stage.

One fused step reproduces the reference's sequence (scripts/train.py:353-385):
masked bbox loss -> Adam update of base+trans params, then the REINFORCE
surrogate ``mean(normalized_reward * log p(converse draws))`` -> Adam update
of the converse matrix. Both gradients live in one tree (the parameter groups
are disjoint), so a single ``state.apply_gradients`` applies the reference's
two optimizer steps.

The step is shape-polymorphic only across the bucket ladder; under jit with a
data-sharded batch XLA inserts the gradient all-reduce automatically.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from canonicalsg2im_tpu.evaluation.metrics import masked_batch_iou
from canonicalsg2im_tpu.graphs.converse import converse_log_likelihood
from canonicalsg2im_tpu.losses.bbox import bbox_losses, mask_pred_loss
from canonicalsg2im_tpu.models.sg2layout import symmetrize_converse


def _forward(state, params, batch, rng, train: bool):
    variables = {"params": params}
    mutable = False
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
        mutable = ["batch_stats"] if train else False
    out = state.apply_fn(
        variables, batch.objs, batch.triplets, batch.triplet_type,
        train=train, rngs={"noise": rng}, mutable=mutable)
    if mutable:
        (obj_vecs, boxes_pred, masks_pred), new_vars = out
        return obj_vecs, boxes_pred, masks_pred, new_vars.get("batch_stats", {})
    obj_vecs, boxes_pred, masks_pred = out
    return obj_vecs, boxes_pred, masks_pred, state.batch_stats


def _train_body(state, batch, rng, non_meta_rels, bbox_weight, mask_weight,
                learned_converse):
    """One gradient update — the SINGLE definition of the layout-stage loss,
    traced by both the single-step and the lax.scan multi-step entry points
    (their bit-equivalence is asserted in tests/test_sg2layout.py)."""

    def loss_fn(params):
        _, boxes_pred, masks_pred, new_stats = _forward(
            state, params, batch, rng, train=True)
        per_sample, bbox_mean = bbox_losses(
            boxes_pred, batch.boxes, batch.objs, weight=bbox_weight)
        total = bbox_mean
        aux = {"bbox_pred": bbox_mean}
        if masks_pred is not None and batch.masks is not None and mask_weight > 0:
            m = mask_pred_loss(masks_pred, batch.masks, batch.objs, mask_weight)
            total = total + m
            aux["masks_pred"] = m

        if learned_converse:
            # REINFORCE: reward = per-sample bbox loss, batch-normalized with
            # torch's unbiased std (train.py:371-377)
            r = jax.lax.stop_gradient(per_sample)
            B = r.shape[0]
            if B > 1:
                std = jnp.sqrt(jnp.sum((r - r.mean()) ** 2) / (B - 1))
                r = (r - r.mean()) / (std + jnp.finfo(jnp.float32).eps)
            conv_w = symmetrize_converse(params["converse_candidates_weights"])
            log_p = converse_log_likelihood(conv_w, non_meta_rels,
                                            batch.conv_counts)
            loss_conv = jnp.mean(r * log_p)
            total = total + loss_conv
            aux["loss_conv"] = loss_conv

        aux["total_loss"] = total
        return total, (aux, new_stats)

    (_, (metrics, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    if new_stats:
        state = state.replace(batch_stats=new_stats)
    return state, metrics


@partial(jax.jit, static_argnames=("non_meta_rels", "bbox_weight", "mask_weight",
                                   "learned_converse"), donate_argnames=("state",))
def layout_train_step(state, batch, rng, *, non_meta_rels: Sequence[int],
                      bbox_weight: float = 10.0, mask_weight: float = 0.0,
                      learned_converse: bool = False):
    """Returns (new_state, metrics dict, converse weight matrix for the host
    data pipeline)."""
    state, metrics = _train_body(state, batch, rng, non_meta_rels,
                                 bbox_weight, mask_weight, learned_converse)
    conv_w = symmetrize_converse(state.params["converse_candidates_weights"])
    return state, metrics, conv_w


@partial(jax.jit, static_argnames=("non_meta_rels", "bbox_weight", "mask_weight",
                                   "learned_converse"), donate_argnames=("state",))
def layout_train_multi_step(state, batches, rngs, *, non_meta_rels: Sequence[int],
                            bbox_weight: float = 10.0, mask_weight: float = 0.0,
                            learned_converse: bool = False):
    """K train steps in ONE dispatch via lax.scan over stacked batches.

    Amortizes host->device dispatch latency (significant when the chip sits
    behind a network tunnel): ``batches`` is a Batch pytree with a leading K
    axis, ``rngs`` is (K, 2) PRNG keys. The learned-converse host feedback
    then updates every K steps instead of every step. Returns
    (state, last-step metrics, conv_w)."""

    def body(state, xs):
        batch, rng = xs
        return _train_body(state, batch, rng, non_meta_rels, bbox_weight,
                           mask_weight, learned_converse)

    state, metrics_seq = jax.lax.scan(body, state, (batches, rngs))
    metrics = jax.tree.map(lambda m: m[-1], metrics_seq)
    conv_w = symmetrize_converse(state.params["converse_candidates_weights"])
    return state, metrics, conv_w


@partial(jax.jit, static_argnames=("bbox_weight",))
def layout_eval_step(state, batch, rng, *, bbox_weight: float = 10.0):
    """No-grad eval: losses + IoU totals (reference check_model,
    scripts/train.py:161-271, graph-model half)."""
    _, boxes_pred, masks_pred, _ = _forward(
        state, state.params, batch, rng, train=False)
    per_sample, bbox_mean = bbox_losses(
        boxes_pred, batch.boxes, batch.objs, weight=bbox_weight)
    totals, per_image = masked_batch_iou(boxes_pred, batch.boxes, batch.objs)
    metrics = {"bbox_pred": bbox_mean, **totals}
    return metrics, boxes_pred, masks_pred, per_image
