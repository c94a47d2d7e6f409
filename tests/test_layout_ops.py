"""Layout splat / crop ops vs. a literal PyTorch port of the reference math.

torch (CPU) is used here *only* as a test oracle for
grid_sample(align_corners=True, padding_mode='zeros') — the semantics the
reference (PyTorch <= 1.2) relied on (`sg2im/layout.py`, `sg2im/bilinear.py`).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from canonicalsg2im_tpu.ops import (
    boxes_to_layout,
    crop_bbox,
    crop_bbox_batch,
    masks_to_layout,
    sample_masks,
)


def _ref_boxes_to_grid(boxes, H, W):
    """Port of sg2im/layout.py:80-112 (boxes are xywh)."""
    O = boxes.size(0)
    boxes = boxes.view(O, 4, 1, 1)
    x0, y0 = boxes[:, 0], boxes[:, 1]
    ww, hh = boxes[:, 2], boxes[:, 3]
    X = torch.linspace(0, 1, steps=W).view(1, 1, W).to(boxes)
    Y = torch.linspace(0, 1, steps=H).view(1, H, 1).to(boxes)
    X = (X - x0) / ww
    Y = (Y - y0) / hh
    X = X.expand(O, H, W)
    Y = Y.expand(O, H, W)
    grid = torch.stack([X, Y], dim=3)
    return grid.mul(2).sub(1)


def _ref_boxes_to_layout(vecs, boxes, H, W):
    O, D = vecs.shape
    grid = _ref_boxes_to_grid(boxes, H, W)
    img_in = vecs.view(O, D, 1, 1).expand(O, D, 8, 8)
    sampled = F.grid_sample(img_in, grid, align_corners=True)
    return sampled.sum(dim=0)  # (D, H, W), single-image scatter-sum


def _rand_boxes(rng, n):
    xy = rng.uniform(0, 0.7, (n, 2))
    wh = rng.uniform(0.05, 0.3, (n, 2))
    return np.concatenate([xy, wh], axis=1).astype(np.float32)


@pytest.mark.parametrize("seed", range(3))
def test_boxes_to_layout_matches_grid_sample(seed):
    rng = np.random.default_rng(seed)
    O, D, H, W = 5, 7, 64, 48
    vecs = rng.normal(size=(O, D)).astype(np.float32)
    boxes = _rand_boxes(rng, O)

    want = _ref_boxes_to_layout(torch.from_numpy(vecs), torch.from_numpy(boxes),
                                H, W).numpy()              # (D, H, W)
    got = np.asarray(boxes_to_layout(vecs[None], boxes[None], H, W))[0]  # (H, W, D)
    np.testing.assert_allclose(got.transpose(2, 0, 1), want, atol=2e-5)


def test_boxes_to_layout_padding_boxes_vanish():
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(1, 3, 4)).astype(np.float32)
    boxes = np.full((1, 3, 4), -1.0, dtype=np.float32)
    out = np.asarray(boxes_to_layout(vecs, boxes, 16, 16))
    assert np.all(out == 0)


def test_boxes_to_layout_chunking_invariant():
    rng = np.random.default_rng(1)
    B, O, D = 2, 11, 6
    vecs = rng.normal(size=(B, O, D)).astype(np.float32)
    boxes = np.stack([_rand_boxes(rng, O) for _ in range(B)])
    a = np.asarray(boxes_to_layout(vecs, boxes, 32, 32, obj_chunk=4))
    b = np.asarray(boxes_to_layout(vecs, boxes, 32, 32, obj_chunk=64))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("seed", range(3))
def test_sample_masks_matches_grid_sample(seed):
    rng = np.random.default_rng(10 + seed)
    O, M, H, W = 4, 16, 40, 40
    masks = (rng.uniform(size=(O, M, M)) > 0.5).astype(np.float32)
    boxes = _rand_boxes(rng, O)

    grid = _ref_boxes_to_grid(torch.from_numpy(boxes), H, W)
    want = F.grid_sample(torch.from_numpy(masks).view(O, 1, M, M), grid,
                         align_corners=True).numpy()[:, 0]
    got = np.asarray(sample_masks(masks[None], boxes[None], H, W))[0]
    np.testing.assert_allclose(got, want, atol=2e-5)


def _ref_pool_mask_samples(samples, clean):
    """Port of sg2im/layout.py:136-148 (single image)."""
    O, D, H, W = samples.shape
    mass = [float(samples[j].sum()) for j in range(O)]
    order = np.argsort(mass)
    result = np.zeros((D, H, W), dtype=np.float32)
    result_clean = np.zeros((H, W), dtype=np.float32)
    for j in order:
        masked = (result_clean == 0).astype(np.float32) * (clean[j] > 0.5).astype(np.float32)
        result_clean += masked
        result += samples[j] * masked
    return result


@pytest.mark.parametrize("seed", range(3))
def test_masks_to_layout_modes(seed):
    rng = np.random.default_rng(20 + seed)
    O, D, M, H = 4, 5, 16, 32
    vecs = np.abs(rng.normal(size=(O, D))).astype(np.float32)
    boxes = _rand_boxes(rng, O)
    masks = (rng.uniform(size=(O, M, M)) > 0.3).astype(np.float32)

    sampled = np.asarray(sample_masks(masks[None], boxes[None], H, H))[0]
    samples = vecs[:, :, None, None] * sampled[:, None]  # (O, D, H, W)

    train_out = np.asarray(
        masks_to_layout(vecs[None], boxes[None], masks[None], H))[0]
    np.testing.assert_allclose(train_out.transpose(2, 0, 1), samples.sum(0),
                               atol=2e-5)

    test_out = np.asarray(
        masks_to_layout(vecs[None], boxes[None], masks[None], H, test_mode=True))[0]
    want = _ref_pool_mask_samples(samples, sampled)
    np.testing.assert_allclose(test_out.transpose(2, 0, 1), want, atol=2e-5)


def _ref_crop(feats, bbox_xywh, HH, WW):
    """Port of crop_bbox backend='cudnn' (sg2im/bilinear.py:65-94)."""
    bbox = bbox_xywh.clone()
    bbox[:, 2] = bbox_xywh[:, 0] + bbox_xywh[:, 2]
    bbox[:, 3] = bbox_xywh[:, 1] + bbox_xywh[:, 3]
    bbox = 2 * bbox - 1
    x0, y0, x1, y1 = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    N = feats.size(0)

    def tls(start, end, steps):
        w = torch.linspace(0, 1, steps=steps)
        return start[:, None] * (1 - w)[None] + end[:, None] * w[None]

    X = tls(x0, x1, WW).view(N, 1, WW).expand(N, HH, WW)
    Y = tls(y0, y1, HH).view(N, HH, 1).expand(N, HH, WW)
    grid = torch.stack([X, Y], dim=3)
    return F.grid_sample(feats, grid, align_corners=True)


@pytest.mark.parametrize("seed", range(3))
def test_crop_bbox_matches_grid_sample(seed):
    rng = np.random.default_rng(30 + seed)
    N, C, H, W, HH = 3, 4, 48, 48, 16
    feats = rng.normal(size=(N, H, W, C)).astype(np.float32)
    bbox = _rand_boxes(rng, N)

    want = _ref_crop(torch.from_numpy(feats.transpose(0, 3, 1, 2)),
                     torch.from_numpy(bbox), HH, HH).numpy()
    got = np.asarray(crop_bbox(feats, bbox, HH))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-4)


def test_crop_bbox_batch_masks_dummies():
    rng = np.random.default_rng(5)
    B, O, H, C = 2, 3, 32, 3
    imgs = rng.normal(size=(B, H, H, C)).astype(np.float32)
    boxes = np.stack([_rand_boxes(rng, O) for _ in range(B)])
    objs = np.ones((B, O, 4), dtype=np.int32)
    objs[0, 2, 0] = 0  # dummy slot
    crops, real = crop_bbox_batch(imgs, objs, boxes, 8)
    assert crops.shape == (B, O, 8, 8, C)
    assert bool(real[0, 2]) is False and bool(real[0, 0]) is True
    assert np.all(np.asarray(crops)[0, 2] == 0)
    assert np.any(np.asarray(crops)[0, 0] != 0)
