"""Proxy-feature FID / IS for images in THIS environment.

The reference's image-quality instruments are a pretrained InceptionV3
(`/root/reference/evaluation/fid/fid_score.py:232-250`,
`/root/reference/evaluation/inception.py:16`); their weight bytes cannot
exist in this image (no network), and random-weight fallbacks demonstrably
cannot detect real regressions (the round-4 dither texture ranked *better*
than a clean model — docs/RESULTS.md). This module stands in for that
instrument with a small conv net trained IN-IMAGE on the synthetic dataset:

- task: per-cell category presence on an 8x8 grid (forces features that are
  sensitive to both local appearance/texture and spatial layout), plus a
  scene-type softmax head (dominant instance category x object-count bucket)
  whose distribution supports the standard Inception-Score formula;
- FID: the 256-d GAP penultimate features feed the existing Frechet
  machinery (evaluation/fid.py::calculate_frechet_distance) unchanged.

CAVEAT (by design, stated everywhere the numbers appear): these are
RELATIVE, in-image metrics. They rank checkpoints of the same run and
detect texture/layout regressions on the synthetic distribution; they are
NOT comparable to literature FID/IS values.

CLI:
  python -m canonicalsg2im_tpu.evaluation.proxy train --dataroot datasets/synth16k_p
  python -m canonicalsg2im_tpu.evaluation.proxy fid real_dir fake_dir
  python -m canonicalsg2im_tpu.evaluation.proxy is fake_dir
"""
from __future__ import annotations

import json
import os
from typing import Iterable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

PROXY_SIZE = 128          # input resolution (images are resized here)
GRID = 8                  # spatial grid for the presence task
FEATURE_DIM = 256         # penultimate (FID) feature width
COUNT_BUCKETS = (3, 5, 7, 9)  # object-count bucket edges for scene types


class ProxyFeatureNet(nn.Module):
    """Small conv net: stem + 4 stride-2 stages -> 8x8 grid head + GAP
    feature -> scene-type head. GroupNorm keeps eval deterministic (no
    batch statistics)."""

    num_grid_channels: int
    num_scene_types: int

    @nn.compact
    def __call__(self, x):
        # x: [-1, 1] NHWC at PROXY_SIZE
        widths = (32, 64, 128, FEATURE_DIM)
        h = nn.Conv(32, (3, 3))(x)
        for w in widths:
            h = nn.Conv(w, (3, 3), strides=(2, 2))(h)
            h = nn.GroupNorm(num_groups=8)(h)
            h = nn.relu(h)
            h = nn.Conv(w, (3, 3))(h)
            h = nn.GroupNorm(num_groups=8)(h)
            h = nn.relu(h)
        # h: (N, GRID, GRID, FEATURE_DIM)
        grid_logits = nn.Conv(self.num_grid_channels, (1, 1))(h)
        feat = jnp.mean(h, axis=(1, 2))                 # (N, FEATURE_DIM)
        scene_logits = nn.Dense(self.num_scene_types)(feat)
        return feat, grid_logits, scene_logits


# ---------------------------------------------------------------------------
# Label construction from the synthetic COCO-format annotations


def _load_labels(dataroot: str, split: str):
    """-> (file paths, grid multi-hot (N,GRID,GRID,C), scene type (N,),
    category ids, num scene types)."""
    ann_dir = os.path.join(dataroot, "MSCoco", "annotations")
    img_dir = os.path.join(dataroot, "MSCoco", "images", f"{split}2017")
    with open(os.path.join(ann_dir, f"instances_{split}2017.json")) as f:
        inst = json.load(f)
    with open(os.path.join(ann_dir, f"stuff_{split}2017.json")) as f:
        stuff = json.load(f)

    cat_ids = sorted({c["id"] for c in inst["categories"]}
                     | {c["id"] for c in stuff["categories"]})
    cat_index = {c: i for i, c in enumerate(cat_ids)}
    n_inst_cats = len(inst["categories"])
    images = sorted(inst["images"], key=lambda im: im["id"])
    img_index = {im["id"]: i for i, im in enumerate(images)}
    n = len(images)

    grid = np.zeros((n, GRID, GRID, len(cat_ids)), np.float32)
    inst_counts = np.zeros((n,), np.int32)
    inst_cat_counts = np.zeros((n, n_inst_cats), np.int32)

    sizes = {im["id"]: (im["width"], im["height"]) for im in images}
    for coll, is_inst in ((inst, True), (stuff, False)):
        for a in coll["annotations"]:
            i = img_index[a["image_id"]]
            w, h = sizes[a["image_id"]]
            x, y, bw, bh = a["bbox"]
            c = cat_index[a["category_id"]]
            # mark grid cells whose centers fall inside the box
            x0 = int(np.floor(x / w * GRID + 0.5))
            x1 = int(np.ceil((x + bw) / w * GRID - 0.5))
            y0 = int(np.floor(y / h * GRID + 0.5))
            y1 = int(np.ceil((y + bh) / h * GRID - 0.5))
            x0, y0 = max(0, x0), max(0, y0)
            x1, y1 = min(GRID - 1, x1), min(GRID - 1, y1)
            if x1 >= x0 and y1 >= y0:
                grid[i, y0:y1 + 1, x0:x1 + 1, c] = 1.0
            if is_inst:
                inst_counts[i] += 1
                inst_cat_counts[i, c] += 1

    # scene type = dominant instance category x object-count bucket
    dom = np.argmax(inst_cat_counts, axis=1)
    bucket = np.digitize(inst_counts, COUNT_BUCKETS)
    scene = dom * (len(COUNT_BUCKETS) + 1) + bucket
    n_scene = n_inst_cats * (len(COUNT_BUCKETS) + 1)

    paths = [os.path.join(img_dir, im["file_name"]) for im in images]
    return paths, grid, scene.astype(np.int32), cat_ids, n_scene


def _decode_images(paths, size: int = PROXY_SIZE) -> np.ndarray:
    from PIL import Image

    out = np.empty((len(paths), size, size, 3), np.uint8)
    for i, p in enumerate(paths):
        im = Image.open(p).convert("RGB")
        if im.size != (size, size):
            im = im.resize((size, size), Image.BILINEAR)
        out[i] = np.asarray(im)
    return out


# ---------------------------------------------------------------------------
# Training


def train_proxy(dataroot: str, out_npz: str, steps: int = 2000,
                batch_size: int = 64, lr: float = 1e-3, seed: int = 0,
                log_every: int = 200) -> dict:
    """Train the proxy net on the synthetic set; save params + metadata.

    Returns the final metrics dict (val grid AP is the learning check)."""
    import optax
    from flax.core import unfreeze

    paths, grid, scene, cat_ids, n_scene = _load_labels(dataroot, "train")
    vpaths, vgrid, vscene, _, _ = _load_labels(dataroot, "val")
    print(f"proxy train: {len(paths)} images, {len(cat_ids)} categories, "
          f"{n_scene} scene types")
    imgs = _decode_images(paths)
    vimgs = _decode_images(vpaths)

    model = ProxyFeatureNet(num_grid_channels=len(cat_ids),
                            num_scene_types=n_scene)
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros((1, PROXY_SIZE, PROXY_SIZE, 3)))
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)

    def loss_fn(params, x, g, s):
        _, gl, sl = model.apply(params, x)
        bce = optax.sigmoid_binary_cross_entropy(gl, g).mean()
        ce = optax.softmax_cross_entropy_with_integer_labels(sl, s).mean()
        return bce + 0.3 * ce, (bce, ce)

    @jax.jit
    def train_step(params, opt_state, x, g, s):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, g, s)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    @jax.jit
    def eval_batch(params, x):
        feat, gl, sl = model.apply(params, x)
        return feat, jax.nn.sigmoid(gl), jax.nn.softmax(sl)

    n = len(imgs)
    key = np.random.default_rng(seed)
    metrics = {}
    for t in range(steps):
        idx = key.integers(0, n, batch_size)
        x = imgs[idx].astype(np.float32) / 127.5 - 1.0
        params, opt_state, loss, (bce, ce) = train_step(
            params, opt_state, x, grid[idx], scene[idx])
        if (t + 1) % log_every == 0 or t == 0:
            print(f"  step {t + 1}: loss {float(loss):.4f} "
                  f"(grid {float(bce):.4f}, scene {float(ce):.4f})")

    # val check: grid mean-AP-ish (threshold 0.5 accuracy on positives and
    # negatives) + scene top-1
    probs, stop1 = [], []
    for i in range(0, len(vimgs), batch_size):
        x = vimgs[i:i + batch_size].astype(np.float32) / 127.5 - 1.0
        _, gp, sp = eval_batch(params, x)
        probs.append(np.asarray(gp))
        stop1.append(np.argmax(np.asarray(sp), axis=1))
    gp = np.concatenate(probs)
    stop1 = np.concatenate(stop1)
    pos = vgrid[:len(gp)] > 0.5
    metrics["grid_pos_acc"] = float((gp[pos] > 0.5).mean())
    metrics["grid_neg_acc"] = float((gp[~pos] < 0.5).mean())
    metrics["scene_top1"] = float((stop1 == vscene[:len(stop1)]).mean())
    print(f"proxy val: grid pos acc {metrics['grid_pos_acc']:.3f}, "
          f"neg acc {metrics['grid_neg_acc']:.3f}, "
          f"scene top-1 {metrics['scene_top1']:.3f}")

    flat = _flatten(unfreeze(params))
    np.savez(out_npz,
             __meta__=json.dumps({"num_grid_channels": len(cat_ids),
                                  "num_scene_types": n_scene,
                                  "cat_ids": cat_ids,
                                  "metrics": metrics,
                                  "dataroot": dataroot,
                                  "steps": steps}),
             **flat)
    print(f"saved {out_npz}")
    return metrics


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        kk = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, kk))
        else:
            out[kk] = np.asarray(v)
    return out


def _unflatten(flat):
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return tree


# ---------------------------------------------------------------------------
# Metric front-ends (mirror evaluation/fid.py's interfaces)


class ProxyActivations:
    """FidActivations-compatible accumulator using proxy features.

    __call__ takes [-1, 1] NHWC batches (any spatial size — resized to
    PROXY_SIZE internally); statistics() -> (mu, sigma) over the 256-d
    penultimate features. Also accumulates scene-softmax rows for the
    proxy Inception Score."""

    def __init__(self, weights_npz: str = "weights/proxy_features.npz"):
        if not os.path.exists(weights_npz):
            raise FileNotFoundError(
                f"{weights_npz} not found — train it first: "
                "python -m canonicalsg2im_tpu.evaluation.proxy train")
        with np.load(weights_npz, allow_pickle=False) as f:
            meta = json.loads(str(f["__meta__"]))
            params = _unflatten({k: f[k] for k in f.files
                                 if k != "__meta__"})
        self.meta = meta
        model = ProxyFeatureNet(
            num_grid_channels=meta["num_grid_channels"],
            num_scene_types=meta["num_scene_types"])
        self.params = params

        def _acts(params, imgs):
            x = jax.image.resize(
                imgs, (imgs.shape[0], PROXY_SIZE, PROXY_SIZE, 3),
                "bilinear")
            feat, _, sl = model.apply(params, x)
            return feat, jax.nn.softmax(sl)

        self._acts = jax.jit(_acts)
        self.acts: list = []
        self.probs: list = []

    def clean(self):
        self.acts, self.probs = [], []

    def __call__(self, imgs):
        feat, prob = self._acts(self.params, jnp.asarray(imgs, jnp.float32))
        self.acts.append(np.asarray(feat))
        self.probs.append(np.asarray(prob))

    def statistics(self):
        a = np.concatenate(self.acts, axis=0)
        return a.mean(axis=0), np.cov(a, rowvar=False)

    def inception_score(self, splits: int = 5):
        """Standard IS formula (reference evaluation/inception.py:54-63)
        over the scene-type softmax. Relative metric only."""
        preds = np.concatenate(self.probs, axis=0)
        n = preds.shape[0]
        scores = []
        for i in range(splits):
            part = preds[i * n // splits:(i + 1) * n // splits]
            if len(part) == 0:
                continue
            py = part.mean(axis=0, keepdims=True)
            kl = (part * (np.log(part + 1e-12) - np.log(py + 1e-12)))
            scores.append(float(np.exp(kl.sum(axis=1).mean())))
        return float(np.mean(scores)), float(np.std(scores))


def proxy_fid_given_paths(paths, weights_npz: str = "weights/proxy_features.npz",
                          batch_size: int = 64) -> float:
    """Proxy FID between two image dirs (or .npz stats files)."""
    from canonicalsg2im_tpu.evaluation.fid import (
        _load_dir_batches, calculate_frechet_distance)

    acc = ProxyActivations(weights_npz)
    stats = []
    for p in paths:
        if p.endswith(".npz"):
            with np.load(p) as f:
                stats.append((f["mu"], f["sigma"]))
            continue
        acc.clean()
        for batch in _load_dir_batches(p, batch_size):
            acc(batch)
        stats.append(acc.statistics())
    (m1, s1), (m2, s2) = stats
    return float(calculate_frechet_distance(m1, s1, m2, s2))


def proxy_is_given_path(path: str,
                        weights_npz: str = "weights/proxy_features.npz",
                        batch_size: int = 64, splits: int = 5):
    from canonicalsg2im_tpu.evaluation.fid import _load_dir_batches

    acc = ProxyActivations(weights_npz)
    for batch in _load_dir_batches(path, batch_size):
        acc(batch)
    return acc.inception_score(splits)


def main(argv=None):
    import argparse

    from canonicalsg2im_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    tr = sub.add_parser("train")
    tr.add_argument("--dataroot", default="datasets/synth16k_p")
    tr.add_argument("--out", default="weights/proxy_features.npz")
    tr.add_argument("--steps", type=int, default=2000)
    tr.add_argument("--batch_size", type=int, default=64)
    tr.add_argument("--seed", type=int, default=0)
    fd = sub.add_parser("fid")
    fd.add_argument("path", nargs=2)
    fd.add_argument("--weights", default="weights/proxy_features.npz")
    fd.add_argument("--batch_size", type=int, default=64)
    sc = sub.add_parser("is")
    sc.add_argument("path")
    sc.add_argument("--weights", default="weights/proxy_features.npz")
    sc.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args(argv)
    if args.cmd == "train":
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        train_proxy(args.dataroot, args.out, steps=args.steps,
                    batch_size=args.batch_size, seed=args.seed)
    elif args.cmd == "fid":
        v = proxy_fid_given_paths(args.path, args.weights, args.batch_size)
        print(f"proxy FID (relative, not literature-comparable): {v:.4f}")
    else:
        m, s = proxy_is_given_path(args.path, args.weights, args.batch_size)
        print(f"proxy IS (relative, not literature-comparable): "
              f"{m:.4f} +/- {s:.4f}")


if __name__ == "__main__":
    main()
