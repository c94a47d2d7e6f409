"""Generate synthetic raw datasets in the reference's on-disk formats.

The image has no network, so the real COCO-Stuff / Visual Genome downloads
(scripts/download_{coco,vg}.sh) cannot run. This tool fabricates structurally
faithful stand-ins so every data pipeline (JSON -> dataset -> canonicalization
-> training -> eval) can be driven end-to-end at the driver's BASELINE
configurations:

- **COCO-Stuff layout** (`<root>/MSCoco/images/{train2017,val2017}/*.jpg` +
  `annotations/{instances,stuff}_<split>.json`) — matches what
  data/dataset_params.py:47-64 expects for --dataset packed_coco/coco.
- **Visual Genome layout** (`<root>/vg/{image_data,objects,relationships}.json`
  + `images/VG_100K/*.jpg`) — the input of scripts/preprocess_vg.py, matching
  the reference preprocessing chain (reference scripts/preprocess_vg.py).

Scenes are procedurally drawn: each object category paints a fixed color
rectangle at its box, over a sky/grass background — so generators have real
(category -> appearance, box -> position) structure to learn, and IoU/FID
trends are meaningful rather than noise.

  python -m scripts.make_synthetic_raw_data --root datasets/synth \
      --coco_train 512 --coco_val 128 --vg_images 512
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

THING_CATEGORIES = [
    (1, "person", (220, 40, 40)),
    (2, "dog", (240, 160, 40)),
    (3, "car", (40, 60, 220)),
    (4, "tree", (20, 120, 20)),
    (5, "ball", (230, 230, 40)),
    (6, "house", (140, 70, 160)),
]
STUFF_CATEGORIES = [(92, "grass", (110, 200, 110)), (93, "sky", (170, 200, 240))]

VG_PREDICATES = ["left of", "right of", "above", "below"]


def _draw_scene(rng, size, boxes, cat_ids):
    """Sky/grass background + one colored rectangle per object (category-keyed
    color, slight per-instance jitter)."""
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (size, size))
    draw = ImageDraw.Draw(img)
    draw.rectangle([0, 0, size, size // 2], fill=STUFF_CATEGORIES[1][2])
    draw.rectangle([0, size // 2, size, size], fill=STUFF_CATEGORIES[0][2])
    colors = {cid: col for cid, _, col in THING_CATEGORIES}
    for (x, y, w, h), cid in zip(boxes, cat_ids):
        jitter = rng.integers(-20, 20, size=3)
        col = tuple(int(np.clip(c + j, 0, 255))
                    for c, j in zip(colors[cid], jitter))
        draw.rectangle([x, y, x + w, y + h], fill=col)
    return img


def _apply_photometric(rng, img, strength):
    """Photometric hardening (round-5 image-D fix).

    The legacy scenes are piecewise-constant color + JPEG ringing — trivially
    separable from any generator output, so the hinge image D saturates to
    zero loss and stops teaching the generator anything (observed from step
    ~2000 of the r4 data-scale flagship; reference hinge D:
    /root/reference/spade/models/networks/loss.py:36-44 never gets such a
    free win on photographs). This raises the entropy of the *real*
    distribution with content a conv generator can actually model:

    - multi-scale smooth color fields (low/mid-frequency texture — learnable,
      unlike iid pixel noise, which would hand the D a new shortcut),
    - global brightness/contrast jitter per image,
    - mild pixel noise + randomized JPEG quality, so "JPEG-artifact level"
      becomes a continuum instead of a binary real/fake feature.

    Returns (image, jpeg_quality). strength<=0 returns the input untouched.
    Callers pass a photometric-only rng stream so the scene-geometry stream
    is untouched — the same seed yields identical annotations with the
    hardening on or off.
    """
    from PIL import Image

    if strength <= 0:
        return img, 92
    arr = np.asarray(img, dtype=np.float32)
    for grid, amp in ((6, 16.0), (24, 8.0)):
        field = rng.normal(size=(grid, grid, 3)).astype(np.float32)
        up = np.stack(
            [np.asarray(Image.fromarray(field[:, :, c], mode="F")
                        .resize(img.size, Image.BILINEAR))
             for c in range(3)], axis=-1)
        arr += strength * amp * up
    contrast = 1.0 + strength * rng.uniform(-0.12, 0.12)
    brightness = strength * rng.uniform(-12.0, 12.0)
    arr = (arr - 127.5) * contrast + 127.5 + brightness
    arr += rng.normal(0.0, 2.5 * strength, size=arr.shape).astype(np.float32)
    quality = int(rng.integers(80, 96))
    return Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8)), quality


def _sample_objects(rng, size, n, nested_fraction=0.0):
    """Uniform boxes; with probability ``nested_fraction`` the scene also gets
    one strictly-nested pair (small box fully inside a larger one), so the
    dataset-side __inside__/__surrounding__ triplets (data/coco.py:219-225,
    mirroring reference sg2im/data/base_dataset.py:46-49) occur at a
    controlled rate rather than only by chance overlap."""
    boxes, cats = [], []
    for _ in range(n):
        w = float(rng.uniform(0.12, 0.35) * size)
        h = float(rng.uniform(0.12, 0.35) * size)
        x = float(rng.uniform(0, size - w))
        y = float(rng.uniform(0, size - h))
        boxes.append((x, y, w, h))
        cats.append(int(THING_CATEGORIES[rng.integers(len(THING_CATEGORIES))][0]))
    if nested_fraction and rng.random() < nested_fraction and n >= 2:
        # Replace the last box with one strictly inside the first —
        # CENTER-DOMINANTLY: the reference's containment test computes "x1"
        # as x0 + w/2 (the center; sg2im/data/base_dataset.py:47-48 and
        # coco.py:382-383), so only nestings whose inner center stays on the
        # outer-center side of both axes register as __inside__/
        # __surrounding__. Uniform placement passes that test only 25% of
        # the time (per-axis exactly 1/2, independent axes); constraining
        # the offset makes every generated nesting detectable.
        # outer resized up and the inner kept ≥55% of it so the inner box
        # clears the loader's min_object_size (2% image area) filter
        ow = float(rng.uniform(0.3, 0.45) * size)
        oh = float(rng.uniform(0.3, 0.45) * size)
        ox = float(rng.uniform(0, size - ow))
        oy = float(rng.uniform(0, size - oh))
        boxes[0] = (ox, oy, ow, oh)
        iw = float(rng.uniform(0.55, 0.7) * ow)
        ih = float(rng.uniform(0.55, 0.7) * oh)
        ix = float(ox + rng.uniform(0.05, 0.9 * (1 - iw / ow) / 2) * ow)
        iy = float(oy + rng.uniform(0.05, 0.9 * (1 - ih / oh) / 2) * oh)
        boxes[-1] = (ix, iy, iw, ih)
    return boxes, cats


def _sample_nested_chain(rng, size, n):
    """All n objects strictly nested (A ⊃ B ⊃ C ...), so __inside__/
    __surrounding__ dominate the scene's true triplets — the basin-boundary
    arm testing whether the converse REINFORCE recovers the nesting rows
    once their TRUE usage outweighs their sampled-converse usage."""
    boxes, cats = [], []
    w = float(rng.uniform(0.7, 0.9) * size)
    h = float(rng.uniform(0.7, 0.9) * size)
    x = float(rng.uniform(0, size - w))
    y = float(rng.uniform(0, size - h))
    for _ in range(n):
        boxes.append((x, y, w, h))
        cats.append(int(THING_CATEGORIES[rng.integers(len(THING_CATEGORIES))][0]))
        nw = float(rng.uniform(0.45, 0.65) * w)
        nh = float(rng.uniform(0.45, 0.65) * h)
        # center-dominant placement so the reference's center-as-x1
        # containment test (see _sample_objects) detects every level
        x = float(x + rng.uniform(0.05, 0.9 * (1 - nw / w) / 2) * w)
        y = float(y + rng.uniform(0.05, 0.9 * (1 - nh / h) / 2) * h)
        w, h = nw, nh
    return boxes, cats


def _rect_poly(x, y, w, h):
    return [float(x), float(y), float(x + w), float(y),
            float(x + w), float(y + h), float(x), float(y + h)]


def make_coco(root: str, n_train: int, n_val: int, size: int, seed: int,
              nested_fraction: float = 0.0, nested_chain: float = 0.0,
              photometric: float = 0.0, image_format: str = "jpg"):
    rng = np.random.default_rng(seed)
    photo_rng = np.random.default_rng(seed + 77_777)
    base = os.path.join(root, "MSCoco")
    ann_dir = os.path.join(base, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    for split, n in (("train2017", n_train), ("val2017", n_val)):
        img_dir = os.path.join(base, "images", split)
        os.makedirs(img_dir, exist_ok=True)
        images, inst_anns, stuff_anns = [], [], []
        ann_id = 1
        for i in range(n):
            iid = (1 if split == "train2017" else 10_000_000) + i
            fname = f"{iid:012d}.{image_format}"
            if nested_chain and rng.random() < nested_chain:
                # 4 concentric boxes; deeper levels fall under the loader's
                # min_object_size (2% area) filter
                n_obj = 4
                boxes, cats = _sample_nested_chain(rng, size, n_obj)
            else:
                n_obj = int(rng.integers(4, 9))
                boxes, cats = _sample_objects(rng, size, n_obj, nested_fraction)
            img, quality = _apply_photometric(
                photo_rng, _draw_scene(rng, size, boxes, cats), photometric)
            if image_format == "png":
                # lossless: removes the DCT ringing/blocking that gives the
                # image D an un-imitable real-vs-generated cue (round-5 D
                # saturation study, docs/RESULTS.md) — conv generators
                # cannot produce JPEG artifacts
                img.save(os.path.join(img_dir, fname))
            else:
                img.save(os.path.join(img_dir, fname), quality=quality)
            images.append({"id": iid, "file_name": fname,
                           "width": size, "height": size})
            for (x, y, w, h), cid in zip(boxes, cats):
                inst_anns.append({
                    "id": ann_id, "image_id": iid, "category_id": cid,
                    "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                    "segmentation": [_rect_poly(x, y, w, h)]})
                ann_id += 1
            # grass + sky stuff regions
            for (sy, sh), (cid, _, _) in zip(((size // 2, size // 2),
                                              (0, size // 2)),
                                             STUFF_CATEGORIES):
                stuff_anns.append({
                    "id": ann_id, "image_id": iid, "category_id": cid,
                    "bbox": [0.0, float(sy), float(size), float(sh)],
                    "area": float(size * sh), "iscrowd": 0,
                    "segmentation": [_rect_poly(0, sy, size, sh)]})
                ann_id += 1
        cats_inst = [{"id": cid, "name": name}
                     for cid, name, _ in THING_CATEGORIES]
        cats_stuff = [{"id": cid, "name": name}
                      for cid, name, _ in STUFF_CATEGORIES]
        with open(os.path.join(ann_dir, f"instances_{split}.json"), "w") as f:
            json.dump({"images": images, "categories": cats_inst,
                       "annotations": inst_anns}, f)
        with open(os.path.join(ann_dir, f"stuff_{split}.json"), "w") as f:
            json.dump({"images": images, "categories": cats_stuff,
                       "annotations": stuff_anns}, f)
        print(f"coco {split}: {n} images, {len(inst_anns)} instance anns "
              f"-> {img_dir}")


def _spatial_predicate(rng, a, b):
    """Pick a geometrically TRUE predicate for boxes a, b (so VG relations
    are learnable, like real annotations)."""
    ax, ay = a[0] + a[2] / 2, a[1] + a[3] / 2
    bx, by = b[0] + b[2] / 2, b[1] + b[3] / 2
    choices = []
    if ax < bx:
        choices.append("left of")
    if ax > bx:
        choices.append("right of")
    if ay < by:
        choices.append("above")
    if ay > by:
        choices.append("below")
    return choices[rng.integers(len(choices))] if choices else "left of"


def make_vg(root: str, n_images: int, size: int, seed: int,
            photometric: float = 0.0):
    rng = np.random.default_rng(seed + 1)
    photo_rng = np.random.default_rng(seed + 77_778)
    base = os.path.join(root, "vg")
    img_dir = os.path.join(base, "images", "VG_100K")
    os.makedirs(img_dir, exist_ok=True)
    images, objects, rels = [], [], []
    oid = 1
    for i in range(n_images):
        iid = i + 1
        fname = f"{iid}.jpg"
        n_obj = int(rng.integers(4, 9))
        boxes, cats = _sample_objects(rng, size, n_obj)
        img, quality = _apply_photometric(
            photo_rng, _draw_scene(rng, size, boxes, cats), photometric)
        img.save(os.path.join(img_dir, fname), quality=quality)
        images.append({"image_id": iid, "width": size, "height": size,
                       "url": f"https://synthetic/VG_100K/{fname}"})
        names = {cid: name for cid, name, _ in THING_CATEGORIES}
        objs = []
        for (x, y, w, h), cid in zip(boxes, cats):
            objs.append({"object_id": oid, "names": [names[cid]],
                         "x": int(x), "y": int(y), "w": int(w), "h": int(h)})
            oid += 1
        objects.append({"image_id": iid, "objects": objs})
        # 2 relations per object on average, geometrically true
        rel_list = []
        for _ in range(2 * n_obj):
            ia, ib = rng.choice(len(objs), size=2, replace=False)
            pred = _spatial_predicate(
                rng, boxes[ia], boxes[ib])
            rel_list.append({
                "predicate": pred,
                "subject": {"object_id": objs[ia]["object_id"]},
                "object": {"object_id": objs[ib]["object_id"]}})
        rels.append({"image_id": iid, "relationships": rel_list})
    with open(os.path.join(base, "image_data.json"), "w") as f:
        json.dump(images, f)
    with open(os.path.join(base, "objects.json"), "w") as f:
        json.dump(objects, f)
    with open(os.path.join(base, "relationships.json"), "w") as f:
        json.dump(rels, f)
    print(f"vg: {n_images} images, {oid - 1} objects -> {base}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--root", default="datasets/synth")
    ap.add_argument("--coco_train", type=int, default=512)
    ap.add_argument("--coco_val", type=int, default=128)
    ap.add_argument("--vg_images", type=int, default=512)
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--nested_fraction", type=float, default=0.0,
                    help="per-scene probability of one strictly-nested box "
                         "pair (drives __inside__/__surrounding__ triplets)")
    ap.add_argument("--nested_chain", type=float, default=0.0,
                    help="fraction of scenes that are a 4-deep concentric "
                         "nesting chain (pushes true nesting-triplet usage "
                         "toward parity with the spatial relations)")
    ap.add_argument("--image_format", choices=("jpg", "png"), default="jpg",
                    help="on-disk codec for the COCO images; png removes "
                         "JPEG artifacts (an un-imitable real-image cue "
                         "for the image D)")
    ap.add_argument("--photometric", type=float, default=0.0,
                    help="strength of photometric hardening (smooth texture "
                         "fields, brightness/contrast jitter, mild noise, "
                         "randomized JPEG quality) so real images are not "
                         "trivially separable from generator output; 0 = "
                         "legacy flat-color scenes")
    args = ap.parse_args(argv)
    if args.coco_train:
        make_coco(args.root, args.coco_train, args.coco_val, args.image_size,
                  args.seed, args.nested_fraction, args.nested_chain,
                  args.photometric, args.image_format)
    if args.vg_images:
        make_vg(args.root, args.vg_images, args.image_size, args.seed,
                args.photometric)


if __name__ == "__main__":
    main()
