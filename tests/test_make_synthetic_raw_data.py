"""The synthetic raw-data generator must produce datasets the real COCO/VG
pipelines load end-to-end (scripts/make_synthetic_raw_data.py — the stand-in
for the reference's download_{coco,vg}.sh in a no-network image)."""
import subprocess
import sys

import numpy as np


def test_coco_and_vg_pipelines_load_generated_data(tmp_path):
    from scripts.make_synthetic_raw_data import make_coco, make_vg

    root = str(tmp_path)
    make_coco(root, n_train=12, n_val=6, size=64, seed=0)
    make_vg(root, n_images=10, size=64, seed=0)

    from canonicalsg2im_tpu.data.coco import CocoSceneGraphDataset
    from canonicalsg2im_tpu.data.pipeline import BucketedLoader

    ds = CocoSceneGraphDataset(
        image_dir=f"{root}/MSCoco/images/train2017",
        instances_json=f"{root}/MSCoco/annotations/instances_train2017.json",
        stuff_json=f"{root}/MSCoco/annotations/stuff_train2017.json",
        packed=True, partition="train", image_size=(32, 32), min_objects=3,
        max_objects=100, include_dummies=True, learned_converse=True,
        learned_transitivity=True, val_split="hash")
    assert len(ds) == 12
    s = ds[0]
    assert s.image.shape == (32, 32, 3)
    assert s.triplets.shape[0] > 0
    b = next(iter(BucketedLoader(ds, 2, prefetch=0)))
    assert b.imgs.shape[0] == 2

    # val partition hash split is non-empty and disjoint from test
    val = CocoSceneGraphDataset(
        image_dir=f"{root}/MSCoco/images/val2017",
        instances_json=f"{root}/MSCoco/annotations/instances_val2017.json",
        stuff_json=f"{root}/MSCoco/annotations/stuff_val2017.json",
        packed=True, partition="val", image_size=(32, 32), min_objects=3,
        max_objects=100, include_dummies=True, val_split="hash")
    assert 0 < len(val) < 6

    # VG chain: preprocess to HDF5 with the real CLI, then load
    r = subprocess.run(
        [sys.executable, "-m", "scripts.preprocess_vg",
         "--vg_dir", f"{root}/vg", "--output_dir", f"{root}/vg",
         "--min_object_instances", "1", "--min_relationship_instances", "1",
         "--min_image_size", "32", "--min_box_size", "4"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]

    from canonicalsg2im_tpu.data.vg import VGSceneGraphDataset

    vg = VGSceneGraphDataset(
        h5_path=f"{root}/vg/train.h5", image_dir=f"{root}/vg/images",
        vocab_json=f"{root}/vg/vocab.json", packed=False,
        image_size=(32, 32), min_objects=3, max_objects=10)
    assert len(vg) > 0
    s = vg[0]
    assert s.image.shape == (32, 32, 3)
    assert np.isfinite(s.boxes[s.boxes != -1]).all()


def _highfreq_energy(arr):
    """Mean |Laplacian| — high-frequency content of an RGB uint8 array."""
    a = arr.astype(np.float64).mean(axis=-1)
    lap = (-4 * a[1:-1, 1:-1] + a[:-2, 1:-1] + a[2:, 1:-1]
           + a[1:-1, :-2] + a[1:-1, 2:])
    return np.abs(lap).mean()


def test_photometric_hardening_textures_images(tmp_path):
    """--photometric > 0 must (a) keep annotations/geometry identical to the
    flat generator at the same seed, (b) add real texture (the image-D fix:
    flat-color scenes are trivially separable from generator output),
    (c) stay deterministic per seed."""
    import json
    import os

    from PIL import Image

    from scripts.make_synthetic_raw_data import make_coco

    flat, hard, hard2 = (str(tmp_path / d) for d in ("flat", "hard", "hard2"))
    make_coco(flat, n_train=6, n_val=0, size=64, seed=3)
    make_coco(hard, n_train=6, n_val=0, size=64, seed=3, photometric=1.0)
    make_coco(hard2, n_train=6, n_val=0, size=64, seed=3, photometric=1.0)

    ann = "MSCoco/annotations/instances_train2017.json"
    with open(os.path.join(flat, ann)) as f:
        flat_ann = json.load(f)
    with open(os.path.join(hard, ann)) as f:
        hard_ann = json.load(f)
    # same seed -> identical geometry/annotations (photometric uses its own
    # rng stream, leaving the scene-geometry stream untouched)
    assert flat_ann["annotations"] == hard_ann["annotations"]

    img_rel = "MSCoco/images/train2017"
    names = sorted(os.listdir(os.path.join(flat, img_rel)))
    e_flat, e_hard, pix_delta = [], [], []
    for n in names:
        a = np.asarray(Image.open(os.path.join(flat, img_rel, n)))
        b = np.asarray(Image.open(os.path.join(hard, img_rel, n)))
        c = np.asarray(Image.open(os.path.join(hard2, img_rel, n)))
        assert a.shape == b.shape == (64, 64, 3)
        np.testing.assert_array_equal(b, c)  # deterministic per seed
        e_flat.append(_highfreq_energy(a))
        e_hard.append(_highfreq_energy(b))
        pix_delta.append(np.abs(a.astype(float) - b.astype(float)).mean())
    # hardened images differ materially from flat ones (texture fields +
    # jitter actually landed) and carry more high-frequency energy on
    # average (per-image margins are noisy at 64 px where JPEG ringing of
    # the flat scenes dominates the Laplacian)
    assert min(pix_delta) > 4.0, pix_delta
    assert np.mean(e_hard) > np.mean(e_flat) + 0.5, (e_flat, e_hard)


def test_png_format_is_lossless_and_loads(tmp_path):
    """--image_format png must write codec-artifact-free images (the round-5
    D-saturation study's knob) that the COCO pipeline loads unchanged."""
    import json
    import os

    from PIL import Image

    from scripts.make_synthetic_raw_data import make_coco

    root = str(tmp_path)
    make_coco(root, n_train=4, n_val=2, size=64, seed=1, photometric=0.3,
              image_format="png")
    img_dir = os.path.join(root, "MSCoco/images/train2017")
    names = sorted(os.listdir(img_dir))
    assert names and all(n.endswith(".png") for n in names)
    with open(os.path.join(
            root, "MSCoco/annotations/instances_train2017.json")) as f:
        ann = json.load(f)
    assert all(im["file_name"].endswith(".png") for im in ann["images"])
    # lossless round-trip: saving the decoded array again is bit-identical
    a = np.asarray(Image.open(os.path.join(img_dir, names[0])))
    p2 = tmp_path / "resave.png"
    Image.fromarray(a).save(p2)
    np.testing.assert_array_equal(a, np.asarray(Image.open(p2)))

    from canonicalsg2im_tpu.data.coco import CocoSceneGraphDataset

    ds = CocoSceneGraphDataset(
        image_dir=img_dir,
        instances_json=f"{root}/MSCoco/annotations/instances_train2017.json",
        stuff_json=f"{root}/MSCoco/annotations/stuff_train2017.json",
        packed=True, partition="train", image_size=(32, 32), min_objects=3,
        max_objects=100, include_dummies=True, val_split="hash")
    assert len(ds) == 4 and ds[0].image.shape == (32, 32, 3)
