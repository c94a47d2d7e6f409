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
