"""COCO / VG loaders driven end-to-end on synthetic fixture data, including
the VG JSON->HDF5 preprocessor."""
import json
import os

import numpy as np
import pytest

from canonicalsg2im_tpu.data import BucketedLoader
from canonicalsg2im_tpu.data.coco import CocoSceneGraphDataset
from canonicalsg2im_tpu.data.clevr import ClevrDialogDataset


def _save_img(path, w, h, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


@pytest.fixture(scope="module")
def coco_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    images, inst_anns, stuff_anns = [], [], []
    rng = np.random.default_rng(0)
    for iid in range(1, 5):
        W, H = 64, 48
        fname = f"{iid:012d}.jpg"
        _save_img(img_dir / fname, W, H, seed=iid)
        images.append({"id": iid, "file_name": fname, "width": W, "height": H})
        for k in range(4):
            x, y = rng.uniform(0, 30, 2)
            w, h = rng.uniform(10, 18, 2)
            poly = [float(x), float(y), float(x + w), float(y),
                    float(x + w), float(y + h), float(x), float(y + h)]
            ann = {"image_id": iid, "bbox": [float(x), float(y), float(w),
                                             float(h)],
                   "category_id": 1 + k % 2, "segmentation": [poly]}
            (inst_anns if k % 2 == 0 else stuff_anns).append(
                {**ann, "category_id": (1 + k % 2) if k % 2 == 0 else 91})
    inst = {"images": images,
            "categories": [{"id": 1, "name": "person"},
                           {"id": 2, "name": "dog"}],
            "annotations": inst_anns}
    stuff = {"images": images,
             "categories": [{"id": 91, "name": "grass"}],
             "annotations": stuff_anns}
    ipath, spath = root / "inst.json", root / "stuff.json"
    ipath.write_text(json.dumps(inst))
    spath.write_text(json.dumps(stuff))
    return str(img_dir), str(ipath), str(spath)


def test_coco_packed_dataset(coco_fixture):
    img_dir, inst, stuff = coco_fixture
    ds = CocoSceneGraphDataset(
        img_dir, inst, stuff, packed=True, partition="train",
        image_size=(32, 32), mask_size=8, min_objects=1, max_objects=100,
        min_object_size=0.0, include_dummies=True, learned_converse=True,
        learned_transitivity=True)
    assert len(ds) > 0
    s = ds[0]
    assert s.objs.shape[1] == 1
    assert s.image.shape == (32, 32, 3)
    assert s.masks is not None and s.masks.shape[1:] == (8, 8)
    assert s.triplets.shape[0] > 0
    # dummy row present
    assert s.objs[-1, 0] == 0 and (s.boxes[-1] == -1).all()
    loader = BucketedLoader(ds, 2, prefetch=0, bucket_objects=(8, 16),
                            bucket_triplets=(64, 128, 256, 512))
    b = next(iter(loader))
    assert b.masks.shape[0] == 2


def test_coco_sparse_dataset(coco_fixture):
    img_dir, inst, stuff = coco_fixture
    ds = CocoSceneGraphDataset(
        img_dir, inst, stuff, packed=False, partition="train",
        image_size=(32, 32), mask_size=0, min_objects=1, max_objects=100,
        min_object_size=0.0, use_converse=True)
    s = ds[0]
    assert s.masks is None
    # sparse: ~one triplet per object
    assert 0 < s.triplets.shape[0] <= s.objs.shape[0]
    # converse-canonical folding: only left-of/above/surrounding appear
    p2i = ds.vocab["pred_name_to_idx"]
    allowed = {p2i["__left of__"], p2i["__above__"], p2i["__surrounding__"],
               p2i["__inside__"]}
    assert set(s.triplets[:, 1].tolist()) <= allowed


@pytest.fixture(scope="module")
def vg_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("vg")
    img_root = root / "images" / "VG_100K"
    img_root.mkdir(parents=True)
    images, objects, rels = [], [], []
    rng = np.random.default_rng(1)
    oid = 0
    for iid in range(1, 7):
        W = H = 256
        fname = f"{iid}.jpg"
        _save_img(img_root / fname, W, H, seed=iid)
        images.append({"image_id": iid, "width": W, "height": H,
                       "url": f"https://x/VG_100K/{fname}"})
        objs = []
        for k in range(5):
            objs.append({"object_id": oid,
                         "names": ["person" if k % 2 else "tree"],
                         "x": int(rng.uniform(0, 150)),
                         "y": int(rng.uniform(0, 150)),
                         "w": int(rng.uniform(40, 100)),
                         "h": int(rng.uniform(40, 100))})
            oid += 1
        objects.append({"image_id": iid, "objects": objs})
        rels.append({"image_id": iid, "relationships": [
            {"predicate": "next to",
             "subject": {"object_id": objs[0]["object_id"]},
             "object": {"object_id": objs[1]["object_id"]}},
            {"predicate": "behind",
             "subject": {"object_id": objs[2]["object_id"]},
             "object": {"object_id": objs[3]["object_id"]}},
        ]})
    (root / "image_data.json").write_text(json.dumps(images))
    (root / "objects.json").write_text(json.dumps(objects))
    (root / "relationships.json").write_text(json.dumps(rels))
    return root, img_root.parent


def test_vg_preprocess_and_load(vg_fixture):
    root, img_dir = vg_fixture
    from scripts.preprocess_vg import main as preprocess

    class A:
        vg_dir = str(root)
        output_dir = str(root)
        splits_json = None
        min_image_size = 1
        min_object_instances = 1
        min_relationship_instances = 1
        min_box_size = 1
        max_objects_per_image = 10
        max_relationships_per_image = 10

    preprocess(A())
    assert os.path.exists(root / "train.h5")
    assert os.path.exists(root / "vocab.json")

    from canonicalsg2im_tpu.data.vg import VGSceneGraphDataset

    ds = VGSceneGraphDataset(
        str(root / "train.h5"), str(img_dir), str(root / "vocab.json"),
        packed=True, image_size=(64, 64), min_objects=0, max_objects=10,
        include_dummies=True, learned_transitivity=True)
    assert len(ds) > 0
    s = ds[0]
    assert s.image.shape == (64, 64, 3)
    assert s.triplets.shape[0] > 0
    # annotated predicates survive alongside augmented spatial ones
    p2i = ds.vocab["pred_name_to_idx"]
    preds = set(s.triplets[:, 1].tolist())
    assert preds & {p2i["next to"], p2i["behind"]} or len(preds) > 0
    loader = BucketedLoader(ds, 2, prefetch=0)
    b = next(iter(loader))
    assert b.objs.shape[0] == 2


def test_clevr_dialog_dataset(tmp_path):
    scenes = {"scenes": []}
    rng = np.random.default_rng(2)
    for i in range(3):
        objs = []
        for k in range(4):
            objs.append({
                "shape": ["cube", "sphere", "cylinder"][k % 3],
                "color": "red", "material": "rubber",
                "size": "small" if k % 2 else "large",
                "pixel_coords": [float(rng.uniform(100, 380)),
                                 float(rng.uniform(80, 240)), 10.0],
                "3d_coords": [float(rng.uniform(-3, 3)),
                              float(rng.uniform(-3, 3)), 0.7],
            })
        scenes["scenes"].append({"image_index": i, "objects": objs,
                                 "directions": {"right": [0.65, 0.75, 0.0]}})
    (tmp_path / "scenes").mkdir()
    (tmp_path / "scenes" / "CLEVR_val_scenes.json").write_text(
        json.dumps(scenes))
    ds = ClevrDialogDataset(str(tmp_path), "val", image_size=(32, 32),
                            include_dummies=True, learned_transitivity=True)
    assert len(ds) == 3
    s = ds[1]
    assert s.objs.shape == (5, 4)  # 4 objects + dummy
    assert s.image is None  # no image files in fixture
    assert s.triplets.shape[0] > 0


@pytest.fixture(scope="module")
def coco_val_fixture(tmp_path_factory):
    """COCO fixture whose image ids straddle the reference val-id list."""
    from canonicalsg2im_tpu.data.coco import load_reference_val_ids

    ref = load_reference_val_ids()
    on_list, off_list = ref[:3], [1, 2, 3]
    root = tmp_path_factory.mktemp("coco_val")
    img_dir = root / "images"
    img_dir.mkdir()
    images, inst_anns, stuff_anns = [], [], []
    rng = np.random.default_rng(0)
    for iid in on_list + off_list:
        W, H = 64, 48
        fname = f"{iid:012d}.jpg"
        _save_img(img_dir / fname, W, H, seed=iid % 97)
        images.append({"id": iid, "file_name": fname, "width": W, "height": H})
        for k in range(4):
            x, y = rng.uniform(0, 30, 2)
            w, h = rng.uniform(10, 18, 2)
            poly = [float(x), float(y), float(x + w), float(y),
                    float(x + w), float(y + h), float(x), float(y + h)]
            ann = {"image_id": iid,
                   "bbox": [float(x), float(y), float(w), float(h)],
                   "category_id": 1 if k % 2 == 0 else 91,
                   "segmentation": [poly]}
            (inst_anns if k % 2 == 0 else stuff_anns).append(ann)
    inst = {"images": images,
            "categories": [{"id": 1, "name": "person"}],
            "annotations": inst_anns}
    stuff = {"images": images,
             "categories": [{"id": 91, "name": "grass"}],
             "annotations": stuff_anns}
    ipath, spath = root / "inst.json", root / "stuff.json"
    ipath.write_text(json.dumps(inst))
    spath.write_text(json.dumps(stuff))
    return str(img_dir), str(ipath), str(spath), on_list, off_list


def test_coco_reference_val_split(coco_val_fixture):
    """val = ids on the reference list, test = the rest
    (reference dataset_params.py:188-191), as the default split."""
    img_dir, inst, stuff, on_list, off_list = coco_val_fixture

    def make(partition, **kw):
        return CocoSceneGraphDataset(
            img_dir, inst, stuff, packed=True, partition=partition,
            image_size=(32, 32), min_objects=1, max_objects=100,
            min_object_size=0.0, **kw)

    val = make("val")
    test = make("test")
    assert sorted(val.image_ids) == sorted(on_list)
    assert sorted(test.image_ids) == sorted(off_list)
    # disjoint and exhaustive over the fixture
    assert not set(val.image_ids) & set(test.image_ids)
    assert set(val.image_ids) | set(test.image_ids) == set(on_list + off_list)

    # legacy hash split stays available behind the flag
    val_h = make("val", val_split="hash")
    test_h = make("test", val_split="hash")
    assert all(i % 2 == 0 for i in val_h.image_ids)
    assert all(i % 2 == 1 for i in test_h.image_ids)


def test_reference_val_id_list_integrity():
    from canonicalsg2im_tpu.data.coco import load_reference_val_ids

    ids = load_reference_val_ids()
    assert len(ids) == 1024 and len(set(ids)) == 1024
    # spot-check the reference's first/last entries (packed_coco.py:12,90)
    assert ids[0] == 252219 and ids[-1] == 123585


def test_coco_stuff_whitelist_empty_excludes_stuff(coco_fixture):
    """Explicit [] whitelist excludes the class (dataset_params passes ""
    through as []); None keeps everything. Scenes themselves survive the
    ids_with_stuff filter either way."""
    img_dir, inst, stuff = coco_fixture
    kw = dict(packed=True, partition="train", image_size=(32, 32),
              min_objects=1, max_objects=100, min_object_size=0.0)
    ds_all = CocoSceneGraphDataset(img_dir, inst, stuff, **kw)
    ds_nostuff = CocoSceneGraphDataset(img_dir, inst, stuff,
                                       stuff_whitelist=[], **kw)
    assert len(ds_nostuff) == len(ds_all) > 0
    grass = ds_all.vocab["object_name_to_idx"]["grass"]
    import numpy as np
    assert any(grass in np.asarray(ds_all[i].objs)[:, 0]
               for i in range(len(ds_all)))
    assert not any(grass in np.asarray(ds_nostuff[i].objs)[:, 0]
                   for i in range(len(ds_nostuff)))


def test_whitelist_spec_parsing():
    from canonicalsg2im_tpu.data.dataset_params import _whitelist
    assert _whitelist(None) is None
    assert _whitelist("") == []
    assert _whitelist("person,dog") == ["person", "dog"]
