"""Dataset registry — the counterpart of `sg2im/data/dataset_params.py`.

``get_dataset(name, partition, cfg)`` returns a dataset object exposing
``__len__``/``__getitem__ -> SceneGraphSample``/``vocab`` plus the mutable
``converse_candidates_weights`` host copy of the learned canonicalization
weights.
"""
from __future__ import annotations

from canonicalsg2im_tpu.config import Config


def get_dataset(name: str, partition: str, cfg: Config):
    ds = _build_dataset(name, partition, cfg)
    # The SG->Layout-only stage (--skip_generation) never reads images.
    # Rendering anyway costs ~1 s/step host time at 256²/batch 64 AND ships
    # a ~50 MB image block per step to the device — on the tunneled TPU
    # backend those uploads are retained host-side, which grew the round-4
    # conv_rec arm to 130 GB anon RSS and drew the OOM killer. Applied here
    # uniformly because every dataset class defaults render_images=True.
    ds.render_images = not cfg.skip_generation
    return ds


def _whitelist(spec):
    """None -> all categories; "" -> none; "a,b" -> those categories."""
    if spec is None:
        return None
    return [s for s in str(spec).split(",") if s]


def _build_dataset(name: str, partition: str, cfg: Config):
    common = dict(
        include_dummies=cfg.include_dummies,
        learned_converse=cfg.learned_converse,
        learned_transitivity=cfg.learned_transitivity,
        learned_symmetry=cfg.learned_symmetry,
        converse_epsilon=cfg.converse_epsilon,
        image_size=cfg.image_size,
        mask_size=cfg.mask_size,
    )
    if name in ("packed_clevr_syn", "synthetic"):
        from canonicalsg2im_tpu.data.synthetic_clevr import SyntheticClevrDataset

        return SyntheticClevrDataset(
            num_samples=(cfg.num_train_samples or 10_000) if partition == "train"
            else (cfg.num_val_samples or 1024),
            min_objects=cfg.min_objects or 3,
            max_objects=cfg.max_objects or 10,
            seed=cfg.seed,
            mode=partition,
            nested_fraction=cfg.syn_nested_fraction,
            **common,
        )
    if name in ("packed_clevr", "clevr"):
        from canonicalsg2im_tpu.data.clevr import ClevrDialogDataset

        return ClevrDialogDataset(
            base_path=f"{cfg.dataroot}/CLEVR/CLEVR_Dialog",
            mode="train" if partition == "train" else "val",
            packed=(name == "packed_clevr"),
            max_objects=cfg.max_objects or (1000 if name == "packed_clevr" else 10),
            **common,
        )
    if name in ("coco", "packed_coco", "canonical_packed_coco"):
        from canonicalsg2im_tpu.data.coco import CocoSceneGraphDataset

        split = "train2017" if partition == "train" else "val2017"
        packed = name != "coco"
        return CocoSceneGraphDataset(
            image_dir=f"{cfg.dataroot}/MSCoco/images/{split}",
            instances_json=f"{cfg.dataroot}/MSCoco/annotations/instances_{split}.json",
            stuff_json=f"{cfg.dataroot}/MSCoco/annotations/stuff_{split}.json",
            packed=packed,
            partition=partition,
            canonical_sampling=(name == "canonical_packed_coco"),
            min_objects=cfg.min_objects or (16 if packed else 3),
            max_objects=cfg.max_objects or (1000 if packed else 8),
            min_object_size=cfg.min_object_size,
            val_split=cfg.coco_val_split,
            instance_whitelist=_whitelist(cfg.instance_whitelist),
            stuff_whitelist=_whitelist(cfg.stuff_whitelist),
            **common,
        )
    if name in ("vg", "packed_vg"):
        from canonicalsg2im_tpu.data.vg import VGSceneGraphDataset

        h5 = {"train": cfg.train_h5, "val": cfg.val_h5, "test": cfg.val_h5}[partition]
        return VGSceneGraphDataset(
            h5_path=h5,
            image_dir=cfg.vg_image_dir,
            vocab_json=cfg.vocab_json,
            packed=(name == "packed_vg"),
            max_objects=cfg.max_objects or (100 if name == "packed_vg" else 10),
            min_objects=cfg.min_objects or (16 if name == "packed_vg" else 3),
            use_orphaned_objects=cfg.vg_use_orphaned_objects,
            **common,
        )
    raise ValueError(f"Unknown dataset {name!r}")
