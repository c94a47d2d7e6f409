"""Run the REFERENCE's own torch implementation of WSGC REINFORCE on CPU to
test whether it reproduces the converse-weight bistability observed in this
framework's flagship run (docs/RESULTS.md "Converse outcome").

The r3b flagship (packed_clevr_syn, nested_fraction 0.25, max_objects 10,
batch 16) locked a wrong, self-consistent converse equilibrium for 4/6
relations. Round-3 argued mechanism-parity with the reference by code
reading only; this experiment closes the loop by driving the reference's
*actual* modules — `sg2im.model.Sg2LayoutModel`, the dataset-side sampler
`scripts.graphs_utils.get_edge_converse_triplets`, the canonicalization
chain `sg2im.data.base_dataset.BaseDataset.add_location_triplets/
add_learnt_triplets`, the `triu+triu.T` symmetrization
`sg2im/model.py:8-15`, and the REINFORCE update of
`scripts/train.py:362-386` — on the same synthetic scene distribution, and
printing the reference's own converse tables
(`sg2im/data/utils.py:147-151`).

This file is an experiment HARNESS around imported reference code (torch on
CPU is the sanctioned test-oracle path, CLAUDE.md); only the scene generator
(a port of our synthetic_clevr._scene, so the data distribution matches the
flagship exactly) and the ~10-line bbox loss (pix2pix_model.py:72-85
semantics) are re-stated here.

Usage (NOT -m; the reference's `scripts` package must win the name):
  python scripts/replicate_reference_converse.py --steps 2000 \
      --nested_fraction 0.25 --max_objects 10 --seed 0
"""
import argparse
import sys
import time
import types

sys.path.insert(0, "/root/reference")  # reference modules incl. `scripts.*`

# torchvision is not in this image; the reference's sg2im.data.utils imports
# it at module level but this experiment never calls the transform helpers.
for _name in ("torchvision", "torchvision.transforms"):
    if _name not in sys.modules:
        _m = types.ModuleType(_name)
        _m.__getattr__ = lambda attr, _n=_name: (_ for _ in ()).throw(
            AttributeError(f"stubbed {_n}.{attr} used"))
        sys.modules[_name] = _m
sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
import PIL.Image  # noqa: E402  (reference utils references PIL.Image.BILINEAR
#                  at class-definition time via a bare `import PIL`)

import numpy as np
import torch
import torch.nn.functional as F

from sg2im.model import Sg2LayoutModel, get_conv_converse  # noqa: E402
from sg2im.data.base_dataset import BaseDataset  # noqa: E402
from sg2im.data.utils import (print_compute_converse_edges,  # noqa: E402
                              print_compute_transitive_edges)
from scripts.graphs_utils import calc_log_p  # noqa: E402  (reference's)

META_RELATIONS = ["__padding__", "__in_image__"]
AUGMENTED_RELATIONS = ["__below__", "__above__", "__left of__",
                       "__right of__", "__inside__", "__surrounding__"]
TRUE_CONVERSE = {"__below__": "__above__", "__above__": "__below__",
                 "__left of__": "__right of__", "__right of__": "__left of__",
                 "__inside__": "__surrounding__",
                 "__surrounding__": "__inside__"}
CLEVR_ATTRIBUTES = {
    "shape": {"__image__": 0, "cube": 1, "sphere": 2, "cylinder": 3},
    "color": {"__image__": 0, "gray": 1, "red": 2, "blue": 3, "green": 4,
              "brown": 5, "purple": 6, "cyan": 7, "yellow": 8},
    "material": {"__image__": 0, "rubber": 1, "metal": 2},
    "size": {"__image__": 0, "small": 1, "large": 2},
}


def build_vocab():
    vocab = {"pred_name_to_idx": {}, "pred_idx_to_name": []}
    for p in META_RELATIONS + AUGMENTED_RELATIONS:
        vocab["pred_name_to_idx"][p] = len(vocab["pred_idx_to_name"])
        vocab["pred_idx_to_name"].append(p)
    vocab["attributes"] = {k: dict(v) for k, v in CLEVR_ATTRIBUTES.items()}
    vocab["object_name_to_idx"] = {"__image__": 0}
    return vocab


class SyntheticScenes(BaseDataset):
    """The flagship's synthetic scene distribution, canonicalized by the
    REFERENCE chain (add_location_triplets -> add_dummy_triplets ->
    add_learnt_triplets with live converse sampling)."""

    def __init__(self, vocab, *, min_objects, max_objects, nested_fraction,
                 seed, nested_chain=0.0):
        # deliberately no super().__init__ — BaseDataset.__init__ loads h5
        self.vocab = vocab
        self.min_objects = min_objects
        self.max_objects = max_objects
        self.nested_fraction = nested_fraction
        self.nested_chain = nested_chain
        self.seed = seed
        self.include_dummies = True
        self.learned_converse = True
        self.learned_transitivity = True
        P = len(vocab["pred_name_to_idx"])
        self.converse_candidates_weights = np.zeros((P, P))
        self.attr_names = list(vocab["attributes"].keys())

    def _chain_scene(self, rng):
        """4-deep concentric nesting chain (the winning-mix ingredient from
        the r4/r5 basin sweeps; mirrors scripts/make_synthetic_raw_data.py::
        _sample_nested_chain in the harness's 0-1 coordinates). Center-
        dominant placement so the reference's center-as-x1 containment test
        (base_dataset.py:46-49) detects every level."""
        n = 4
        attrs = np.stack(
            [rng.integers(1, len(self.vocab["attributes"][a]), size=n)
             for a in self.attr_names], axis=1).astype(np.int64)
        size_col = self.attr_names.index("size")
        small = self.vocab["attributes"]["size"]["small"]
        large = self.vocab["attributes"]["size"]["large"]
        boxes = np.zeros((n, 4), np.float32)
        w = float(rng.uniform(0.7, 0.9))
        h = float(rng.uniform(0.7, 0.9))
        x = float(rng.uniform(0, 1 - w))
        y = float(rng.uniform(0, 1 - h))
        for i in range(n):
            boxes[i] = (x, y, w, h)
            attrs[i, size_col] = large if i < 2 else small
            nw = float(rng.uniform(0.45, 0.65) * w)
            nh = float(rng.uniform(0.45, 0.65) * h)
            x = float(x + rng.uniform(0.05, 0.9 * (1 - nw / w) / 2) * w)
            y = float(y + rng.uniform(0.05, 0.9 * (1 - nh / h) / 2) * h)
            w, h = nw, nh
        return attrs, boxes

    def _scene(self, rng):
        # port of canonicalsg2im_tpu/data/synthetic_clevr.py::_scene — the
        # flagship's exact distribution (sizes 0.1/0.2, nested child box
        # placed by the reference containment convention base_dataset.py:46-49)
        if self.nested_chain and rng.uniform() < self.nested_chain:
            return self._chain_scene(rng)
        n = int(rng.integers(self.min_objects, self.max_objects + 1))
        attrs = np.stack(
            [rng.integers(1, len(self.vocab["attributes"][a]), size=n)
             for a in self.attr_names], axis=1).astype(np.int64)
        size_col = self.attr_names.index("size")
        small = self.vocab["attributes"]["size"]["small"]
        obj_size = np.where(attrs[:, size_col] == small, 0.1, 0.2)
        xy = rng.uniform(0.0, 1.0, size=(n, 2)) * (1.0 - obj_size[:, None])
        boxes = np.concatenate([xy, obj_size[:, None], obj_size[:, None]],
                               axis=1).astype(np.float32)
        if n >= 2 and rng.uniform() < self.nested_fraction:
            child, parent = rng.choice(n, size=2, replace=False)
            large = self.vocab["attributes"]["size"]["large"]
            attrs[child, size_col], attrs[parent, size_col] = small, large
            wc, wp = 0.1, 0.2
            obj_size[child], obj_size[parent] = wc, wp
            boxes[parent, 2:] = wp
            boxes[parent, :2] = rng.uniform(0.0, 1.0, size=2) * (1.0 - wp)
            margin = (wp - wc) / 2.0
            boxes[child, :2] = (boxes[parent, :2]
                                + rng.uniform(0.05, 0.95, size=2) * margin)
            boxes[child, 2:] = wc
        return attrs, boxes

    def sample(self, index):
        rng = np.random.default_rng((self.seed, index))
        attrs, boxes = self._scene(rng)
        # dummy __image__ object (reference packed datasets, incl. box -1)
        attrs = np.concatenate([attrs, np.zeros((1, attrs.shape[1]),
                                                np.int64)])
        boxes_list = boxes.tolist() + [[-1, -1, -1, -1]]
        boxes_t = torch.FloatTensor(boxes_list)
        centers = torch.FloatTensor(
            np.stack([boxes[:, 0] + boxes[:, 2] / 2,
                      boxes[:, 1] + boxes[:, 3] / 2], axis=1).tolist()
            + [[-1, -1]])
        objs_first = torch.LongTensor(attrs[:, 0])
        triplets = []
        # reference chain, verbatim modules
        self.add_location_triplets(boxes_t, centers, objs_first, triplets)
        self.add_dummy_triplets(objs_first, triplets)
        triplets, conv_counts, triplet_type = self.add_learnt_triplets(
            triplets, boxes_t.size(0))
        return (torch.LongTensor(attrs), boxes_t,
                torch.LongTensor(np.asarray(triplets)),
                torch.FloatTensor(conv_counts),
                torch.LongTensor(np.asarray(triplet_type)))


def collate(samples, pad_pred):
    """Reference collate semantics (base_dataset.py:180-240): pad objs 0,
    boxes -1, triplets [0, __padding__, 0], triplet_type 0."""
    B = len(samples)
    O = max(s[0].shape[0] for s in samples)
    T = max(s[2].shape[0] for s in samples)
    A = samples[0][0].shape[1]
    objs = torch.zeros(B, O, A, dtype=torch.long)
    boxes = torch.full((B, O, 4), -1.0)
    triplets = torch.zeros(B, T, 3, dtype=torch.long)
    triplets[:, :, 1] = pad_pred
    ttype = torch.zeros(B, T, dtype=torch.long)
    convs = torch.stack([s[3] for s in samples])
    for i, (a, b, t, _, tt) in enumerate(samples):
        objs[i, :a.shape[0]] = a
        boxes[i, :b.shape[0]] = b
        if t.numel():
            triplets[i, :t.shape[0]] = t
            ttype[i, :tt.shape[0]] = tt
    return objs, boxes, triplets, convs, ttype


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--min_objects", type=int, default=3)
    ap.add_argument("--max_objects", type=int, default=10)
    ap.add_argument("--nested_fraction", type=float, default=0.25)
    ap.add_argument("--nested_chain", type=float, default=0.0,
                    help="fraction of scenes that are a 4-deep concentric "
                         "nesting chain (the winning-mix ingredient from "
                         "the basin sweeps)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--print_every", type=int, default=200)
    args = ap.parse_args()

    torch.manual_seed(args.seed)
    vocab = build_vocab()
    ds = SyntheticScenes(vocab, min_objects=args.min_objects,
                         max_objects=args.max_objects,
                         nested_fraction=args.nested_fraction,
                         nested_chain=args.nested_chain,
                         seed=args.seed)

    # flagship model dims (scripts/args.py defaults; our run_args.json)
    opt = argparse.Namespace(
        vocab=vocab, image_size=(256, 256), layout_noise_dim=32,
        mask_noise_dim=64, embedding_dim=32, gconv_dim=128,
        gconv_hidden_dim=512, gconv_num_layers=5, mlp_normalization="none",
        gconv_pooling="avg", learned_init="uniform", mask_size=0,
        g_mask_dim=192)
    model = Sg2LayoutModel(opt)

    # wrapper so the reference's get_conv_converse path applies unchanged
    class _Wrap:
        pass
    wrap = _Wrap()
    wrap.sg_to_layout = _Wrap()
    wrap.sg_to_layout.module = model

    special = {id(model.converse_candidates_weights),
               id(model.trans_candidates_weights)}
    base_params = [p for p in model.parameters() if id(p) not in special]
    # reference optimizer groups (train.py:322-324): base lr, trans 1e-2,
    # converse REINFORCE on its own Adam at 1e-2
    optimizer = torch.optim.Adam(
        [{"params": base_params, "lr": 1e-4},
         {"params": [model.trans_candidates_weights], "lr": 1e-2}])
    optimizer_converse = torch.optim.Adam(
        [{"params": [model.converse_candidates_weights]}], lr=1e-2)

    meta_ids = [vocab["pred_name_to_idx"][p] for p in META_RELATIONS]
    non_meta = set(vocab["pred_name_to_idx"].values()) - set(meta_ids)
    pad_pred = vocab["pred_name_to_idx"]["__padding__"]
    eps = np.finfo(np.float32).eps.item()

    # initial push, as the reference does before the first batch (train.py:311-314)
    ds.converse_candidates_weights = (
        get_conv_converse(wrap).detach().cpu().numpy())

    t0 = time.time()
    idx = 0
    for t in range(1, args.steps + 1):
        samples = []
        for _ in range(args.batch_size):
            samples.append(ds.sample(idx))
            idx += 1
        objs, boxes, triplets, conv_counts, ttype = collate(samples, pad_pred)

        _, boxes_pred, _ = model(objs, triplets, ttype, boxes_gt=boxes)
        # bbox loss, pix2pix_model.py:72-85: masked smooth_l1 * weight 10
        flat_pred = F.smooth_l1_loss(boxes_pred.view(-1, 4),
                                     boxes.view(-1, 4),
                                     reduction="none") * 10.0
        mask = (objs.view(-1, objs.size(-1)).sum(1, keepdim=True)
                != 0).float()
        per_sample = ((flat_pred * mask).view(boxes.shape).sum(dim=[1, 2])
                      / mask.view(boxes.shape[0], boxes.shape[1]).sum(dim=1))
        loss = per_sample.mean()
        r = per_sample.detach()

        optimizer.zero_grad()
        loss.backward()
        optimizer.step()

        # REINFORCE update, train.py:371-385
        if args.batch_size > 1:
            r = (r - r.mean()) / (r.std() + eps)
        conv_mat = get_conv_converse(wrap)
        log_prob = calc_log_p(conv_mat, non_meta, conv_counts)
        loss_conv = torch.mean(r * log_prob)
        optimizer_converse.zero_grad()
        loss_conv.backward()
        optimizer_converse.step()

        conv_mat = get_conv_converse(wrap)
        ds.converse_candidates_weights = conv_mat.detach().cpu().numpy()

        if t % args.print_every == 0 or t == args.steps:
            rate = t * args.batch_size / (time.time() - t0)
            print(f"\n=== step {t} bbox_pred={float(loss):.4f} "
                  f"loss_conv={float(loss_conv):.4f} "
                  f"({rate:.1f} samples/s)", flush=True)
            print("reference learned converse probabilities:")
            print_compute_converse_edges({}, conv_mat.detach(), vocab,
                                         non_meta)
            print("reference learned transitivity sigmoid(w):")
            print_compute_transitive_edges(
                {}, torch.sigmoid(model.trans_candidates_weights.detach()),
                vocab)

    # verdict line: argmax per relation vs the true converse
    from scripts.graphs_utils import calc_prob  # reference's
    prob = calc_prob(get_conv_converse(wrap).detach(), non_meta).numpy()
    print("\n=== final argmax table (relation -> argmax, p, correct?)")
    n_correct = 0
    for name in AUGMENTED_RELATIONS:
        i = vocab["pred_name_to_idx"][name]
        cols = {j: prob[i, j] for j in list(non_meta) if j != i}
        cols[prob.shape[1] - 1] = prob[i, -1]  # "No Edge"
        jbest = max(cols, key=cols.get)
        best_name = ("No Edge" if jbest == prob.shape[1] - 1
                     else vocab["pred_idx_to_name"][jbest])
        ok = best_name == TRUE_CONVERSE[name]
        n_correct += ok
        print(f"{name}: {best_name} p={cols[jbest]:.3f} "
              f"{'OK' if ok else 'WRONG'}")
    print(f"=== {n_correct}/6 relations correct")


if __name__ == "__main__":
    main()
