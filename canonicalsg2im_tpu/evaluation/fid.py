"""Fréchet Inception Distance (reference `evaluation/fid/fid_score.py`).

Pool-3 (2048-d) activations come from the JAX InceptionV3
(evaluation/inception.py); the Fréchet distance with sqrtm stabilization
follows fid_score.py:100-160. The reference's FID uses the TF-ported
"pt_inception" weights on a modified architecture (FIDInceptionA/C/E_1/E_2,
evaluation/fid/inception.py:168-310); ``weights/fid_inception.npz`` loads
those weights into the architecture-exact ``InceptionV3(variant='fid')``
graph (count_include_pad=False pools, Mixed_7c max-pool branch, 1008-way
head). Without FID weights the torchvision variant is the fallback.

Also usable as a CLI over two image directories:
  python -m canonicalsg2im_tpu.evaluation.fid path/to/real path/to/fake
"""
from __future__ import annotations

import os
from typing import Iterable

import jax
import numpy as np

from canonicalsg2im_tpu.evaluation.inception import (
    InceptionV3,
    load_inception_variables,
    resize_bilinear,
)


class FidActivations:
    """Accumulates pool-3 activations for batches of [-1, 1] NHWC images."""

    def __init__(self, weights_dir: str = "weights"):
        variables, self.pretrained = load_inception_variables(
            weights_dir, name="fid_inception.npz", variant="fid")
        variant = "fid"
        if not self.pretrained:
            # no FID weights converted: fall back to the torchvision weights
            # (and their matching architecture) rather than random FID params
            variables, self.pretrained = load_inception_variables(weights_dir)
            variant = "torchvision"
        self.variables = variables
        # With random fallback weights, per-batch BN statistics keep the
        # features informative (see InceptionV3.train_bn).
        model = InceptionV3(variant=variant, train_bn=not self.pretrained)

        def _acts(variables, imgs):
            x = resize_bilinear(imgs, 299)
            if model.train_bn:
                (_, pool), _ = model.apply(variables, x,
                                           mutable=["batch_stats"])
            else:
                _, pool = model.apply(variables, x)
            return pool

        self._acts = jax.jit(_acts)
        self.acts: list = []

    def __call__(self, imgs):
        self.acts.append(np.asarray(self._acts(self.variables, imgs)))

    def statistics(self):
        a = np.concatenate(self.acts, axis=0)
        mu = a.mean(axis=0)
        sigma = np.cov(a, rowvar=False)
        return mu, sigma


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6):
    """fid_score.py:126-160, including the offset stabilization."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("Imaginary component in sqrtm: "
                             f"{np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return (diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
            - 2 * np.trace(covmean))


def _load_dir_batches(path: str, batch_size: int) -> Iterable[np.ndarray]:
    from PIL import Image

    files = sorted(
        p.path for p in os.scandir(path)
        if p.name.lower().endswith((".png", ".jpg", ".jpeg")))
    # every image counts toward the statistics — the last batch may be
    # short, like the reference, which clamps batch_size to N
    # (fid_score.py:246-250)
    for i in range(0, len(files), batch_size):
        imgs = []
        for f in files[i:i + batch_size]:
            im = Image.open(f).convert("RGB")
            if imgs and im.size != (imgs[0].shape[1], imgs[0].shape[0]):
                # heterogeneous directory (e.g. raw COCO/VG val images):
                # resize to the batch's first size so the stack is legal —
                # the model bilinearly resizes to 299 internally regardless
                im = im.resize((imgs[0].shape[1], imgs[0].shape[0]),
                               Image.BILINEAR)
            arr = np.asarray(im, dtype=np.float32)
            imgs.append(arr / 127.5 - 1.0)
        yield np.stack(imgs)


def _path_statistics(path: str, batch_size: int, weights_dir: str,
                     acc: FidActivations | None = None):
    """Image directory -> (mu, sigma); a .npz path loads precomputed stats
    (the reference CLI accepts either, fid_score.py:212-229). Pass ``acc``
    to reuse one loaded/jitted Inception across calls (its accumulated
    activations are reset)."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            return f["mu"], f["sigma"]
    if acc is None:
        acc = FidActivations(weights_dir)
    acc.acts = []
    for batch in _load_dir_batches(path, batch_size):
        acc(batch)
    return acc.statistics()


def save_fid_statistics(path: str, out_npz: str, batch_size: int = 50,
                        weights_dir: str = "weights") -> None:
    mu, sigma = _path_statistics(path, batch_size, weights_dir)
    np.savez(out_npz, mu=mu, sigma=sigma)


def calculate_fid_given_paths(paths, batch_size: int = 50,
                              weights_dir: str = "weights") -> float:
    """fid_score.py:232-250 — FID between two image dirs / stats files."""
    acc = (FidActivations(weights_dir)
           if not all(p.endswith(".npz") for p in paths) else None)
    (m1, s1), (m2, s2) = (_path_statistics(p, batch_size, weights_dir, acc)
                          for p in paths)
    return float(calculate_frechet_distance(m1, s1, m2, s2))


if __name__ == "__main__":
    import argparse

    from canonicalsg2im_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs=2)
    ap.add_argument("--batch-size", type=int, default=50)
    ap.add_argument("--weights-dir", default="weights")
    args = ap.parse_args()
    print("FID:", calculate_fid_given_paths(args.path, args.batch_size,
                                            args.weights_dir))
