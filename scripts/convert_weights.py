"""Convert pretrained torch checkpoints to the npz layouts this framework
loads (VGG19 perceptual features, InceptionV3 for IS/FID).

The reference pulls these weights over the network via torchvision
(`spade/models/networks/architecture.py:96`, `evaluation/inception.py:16`,
`evaluation/fid/inception.py:13`); this container has no egress, so conversion
is a one-time offline step wherever the .pth files are available:

  python -m scripts.convert_weights --vgg19 vgg19-dcbb9e9d.pth \
      --out-dir weights/

Kernels are transposed from torch OIHW to JAX HWIO.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def convert_vgg19(pth_path: str, out_dir: str) -> str:
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    # torchvision vgg19 'features' conv indices in layer order
    conv_feature_indices = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25,
                            28, 30, 32, 34]
    out = {}
    for i, idx in enumerate(conv_feature_indices):
        w = sd.get(f"features.{idx}.weight")
        b = sd.get(f"features.{idx}.bias")
        if w is None:
            break
        out[f"conv{i}_kernel"] = w.numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
        out[f"conv{i}_bias"] = b.numpy()
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "vgg19_features.npz")
    np.savez(path, **out)
    return path


def convert_inception(pth_path: str, out_dir: str,
                      name: str = "inception_v3.npz") -> str:
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        arr = v.numpy()
        if arr.ndim == 4:  # conv OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 2:  # linear out,in -> in,out
            arr = arr.T
        out[k] = arr
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    np.savez(path, **out)
    return path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg19", help="path to torchvision vgg19 .pth")
    ap.add_argument("--inception", help="path to torchvision inception_v3 .pth")
    ap.add_argument("--fid-inception", help="path to the FID-specific "
                    "pt_inception .pth (evaluation/fid/inception.py:13)")
    ap.add_argument("--out-dir", default="weights")
    args = ap.parse_args()
    if args.vgg19:
        print("wrote", convert_vgg19(args.vgg19, args.out_dir))
    if args.inception:
        print("wrote", convert_inception(args.inception, args.out_dir))
    if args.fid_inception:
        print("wrote", convert_inception(args.fid_inception, args.out_dir,
                                         name="fid_inception.npz"))
