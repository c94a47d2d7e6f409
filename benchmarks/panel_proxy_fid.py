"""Proxy-FID over a run's val panels: the dither-detection A/B instrument.

Each val/<step>/<variant>.png is a horizontal strip of 256^2 tiles
(utils/vis.py). This tool splits the strips into tiles and computes the
proxy FID (evaluation/proxy.py — relative, not literature-comparable)
between a run's GENERATED tiles and its REAL (gt_img) tiles, per
checkpoint — the measurement the random-weight Inception fallback failed
(it ranked the r4 dithered run BETTER than clean output, VERDICT r4).

  python benchmarks/panel_proxy_fid.py out/wsgc_gan_256_r4 \
      out/wsgc_gan_256_r5 out/wsgc_gan_256_r5n --variant gt_box_gt_mask
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canonicalsg2im_tpu.utils.platform import apply_platform_override  # noqa: E402


def tiles(png_path):
    from PIL import Image

    im = np.asarray(Image.open(png_path).convert("RGB"))
    h, w, _ = im.shape
    n = w // h
    return [im[:, i * h:(i + 1) * h] for i in range(n)]


def hf_energy(arr):
    a = arr.astype(np.float64).mean(axis=-1)
    lap = (-4 * a[1:-1, 1:-1] + a[:-2, 1:-1] + a[2:, 1:-1]
           + a[1:-1, :-2] + a[1:-1, 2:])
    return float(np.abs(lap).mean())


def main():
    apply_platform_override()
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="run dirs with val/<step>/ panels")
    ap.add_argument("--variant", default="gt_box_gt_mask")
    ap.add_argument("--weights", default="weights/proxy_features.npz")
    ap.add_argument("--per_step", action="store_true",
                    help="also print one FID row per checkpoint")
    args = ap.parse_args()

    from canonicalsg2im_tpu.evaluation.fid import calculate_frechet_distance
    from canonicalsg2im_tpu.evaluation.proxy import ProxyActivations

    acc = ProxyActivations(args.weights)

    def stats_of(imgs):
        acc.clean()
        for i in range(0, len(imgs), 32):
            batch = np.stack(imgs[i:i + 32]).astype(np.float32) / 127.5 - 1.0
            acc(batch)
        return acc.statistics()

    for run in args.runs:
        val = os.path.join(run, "val")
        steps = sorted((d for d in os.listdir(val) if d.isdigit()), key=int)
        real, fake, rows = [], [], []
        for s in steps:
            rp = os.path.join(val, s, "gt_img.png")
            fp = os.path.join(val, s, f"{args.variant}.png")
            if not (os.path.exists(rp) and os.path.exists(fp)):
                continue
            r, f = tiles(rp), tiles(fp)
            real += r
            fake += f
            rows.append((s, f))
        mu_r, sig_r = stats_of(real)
        mu_f, sig_f = stats_of(fake)
        fid = calculate_frechet_distance(mu_r, sig_r, mu_f, sig_f)
        hf_r = np.mean([hf_energy(t) for t in real])
        hf_f = np.mean([hf_energy(t) for t in fake])
        print(f"{run} [{args.variant}] steps {steps[0]}-{steps[-1]}: "
              f"pooled proxy FID {fid:.2f} over {len(fake)} tiles "
              f"(hf gen {hf_f:.1f} vs real {hf_r:.1f})")
        if args.per_step:
            for s, f in rows:
                mu, sg = stats_of(f)
                print(f"  step {s}: proxy FID "
                      f"{calculate_frechet_distance(mu_r, sig_r, mu, sg):.2f}"
                      f"  hf {np.mean([hf_energy(t) for t in f]):.1f}")


if __name__ == "__main__":
    main()
