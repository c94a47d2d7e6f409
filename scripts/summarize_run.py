"""Summarize a training run's metrics.jsonl into a trajectory table.

Prints loss / rate rows at a fixed step stride plus the val metrics rows —
the source for docs/RESULTS.md trajectory tables (flagship runs).

Usage: python -m scripts.summarize_run OUT_DIR [--stride 1000]
"""
import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--stride", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    path = os.path.join(args.out_dir, "metrics.jsonl")
    train, val = [], []
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if r.get("tag") == "train/loss":
                train.append(r)
            elif str(r.get("tag", "")).startswith("val"):
                val.append(r)

    keys = ("total_loss", "bbox_pred", "D_img_real", "D_img_fake",
            "GAN_Img", "GAN_Feat", "VGG", "loss_conv")
    print("step | " + " | ".join(keys) + " | inst imgs/s")
    prev = None
    for r in train:
        s = r.get("step")
        if s is None:
            continue
        rate = ""
        if prev is not None and s > prev[0]:
            rate = f"{(s - prev[0]) * args.batch / (r['wall'] - prev[1]):.1f}"
        prev = (s, r["wall"])
        if s % args.stride == 0:
            vals = " | ".join(f"{r.get(k, float('nan')):.3f}" for k in keys)
            print(f"{s} | {vals} | {rate}")

    if val:
        vkeys = sorted({k for r in val for k in r
                        if k not in ("tag", "step", "wall")})
        print("\nval: step | " + " | ".join(vkeys))
        for r in val:
            print(f"{r.get('step')} | "
                  + " | ".join(f"{r.get(k, float('nan')):.4f}" if isinstance(
                      r.get(k), (int, float)) else str(r.get(k))
                      for k in vkeys))


if __name__ == "__main__":
    main()
