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

    # A run that resumed from a checkpoint appends a new pass to the same
    # metrics.jsonl; its wall clock restarts and its steps may overlap the
    # previous pass. Split on wall resets, compute instantaneous rates only
    # within a pass, and let later passes shadow earlier ones per step.
    attempt = 0
    prev = None
    by_step = {}
    for r in train:
        s = r.get("step")
        if s is None:
            continue
        if prev is not None and (r["wall"] < prev[1] or s <= prev[0]):
            attempt += 1
            prev = None
        rate = None
        if prev is not None:
            rate = (s - prev[0]) * args.batch / (r["wall"] - prev[1])
        prev = (s, r["wall"])
        by_step[s] = (r, rate, attempt)

    n_attempts = attempt + 1
    if n_attempts > 1:
        print(f"# {n_attempts} passes in metrics.jsonl (resumes); "
              "latest pass shown per step, rates computed within a pass")
    keys = ("total_loss", "bbox_pred", "D_img_real", "D_img_fake",
            "GAN_Img", "GAN_Feat", "VGG", "loss_conv")
    print("step | " + " | ".join(keys) + " | inst imgs/s | pass")
    for s in sorted(by_step):
        if s % args.stride != 0:
            continue
        r, rate, att = by_step[s]
        vals = " | ".join(f"{r.get(k, float('nan')):.3f}" for k in keys)
        rtxt = f"{rate:.1f}" if rate is not None else ""
        print(f"{s} | {vals} | {rtxt} | {att + 1}")

    if val:
        vkeys = sorted({k for r in val for k in r
                        if k not in ("tag", "step", "wall")})
        vby_step = {r.get("step"): r for r in val}  # later passes shadow
        val = [vby_step[s] for s in sorted(vby_step)]
        print("\nval: step | " + " | ".join(vkeys))
        for r in val:
            print(f"{r.get('step')} | "
                  + " | ".join(f"{r.get(k, float('nan')):.4f}" if isinstance(
                      r.get(k), (int, float)) else str(r.get(k))
                      for k in vkeys))


if __name__ == "__main__":
    main()
