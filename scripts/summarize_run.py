"""Summarize a training run's metrics.jsonl into a trajectory table.

Prints loss / rate rows at a fixed step stride plus the val metrics rows —
the source for docs/RESULTS.md trajectory tables (flagship runs).

Resume-aware: a run that resumed from a checkpoint appends a new *pass* to
the same metrics.jsonl. Passes are split on wall resets, step overlaps, and
implausible implied rates (two different process clocks straddling a resume
can otherwise merge into one pass — ADVICE r3). When passes overlap in
steps, rows prefer the SURVIVING CHECKPOINT LINEAGE — the chain of passes
the final pass transitively resumed from — rather than the chronologically
latest pass, so abandoned detours don't contaminate the trajectory.

Usage: python -m scripts.summarize_run OUT_DIR [--stride 1000]
"""
import argparse
import json
import os


def split_passes(train, batch, max_rate):
    """Split train records into passes; returns a list of lists of
    (record, rate) with rates computed only within a pass."""
    passes = []
    cur, prev = [], None
    for r in train:
        s = r.get("step")
        if s is None:
            continue
        rate = None
        if prev is not None:
            dw = r["wall"] - prev[1]
            rate = (s - prev[0]) * batch / dw if dw > 0 else float("inf")
        if prev is not None and (r["wall"] < prev[1] or s <= prev[0]
                                 or (rate is not None and rate > max_rate)):
            passes.append(cur)
            cur, rate = [], None
        cur.append((r, rate))
        prev = (s, r["wall"])
    if cur:
        passes.append(cur)
    return passes


def surviving_lineage(passes):
    """Indices of the passes the FINAL pass transitively resumed from.

    A pass that resumes from checkpoint itr_K starts logging at a step just
    above K; its parent is the most recent earlier pass that reached K. The
    chain from the final pass back to step 0 is the surviving lineage;
    passes off the chain are abandoned detours."""
    if not passes:
        return set()
    # logging stride (print_every): the modal step delta across all records
    deltas = {}
    for recs in passes:
        steps = [r["step"] for r, _ in recs]
        for a, b in zip(steps, steps[1:]):
            if b > a:
                deltas[b - a] = deltas.get(b - a, 0) + 1
    gap = max(deltas, key=deltas.get) if deltas else 500
    lineage = {len(passes) - 1}
    cur = len(passes) - 1
    while True:
        first_step = passes[cur][0][0]["step"]
        parent = None
        for q in range(cur - 1, -1, -1):
            # the parent REACHED the checkpoint this pass resumed from
            # (its last logged step is within one logging stride of the
            # child's first) — a pass that merely started earlier but was
            # abandoned before that point is a dead detour, not an ancestor
            last_q = passes[q][-1][0]["step"]
            if (passes[q][0][0]["step"] < first_step
                    and last_q + gap >= first_step):
                parent = q
                break
        if parent is None:
            return lineage
        lineage.add(parent)
        cur = parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--stride", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max_rate", type=float, default=2000.0,
                    help="imgs/s above this implies a pass boundary "
                         "(clock-straddle guard)")
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

    passes = split_passes(train, args.batch, args.max_rate)
    lineage = surviving_lineage(passes)
    by_step = {}
    for p, recs in enumerate(passes):
        for r, rate in recs:
            s = r["step"]
            old = by_step.get(s)
            # lineage passes beat non-lineage; within the same class,
            # later passes shadow earlier
            if old is None or (p in lineage) >= (old[2] in lineage):
                by_step[s] = (r, rate, p)

    if len(passes) > 1:
        print(f"# {len(passes)} passes in metrics.jsonl (resumes); rows "
              f"prefer the surviving checkpoint lineage "
              f"{sorted(x + 1 for x in lineage)}, rates computed within "
              "a pass")
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
