"""Op-level profile of the fused GAN train step on the real chip.

Captures a jax.profiler trace of bench-identical steps (device-resident
batches, batch 16 @ 256^2 by default) and converts the xplane with xprof's
hlo_stats tool: per-HLO-op self time, category, occurrences, DMA-stall %,
and achieved FLOP/bandwidth rates. This is the measured per-op backing for
docs/PERF.md's roofline argument (the aggregate cost model in
scripts/flops_gan_step.py brackets the floor; this shows where the time
actually goes and whether any op class is schedule waste rather than
roofline-bound).

Env: PROF_BATCH (16), PROF_SIZE (256), PROF_STEPS (3), PROF_DIR
(/tmp/gan_prof), PROF_TOP (30). Reference scale anchor: the reference
trains 256^2 at batch 16 (README.md:86-96) and never measures throughput
(--timing is a dead flag, scripts/args.py:74).
"""
import json
import os

from canonicalsg2im_tpu.utils.platform import apply_platform_override

apply_platform_override()

import glob  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402

from canonicalsg2im_tpu.config import Config  # noqa: E402
from canonicalsg2im_tpu.data import BucketedLoader, get_dataset  # noqa: E402
from canonicalsg2im_tpu.models.vgg import load_vgg_params  # noqa: E402
from canonicalsg2im_tpu.parallel import (create_mesh, replicate,  # noqa: E402
                                         shard_batch)
from canonicalsg2im_tpu.train.gan import (create_gan_states,  # noqa: E402
                                          gan_train_step,
                                          step_cfg_from_config)


def capture(logdir: str, batch: int, size: int, steps: int) -> None:
    cfg = Config(dataset="packed_clevr_syn", image_size=(size, size),
                 batch_size=batch, num_train_samples=max(4 * batch, 64),
                 min_objects=3, max_objects=10, learned_converse=True,
                 learned_transitivity=True, remat_generator=False)
    ds = get_dataset(cfg.dataset, "train", cfg)
    cfg.vocab = ds.vocab
    cfg.finalize()
    loader = BucketedLoader(ds, batch, seed=0, prefetch=0,
                            bucket_objects=(16,), bucket_triplets=(512,))
    mesh = create_mesh(cfg.mesh_shape)
    states = replicate(create_gan_states(cfg, jax.random.PRNGKey(0)), mesh)
    sc = step_cfg_from_config(cfg)
    vgg = replicate(load_vgg_params(cfg.weights_dir)[0], mesh)
    import itertools
    dev_batches = [shard_batch(b, mesh)
                   for b in itertools.islice(iter(loader), 4)]
    rng = jax.random.PRNGKey(1)

    def step(s, k, i):
        return gan_train_step(s, dev_batches[i % len(dev_batches)], k,
                              vgg, sc=sc)

    for i in range(2):  # warmup/compile outside the trace
        rng, k = jax.random.split(rng)
        states, metrics, _ = step(states, k, i)
    jax.tree.map(lambda x: np.asarray(x), metrics)

    with jax.profiler.trace(logdir):
        for i in range(steps):
            rng, k = jax.random.split(rng)
            states, metrics, _ = step(states, k, i)
        jax.tree.map(lambda x: np.asarray(x), metrics)  # drain the queue


def report(logdir: str, top: int) -> None:
    from xprof.convert import raw_to_tool_data as conv
    planes = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                              recursive=True))
    if not planes:
        raise SystemExit(f"no *.xplane.pb trace found under {logdir} — "
                         "did the capture run (PROF_REPORT_ONLY unset)?")
    data, _ = conv.xspace_to_tool_data([planes[-1]], "hlo_stats", params={})
    table = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["id"] for c in table["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in table["rows"]]

    def col(r, name):
        return r[cols.index(name)]

    rows.sort(key=lambda r: -(col(r, "total_self_time") or 0))
    total_us = sum((col(r, "total_self_time") or 0) for r in rows)
    by_cat = {}
    for r in rows:
        cat = col(r, "category") or "?"
        by_cat[cat] = by_cat.get(cat, 0.0) + (col(r, "total_self_time") or 0)
    print(f"total device self time: {total_us/1e3:.1f} ms "
          f"(across the traced steps)")
    print("\n== by category ==")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us/total_us*100:6.2f}%  {us/1e3:9.2f} ms  {cat}")
    print(f"\n== top {top} ops by self time ==")
    print(f"{'%':>6} {'ms':>8} {'n':>4} {'GFLOP/s':>9} {'dma%':>5}  "
          f"category / op")
    for r in rows[:top]:
        us = col(r, "total_self_time") or 0
        print(f"{us/total_us*100:6.2f} {us/1e3:8.2f} "
              f"{int(col(r, 'occurrences') or 0):4d} "
              f"{col(r, 'model_flop_rate') or 0:9.0f} "
              f"{col(r, 'dma_stall_percent') or 0:5.1f}  "
              f"{col(r, 'category')} / {str(col(r, 'hlo_op_name'))[:70]}")


if __name__ == "__main__":
    batch = int(os.environ.get("PROF_BATCH", 16))
    size = int(os.environ.get("PROF_SIZE", 256))
    steps = int(os.environ.get("PROF_STEPS", 3))
    logdir = os.environ.get("PROF_DIR", "/tmp/gan_prof")
    top = int(os.environ.get("PROF_TOP", 30))
    if os.environ.get("PROF_REPORT_ONLY") != "1":
        capture(logdir, batch, size, steps)
    report(logdir, top)
