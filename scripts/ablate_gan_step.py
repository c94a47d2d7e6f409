"""Ablation timing of the 256^2 GAN step (honest value-fetch sync).

Each variant is timed over REPEATS independent blocks of N steps and
reported as mean±std imgs/s — single-run numbers on this shared machine were
too noisy to rank close variants (round-1 lesson). Env knobs:
ABLATE_BATCH, ABLATE_STEPS (per block), ABLATE_REPEATS, ABLATE_REMAT.
"""
import os, time
import numpy as np
from canonicalsg2im_tpu.utils.platform import apply_platform_override
apply_platform_override()
import jax
from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.data import BucketedLoader, get_dataset
from canonicalsg2im_tpu.models.vgg import load_vgg_params
from canonicalsg2im_tpu.parallel import create_mesh, replicate, shard_batch
from canonicalsg2im_tpu.train.gan import (create_gan_states, gan_train_step,
    gan_eval_step, step_cfg_from_config)

size = int(os.environ.get("ABLATE_SIZE", 256))
batch = int(os.environ.get("ABLATE_BATCH", 16))
N = int(os.environ.get("ABLATE_STEPS", 5))
REPEATS = int(os.environ.get("ABLATE_REPEATS", 3))
cfg = Config(dataset="packed_clevr_syn", image_size=(size, size),
             batch_size=batch, num_train_samples=64, min_objects=3,
             max_objects=10, learned_converse=True, learned_transitivity=True,
             remat_generator=os.environ.get("ABLATE_REMAT", "0") == "1")
ds = get_dataset(cfg.dataset, "train", cfg); cfg.vocab = ds.vocab; cfg.finalize()
loader = BucketedLoader(ds, batch, seed=0, prefetch=0,
                        bucket_objects=(16,), bucket_triplets=(512,))
mesh = create_mesh(cfg.mesh_shape)
vgg = replicate(load_vgg_params(cfg.weights_dir)[0], mesh)
b0 = shard_batch(next(iter(loader)), mesh)
jax.device_get(b0.imgs[0, 0, 0, 0])  # force upload


def run(tag, sc, eval_mode=False):
    states = replicate(create_gan_states(cfg, jax.random.PRNGKey(0)), mesh)
    rng = jax.random.PRNGKey(1)

    def one(states, k):
        if eval_mode:
            img, *_, m = gan_eval_step(states, b0, k, sc=sc, use_gt=True)
            return states, {"total_loss": m["iou_sum"]}
        states, m, _ = gan_train_step(states, b0, k, vgg, sc=sc)
        return states, m

    t0 = time.perf_counter()
    states, m = one(states, rng); float(jax.device_get(m["total_loss"]))
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(N):
            rng, k = jax.random.split(rng)
            states, m = one(states, k)
        float(jax.device_get(m["total_loss"]))
        dt = (time.perf_counter() - t0) / N
        rates.append(batch / dt)
    rates = np.asarray(rates)
    print(f"{tag}: {1000*batch/rates.mean():.0f} ms/step -> "
          f"{rates.mean():.1f} ± {rates.std():.1f} imgs/s "
          f"(n={REPEATS}x{N} steps)", flush=True)
    return rates


base = step_cfg_from_config(cfg)
run("full", base)
run("remat_vgg", base._replace(remat_loss="vgg"))
run("remat_all", base._replace(remat_loss="all"))
run("no_vgg", base._replace(no_vgg_loss=True))
run("no_feat+no_vgg", base._replace(no_vgg_loss=True, no_ganFeat_loss=True))
run("img_disc_only(no obj/mask D losses)", base._replace(use_img_disc=True))
run("eval fwd only", base, eval_mode=True)
