"""MFU / memory analysis of the fused GAN step from XLA's own cost model.

Prints the compiled step's FLOP count, HBM traffic (bytes accessed), temp
allocation, and — given a measured step time (MEASURED_MS env or the
imgs/s from bench.py) — the model-FLOP utilization against the chip's peak.
This is the quantitative backing for the bench number: if the step is at a
high fraction of the achievable matmul rate (scripts/microbench_vgg.py's raw
probe measured 144-160 TFLOP/s bf16 on this v5e), the remaining gap is
structural (small-channel convs, f32 norm passes), not schedule waste.

Env: FLOPS_BATCH (default 8), FLOPS_SIZE (256), MEASURED_MS (optional).
"""
import os

from canonicalsg2im_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax  # noqa: E402

from canonicalsg2im_tpu.config import Config  # noqa: E402
from canonicalsg2im_tpu.data import BucketedLoader, get_dataset  # noqa: E402
from canonicalsg2im_tpu.models.vgg import load_vgg_params  # noqa: E402
from canonicalsg2im_tpu.parallel import (create_mesh, replicate,  # noqa: E402
                                         shard_batch)
from canonicalsg2im_tpu.train.gan import (create_gan_states,  # noqa: E402
                                          gan_train_step,
                                          step_cfg_from_config)

size = int(os.environ.get("FLOPS_SIZE", 256))
batch = int(os.environ.get("FLOPS_BATCH", 8))
cfg = Config(dataset="packed_clevr_syn", image_size=(size, size),
             batch_size=batch, num_train_samples=64, min_objects=3,
             max_objects=10, learned_converse=True, learned_transitivity=True,
             remat_generator=False)
ds = get_dataset(cfg.dataset, "train", cfg)
cfg.vocab = ds.vocab
cfg.finalize()
loader = BucketedLoader(ds, batch, seed=0, prefetch=0,
                        bucket_objects=(16,), bucket_triplets=(512,))
mesh = create_mesh(cfg.mesh_shape)
vgg = replicate(load_vgg_params(cfg.weights_dir)[0], mesh)
b0 = shard_batch(next(iter(loader)), mesh)
states = replicate(create_gan_states(cfg, jax.random.PRNGKey(0)), mesh)
rng = jax.random.PRNGKey(1)

sc = step_cfg_from_config(cfg)
fn = jax.jit(lambda s, b, k, v: gan_train_step(s, b, k, v, sc=sc),
             donate_argnums=(0,))
compiled = fn.lower(states, b0, rng, vgg).compile()
ca = compiled.cost_analysis()
ma = compiled.memory_analysis()

flops = ca.get("flops", 0.0)
bytes_hbm = ca.get("bytes accessed", 0.0)
gib = 1 << 30
print(f"batch={batch} size={size}^2")
print(f"flops/step: {flops / 1e12:.2f} TFLOP "
      f"({flops / 1e12 / batch:.3f} TFLOP/img)")
print(f"bytes accessed/step: {bytes_hbm / gib:.2f} GiB")
print(f"temp alloc: {ma.temp_size_in_bytes / gib:.2f} GiB; "
      f"args {ma.argument_size_in_bytes / gib:.2f} GiB")

ms = os.environ.get("MEASURED_MS")
if ms:
    t = float(ms) / 1e3
    peak = 197e12      # v5e bf16 peak
    ach = 155e12       # raw matmul probe on this chip (73-81% of peak)
    hbm_bw = 819e9     # v5e HBM bandwidth
    print(f"@{ms} ms/step: {flops / t / 1e12:.1f} TFLOP/s "
          f"= {flops / t / peak * 100:.1f}% of bf16 peak "
          f"({flops / t / ach * 100:.1f}% of this chip's measured matmul "
          f"rate)")
    print(f"HBM traffic rate: {bytes_hbm / t / 1e9:.0f} GB/s "
          f"= {bytes_hbm / t / hbm_bw * 100:.1f}% of peak bandwidth")
    print(f"FLOP-bound floor: {flops / ach * 1e3:.1f} ms; "
          f"bandwidth floor: {bytes_hbm / hbm_bw * 1e3:.1f} ms")
