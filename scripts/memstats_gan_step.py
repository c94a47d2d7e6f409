"""Print XLA memory analysis of the fused GAN step for loss-config variants.

Diagnoses why the full step costs ~360 ms more than no_vgg when the VGG
loss alone microbenches at 23 ms (scripts/microbench_vgg.py): if the
temp-buffer allocation is near the chip's 15.75 GB HBM, XLA's
memory-pressure fallbacks (auto-remat / spilling) serialize the schedule.
"""
import jax

from canonicalsg2im_tpu.utils.platform import apply_platform_override

apply_platform_override()

from canonicalsg2im_tpu.config import Config  # noqa: E402
from canonicalsg2im_tpu.data import BucketedLoader, get_dataset  # noqa: E402
from canonicalsg2im_tpu.models.vgg import load_vgg_params  # noqa: E402
from canonicalsg2im_tpu.parallel import (create_mesh, replicate,  # noqa: E402
                                         shard_batch)
from canonicalsg2im_tpu.train.gan import (create_gan_states,  # noqa: E402
                                          gan_train_step,
                                          step_cfg_from_config)

size, batch = 256, 16
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

base = step_cfg_from_config(cfg)
variants = {
    "full": base,
    "no_vgg": base._replace(no_vgg_loss=True),
}
for tag, sc in variants.items():
    fn = jax.jit(lambda s, b, k, v: gan_train_step(s, b, k, v, sc=sc),
                 donate_argnums=(0,))
    compiled = fn.lower(states, b0, rng, vgg).compile()
    ma = compiled.memory_analysis()
    gib = 1 << 30
    print(f"{tag}: temp={ma.temp_size_in_bytes / gib:.2f}G "
          f"args={ma.argument_size_in_bytes / gib:.2f}G "
          f"out={ma.output_size_in_bytes / gib:.2f}G "
          f"alias={ma.alias_size_in_bytes / gib:.2f}G "
          f"gen_code={ma.generated_code_size_in_bytes / (1 << 20):.1f}M",
          flush=True)
