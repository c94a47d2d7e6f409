"""Typed configuration for the framework.

Flag names mirror the reference's single argparse parser
(`/root/reference/scripts/args.py:13-212`) so users of the reference can port
command lines verbatim; ``to_cli_parser`` materializes an argparse parser from
the dataclass, and ``run_args.json`` round-trips through ``save``/``load`` the
same way the reference persists and re-hydrates its config
(scripts/train.py:291, scripts/layout_generation.py:87).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


def _tuple2(s) -> Tuple[int, int]:
    if isinstance(s, (tuple, list)):
        return tuple(int(x) for x in s)  # type: ignore[return-value]
    return tuple(int(i) for i in s.split(","))  # type: ignore[return-value]


@dataclass
class Config:
    # dataset selection
    dataset: str = "packed_clevr_syn"
    dataroot: str = "./datasets"
    batch_size: int = 4
    num_iterations: int = 1_000_000
    image_size: Tuple[int, int] = (256, 256)
    num_train_samples: Optional[int] = None
    num_val_samples: Optional[int] = 1024
    shuffle_val: bool = True
    # host-side sample-fetch workers per loader (BucketedLoader threads; the
    # reference's DataLoader default is 1 background *process*). Canonicalize
    # + decode runs per sample on the host, so keep >1 to feed fast chips.
    loader_num_workers: int = 4
    include_relationships: bool = True
    min_objects: Optional[int] = None
    max_objects: Optional[int] = None
    max_objects_val: Optional[int] = None
    min_object_size: float = 0.02
    # packed_clevr_syn: fraction of scenes with one small box nested strictly
    # inside a large one, giving the __inside__/__surrounding__ converse rows
    # REINFORCE signal (pure random placement almost never nests)
    syn_nested_fraction: float = 0.25
    # COCO val2017 -> val/test split: 'reference' uses the reference's
    # hard-coded val-id list (packed_coco.py:12-90); 'hash' is id-parity
    coco_val_split: str = "reference"
    # comma-separated category whitelists (reference coco.py:137-140;
    # dataset_params.py:72-73 pins them to None = all). "" = exclude the
    # whole class — used by the converse basin-boundary ablations.
    instance_whitelist: Optional[str] = None
    stuff_whitelist: Optional[str] = None
    debug: bool = False

    # VG-specific
    vg_image_dir: str = "datasets/vg/images"
    train_h5: str = "datasets/vg/train.h5"
    val_h5: str = "datasets/vg/val.h5"
    vocab_json: str = "datasets/vg/vocab.json"
    max_objects_per_image: int = 10
    vg_use_orphaned_objects: bool = True

    # optimization
    learning_rate: float = 1e-4
    mask_learning_rate: float = 1e-5
    img_learning_rate: float = 1e-4
    canonical_learning_rate: float = 1e-2  # trans/converse param groups (train.py:321-323)
    beta1: float = 0.5
    beta2: float = 0.999

    # SG->Layout model
    mask_size: int = 0
    embedding_dim: int = 32
    gconv_dim: int = 128
    g_mask_dim: int = 128 + 64
    mask_noise_dim: int = 64
    gconv_hidden_dim: int = 512
    gconv_pooling: str = "avg"
    gconv_num_layers: int = 5
    mlp_normalization: str = "none"
    layout_noise_dim: int = 32

    # AttSPADE generator
    ngf: int = 64
    num_upsampling_layers: str = "normal"  # normal | more | most
    norm_G: str = "spectralspadesyncbatch3x3"
    aspect_ratio: float = 1.0
    use_vae: bool = False
    z_dim: int = 256
    rep_size: int = 32
    appearance_normalization: str = "batch"
    a_activation: str = "leakyrelu-0.2"

    # discriminators
    num_D: int = 2
    n_layers_D: int = 4
    ndf: int = 64
    norm_D: str = "spectralinstance"
    gan_mode: str = "hinge"  # hinge | ls | original | w
    gan_loss_type: str = "gan"  # gan | wgan | lsgan (object D)
    d_normalization: str = "batch"
    d_padding: str = "valid"
    d_activation: str = "leakyrelu-0.2"
    d_obj_arch: str = "C4-64-2,C4-128-2,C4-256-2"
    crop_size: int = 32
    ndf_mask: int = 64
    num_D_mask: int = 1
    norm_D_mask: str = "instance"
    n_layers_D_mask: int = 2

    # loss weights
    no_ganFeat_loss: bool = False
    no_vgg_loss: bool = False
    lambda_feat: float = 10.0
    lambda_vgg: float = 10.0
    lambda_obj: float = 0.1
    lambda_kld: float = 0.05
    discriminator_img_loss_weight: float = 1.0
    discriminator_obj_loss_weight: float = 0.1
    discriminator_mask_loss_weight: float = 1.0
    bbox_pred_loss_weight: float = 10.0
    mask_pred_loss_weight: float = 0.0
    ac_loss_weight: float = 0.1

    # stage / feature toggles
    skip_generation: bool = False
    skip_graph_model: bool = False
    use_img_disc: bool = False
    use_transitivity: bool = False
    use_converse: bool = False
    use_all_relations: bool = False
    include_dummies: bool = False
    learned_transitivity: bool = False
    learned_symmetry: bool = False
    learned_converse: bool = False
    learned_init: str = "uniform"  # uniform | 0 | -4 | 4
    # BEYOND-REFERENCE intervention (default 0 = exact reference semantics):
    # ε-exploration in the dataset-side converse sampler against REINFORCE
    # basin lock-in (graphs/converse.py::sample_converse_triplets; the
    # multistability evidence is docs/RESULTS.md "converse bistability").
    converse_epsilon: float = 0.0
    # BEYOND-REFERENCE intervention (default 0 = exact reference semantics):
    # annealed Gaussian instance noise on the image-D inputs (real AND
    # fake), linear decay to 0 over d_noise_anneal steps. Keeps the hinge
    # margin populated on synthetic distributions where the D otherwise
    # separates real/fake perfectly by ~step 300 and saturates to zero loss
    # (r4/r5 flagships; train/gan.py::_make_d_noise).
    d_instance_noise: float = 0.0
    d_noise_anneal: int = 8000
    dense_scenes: bool = False
    isTrain: bool = True

    # output / checkpointing
    output_dir: str = "output/run"
    run_name: str = "debug"
    print_every: int = 10
    timing: bool = False
    checkpoint_every: int = 10_000
    full_test: int = 1_000_000
    checkpoint_name: Optional[str] = None
    checkpoint_gan_name: Optional[str] = None
    checkpoint_graph_name: Optional[str] = None
    restore_checkpoint: bool = False
    continue_on_error: bool = True
    img_deprocess: str = "decode_img"

    # TPU execution
    mesh_shape: Tuple[int, int] = (-1, 1)  # (data, model); -1 = all devices
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    seed: int = 0
    bucket_objects: Tuple[int, ...] = (8, 16, 32, 64, 128, 256, 512, 1024)
    # the top rungs serve WSGC's transitive completion on huge packed scenes
    # (quadratic in objects: ~300-500 objects -> ~6e5 triplets); shapes only
    # compile when a batch actually lands in them
    bucket_triplets: Tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536, 131072, 262144, 524288, 1048576)
    donate_state: bool = True
    # K fused train steps per device dispatch: the trainer stacks K batches
    # and runs them through ONE lax.scan program (train/gan.py
    # gan_train_multi_step / train/step.py layout_train_multi_step),
    # amortizing the host->device round-trip that dominates small steps
    # (e.g. the tunnel'd chip here: the 256^2 GAN CLI loop runs ~6 imgs/s
    # at K=1 vs ~57 imgs/s device throughput). Bit-equivalent to K
    # sequential steps; the learned-converse host feedback updates every K
    # steps instead of every step (measured benign for K<=10,
    # tests/test_converse_delay.py). print/checkpoint/full_test boundaries
    # are honored exactly — each block is clipped to the next boundary.
    steps_per_dispatch: int = 1
    # Monotonic bucket-floor ratchet in the CLI loaders: pad every batch at
    # least up to the largest bucket seen so far, so a run converges to ONE
    # compiled shape instead of splitting K-step dispatch blocks at every
    # bucket change (each odd-length scan block is a separate multi-minute
    # XLA compile). Shape-only; padding is masked by the batch contract.
    ratchet_buckets: bool = True
    # Dispatch blocks prefetched ahead by a host thread (assembly + device
    # upload of block t+1 overlap the device's execution of block t —
    # scripts/train.py::_prefetched_blocks). 0 = synchronous assembly
    # between dispatches (for A/B measurement). Converse-feedback staleness
    # grows by `lookahead` blocks; the reference's is one epoch.
    host_prefetch_blocks: int = 1
    # Cache the train split's images in HBM once (data/device_cache.py) and
    # serve each batch by an on-device gather keyed by image_ids. Removes the
    # recurring per-step image upload — on this tunnel'd host that upload
    # caps the 256^2 GAN CLI at ~8 imgs/s against an ~80 imgs/s device step.
    # Epoch semantics are unchanged: the loader still re-shuffles and
    # re-canonicalizes every draw with the live converse weights; only the
    # canonicalization-independent pixels are cached. Batches are
    # bit-identical to the uncached path (tests/test_device_cache.py).
    device_image_pool: bool = False
    # pool storage dtype; float32 is bit-exact, bfloat16 halves pool HBM
    # (decoded back to f32 in the gather, so the step executable is shared)
    device_pool_dtype: str = "float32"
    # >0 switches device_image_pool to the RotatingDevicePool: the dataset
    # streams through HBM in segments of this many images (two buffers
    # resident, next segment rendered+uploaded in the background) — for
    # datasets that exceed HBM, e.g. real COCO train. Must hold at least
    # one dispatch block (batch_size * steps_per_dispatch).
    pool_segment_size: int = 0
    # shuffled passes over each resident segment before rotating; cuts the
    # host's required render rate to device_rate / passes at the cost of
    # segment-blocked data order with intra-segment repeats
    pool_passes_per_segment: int = 1
    use_pallas_splat: bool = False
    # Pallas inference fusions (eval/test-mode forwards only; training keeps
    # the XLA paths, where the kernels' dense backward loses). BOTH default
    # off: measured in-context on one v5e (scripts/bench_infer.py, 256^2
    # batch 8, 3 repeats), the dense-XLA forward wins — the standalone splat
    # kernel is 1.55x faster than the dense splat in isolation
    # (scripts/bench_pallas_splat.py), but inside the generator the
    # custom-call fusion barrier costs more than the kernel saves
    # (base 356 imgs/s vs pallas 346, re-measured post seg-pyramid;
    # earlier 336 vs 318-330); the fused SPADE kernel's
    # (B, C/cc) grid serializes over batch items and loses ~2x at the
    # <=64px planes it covers. Both kernels are exact and remain available
    # for single-image serving and standalone splat calls.
    use_pallas_splat_eval: bool = False
    fused_spade_eval: bool = False
    remat_generator: bool = False
    # recompute each SPADE's gamma/beta branch in the backward instead of
    # saving its block-resolution activations (surgical traffic/memory trade
    # for the HBM-bandwidth-bound GAN step; see models/spade.py)
    remat_spade_mlp: bool = False
    # one batched D/VGG forward per (fake, real) pair in the GAN step —
    # exact for per-sample (instance/spectral) norms; see train/gan.py.
    # Measured neutral-to-slightly-negative at 256^2 batch 8 on one v5e
    # (53.9±2.9 vs 56.7±0.5 imgs/s off), so off by default; kept for
    # configs where the D is small enough to be launch-bound.
    batch_fake_real: bool = False
    # rematerialize loss-side network forwards in the fused GAN step:
    # "none" | "vgg" | "all" (see train/gan.py StepCfg.remat_loss). Measured
    # at 256^2 batch 16 on one v5e: none=35.9, vgg=33.6, all=26.4 imgs/s —
    # XLA's own memory-pressure handling beats forced remat on this size, so
    # the default is off; the options remain for larger-memory configs
    remat_loss: str = "none"
    weights_dir: str = "weights"  # converted VGG19 / InceptionV3 arrays
    # opt-in proxy-feature FID/IS at val time (evaluation/proxy.py) — the
    # in-image stand-in for the reference's pretrained FID/IS instrument
    # (evaluation/fid/fid_score.py:232). RELATIVE metric, not
    # literature-comparable; train the net first:
    #   python -m canonicalsg2im_tpu.evaluation.proxy train
    proxy_metrics: bool = False
    proxy_weights: str = "weights/proxy_features.npz"

    # populated at runtime, not via CLI
    vocab: Optional[dict] = None
    semantic_nc: Optional[int] = None

    # ------------------------------------------------------------------ utils
    def finalize(self) -> "Config":
        """Derive dependent fields once the vocab is known (args.py:215-238)."""
        if self.vocab is not None:
            self.semantic_nc = len(self.vocab["attributes"]) * self.embedding_dim
        return self

    def merge_default_ladders(self) -> "Config":
        """Widen the bucket ladders with the current class defaults, in place.

        The ladder stored in a checkpoint's run_args.json is a training-time
        padding detail; inference on graphs larger than the training scale
        (e.g. 300-500-object probe scenes whose transitive completion packs
        ~6e5 triplets) must not be capped by it. Custom training rungs are
        kept. Every inference CLI calls this after Config.load."""
        dflt = Config()
        self.bucket_objects = tuple(
            sorted(set(self.bucket_objects) | set(dflt.bucket_objects)))
        self.bucket_triplets = tuple(
            sorted(set(self.bucket_triplets) | set(dflt.bucket_triplets)))
        return self

    @property
    def num_predicates(self) -> int:
        return len(self.vocab["pred_idx_to_name"])

    @property
    def num_attributes(self) -> int:
        return len(self.vocab["attributes"])

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def save(self, path: str) -> None:
        d = {k: v for k, v in dataclasses.asdict(self).items()}
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(d, f, indent=1, default=str)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            d = json.load(f)
        return cls.from_dict(d)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        names = {f.name for f in dataclasses.fields(cls)}
        kw: dict[str, Any] = {}
        for k, v in d.items():
            if k not in names:
                continue
            if k in ("image_size", "mesh_shape") and v is not None:
                v = _tuple2(v)
            if k in ("bucket_objects", "bucket_triplets") and v is not None:
                v = tuple(int(x) for x in v)
            kw[k] = v
        return cls(**kw)


def to_cli_parser(defaults: Config | None = None) -> argparse.ArgumentParser:
    """Build an argparse parser whose flags mirror scripts/args.py."""
    cfg = defaults or Config()
    parser = argparse.ArgumentParser()
    for f in dataclasses.fields(Config):
        if f.name in ("vocab", "semantic_nc"):
            continue
        default = getattr(cfg, f.name)
        name = "--" + f.name
        if f.type in ("bool", bool) or isinstance(default, bool):
            parser.add_argument(name, type=lambda s: s not in ("0", "False", "false"),
                                default=default)
        elif f.name in ("image_size", "mesh_shape"):
            parser.add_argument(name, type=_tuple2, default=default)
        elif f.name in ("bucket_objects", "bucket_triplets"):
            parser.add_argument(name, type=lambda s: tuple(int(x) for x in s.split(",")),
                                default=default)
        elif isinstance(default, int) or "int" in str(f.type):
            parser.add_argument(name, type=int, default=default)
        elif isinstance(default, float) or "float" in str(f.type):
            parser.add_argument(name, type=float, default=default)
        else:
            parser.add_argument(name, type=str, default=default)
    return parser


def parse_cli(argv=None) -> Config:
    ns = to_cli_parser().parse_args(argv)
    return Config.from_dict(vars(ns))
