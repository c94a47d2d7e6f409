"""Full adversarial training: the TPU counterpart of
`sg2im/pix2pix_model.py` + the optimizer choreography of `scripts/train.py`.

One jitted step fuses what the reference runs as five backward passes
(generator, REINFORCE-converse, image-D, object-D, mask-D,
scripts/train.py:353-393 + :468-485):

- generator pass: bbox/mask prediction losses, hinge G loss from the image D,
  feature matching, VGG perceptual, optional object-D/AC/mask-D terms, and the
  REINFORCE converse surrogate — one value_and_grad over the generator params
  (the disjoint base/trans/converse optimizer groups are one
  optax.multi_transform, see train/state.py);
- discriminator pass: image/object/mask D losses on stop-gradient fakes, one
  value_and_grad over the dict of all D params (losses are param-disjoint, so
  this equals the reference's three separate backwards).

The reference's ``D_img_wrong`` term is computed but never backpropagated
(pix2pix_model.py:166-172 adds it after total_img_loss is formed); we
reproduce that: it appears in the metrics, not in the optimized total.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.graphs.converse import converse_log_likelihood
from canonicalsg2im_tpu.losses.bbox import bbox_losses, mask_pred_loss
from canonicalsg2im_tpu.losses.gan import GanLoss
from canonicalsg2im_tpu.models.discriminators import (
    AcCropDiscriminator,
    MultiscaleDiscriminator,
    MultiscaleMaskDiscriminator,
)
from canonicalsg2im_tpu.models.meta import MetaGeneratorModel
from canonicalsg2im_tpu.models.sg2layout import symmetrize_converse
from canonicalsg2im_tpu.models.vgg import VGGLoss
from canonicalsg2im_tpu.train.state import layout_optimizer


class TrainStateWithStats(train_state.TrainState):
    batch_stats: Any = None


class GanStates(flax.struct.PyTreeNode):
    g: TrainStateWithStats
    d_img: TrainStateWithStats
    d_obj: Optional[TrainStateWithStats] = None
    d_mask: Optional[TrainStateWithStats] = None


class StepCfg(NamedTuple):
    """Hashable static configuration for the jitted steps."""

    non_meta_rels: tuple
    gan_mode: str = "hinge"
    bbox_weight: float = 10.0
    mask_weight: float = 0.0
    lambda_feat: float = 10.0
    lambda_vgg: float = 10.0
    w_d_img: float = 1.0
    w_d_obj: float = 0.1
    w_ac: float = 0.1
    num_D: int = 2
    no_ganFeat_loss: bool = False
    no_vgg_loss: bool = False
    use_img_disc: bool = False
    skip_graph_model: bool = False
    skip_generation: bool = False
    learned_converse: bool = False
    mask_size: int = 0
    use_gt_boxes: bool = True
    use_gt_masks: bool = True
    compute_dtype: str = "float32"
    norm_D: str = "spectralinstance"
    # one batched D/VGG forward for the (fake, real) pair — exact for
    # per-sample norms; switchable for A/B perf measurement. Default matches
    # Config.batch_fake_real: off (measured neutral-to-negative at the bench
    # shapes, see docs/PERF.md).
    batch_fake_real: bool = False
    # BEYOND-REFERENCE (off by default, reference semantics when 0):
    # annealed Gaussian instance noise on the image-D's inputs (both real
    # and fake — Sonderby et al. 2017's GAN stabilizer). On synthetic
    # distributions the hinge D separates real from fake perfectly within
    # ~300 steps and saturates to zero loss (r4/r5 flagships, vs the
    # non-degenerate photo regime of the reference's
    # spade/models/networks/loss.py:36-44); overlapping the supports keeps
    # the margin populated so the adversarial signal stays live. Noise
    # sigma anneals linearly to 0 over d_noise_anneal steps.
    d_instance_noise: float = 0.0
    d_noise_anneal: int = 8000
    # Rematerialize loss-side network forwards instead of saving their
    # activations for backward: "none" | "vgg" | "all". The fused step runs
    # at the HBM ceiling (temp 13.7G of 15.75G at 256^2 batch 16; the VGG
    # loss alone microbenches at 23 ms but adds ~180 ms to the step), yet
    # forced remat measures SLOWER than XLA's own memory-pressure handling
    # (none=35.9, vgg=33.6, all=26.4 imgs/s/chip — "all" also breaks the CSE
    # between the G-loss and D-loss discriminator passes). Default off; the
    # options remain for configs with more memory headroom to trade.
    remat_loss: str = "none"


def step_cfg_from_config(cfg: Config) -> StepCfg:
    from canonicalsg2im_tpu.data.vocab import non_meta_relation_ids

    return StepCfg(
        non_meta_rels=tuple(non_meta_relation_ids(cfg.vocab)),
        gan_mode=cfg.gan_mode,
        bbox_weight=cfg.bbox_pred_loss_weight,
        mask_weight=cfg.mask_pred_loss_weight,
        lambda_feat=cfg.lambda_feat,
        lambda_vgg=cfg.lambda_vgg,
        w_d_img=cfg.discriminator_img_loss_weight,
        w_d_obj=cfg.discriminator_obj_loss_weight,
        w_ac=cfg.ac_loss_weight,
        num_D=cfg.num_D,
        no_ganFeat_loss=cfg.no_ganFeat_loss,
        no_vgg_loss=cfg.no_vgg_loss,
        use_img_disc=cfg.use_img_disc,
        skip_graph_model=cfg.skip_graph_model,
        skip_generation=cfg.skip_generation,
        learned_converse=cfg.learned_converse,
        mask_size=cfg.mask_size,
        remat_loss=cfg.remat_loss,
        use_gt_boxes=not cfg.skip_graph_model or cfg.isTrain,
        use_gt_masks=cfg.mask_size > 0,
        compute_dtype=cfg.compute_dtype,
        norm_D=cfg.norm_D,
        batch_fake_real=cfg.batch_fake_real,
        d_instance_noise=cfg.d_instance_noise,
        d_noise_anneal=cfg.d_noise_anneal,
    )


# --------------------------------------------------------------------- setup

def create_gan_states(cfg: Config, rng) -> GanStates:
    """Build generator + discriminators and their four Adam optimizers
    (meta_models.py:54-90: betas (0.5, 0.999) for every D; generator groups
    per train/state.py)."""
    g_model = MetaGeneratorModel.from_config(cfg)
    O, T, A = 8, 16, cfg.num_attributes
    B = 2
    H = cfg.image_size[0]
    objs = jnp.zeros((B, O, A), jnp.int32)
    triplets = jnp.zeros((B, T, 3), jnp.int32)
    ttype = jnp.zeros((B, T), jnp.int32)
    boxes = jnp.zeros((B, O, 4), jnp.float32)
    masks = (jnp.zeros((B, O, cfg.mask_size, cfg.mask_size), jnp.float32)
             if cfg.mask_size > 0 else None)
    imgs = jnp.zeros((B, H, H, 3), jnp.float32)

    r_p, r_n, r_d = jax.random.split(rng, 3)
    g_vars = g_model.init({"params": r_p, "noise": r_n}, objs, triplets, ttype,
                          boxes_gt=boxes, masks_gt=masks, train=False)
    g_state = TrainStateWithStats.create(
        apply_fn=g_model.apply, params=g_vars["params"],
        batch_stats=g_vars.get("batch_stats", {}),
        tx=layout_optimizer(cfg))

    def d_state(model, init_args, lr):
        variables = model.init(r_d, *init_args, train=False)
        return TrainStateWithStats.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=optax.adam(lr, b1=cfg.beta1, b2=cfg.beta2))

    dtype = jnp.dtype(cfg.compute_dtype)
    d_img_model = MultiscaleDiscriminator(
        vocab=cfg.vocab, embedding_dim=cfg.embedding_dim,
        image_size=tuple(cfg.image_size), num_D=cfg.num_D,
        n_layers_D=cfg.n_layers_D, ndf=cfg.ndf, norm_D=cfg.norm_D,
        dtype=dtype)
    d_img = d_state(d_img_model, (imgs, objs, boxes, masks),
                    cfg.img_learning_rate)

    d_obj = d_mask = None
    if not cfg.use_img_disc:
        d_obj_model = AcCropDiscriminator(
            vocab=cfg.vocab, arch=cfg.d_obj_arch,
            normalization=cfg.d_normalization, activation=cfg.d_activation,
            padding=cfg.d_padding, object_size=cfg.crop_size)
        d_obj = d_state(d_obj_model, (imgs, objs, boxes), cfg.learning_rate)
        if cfg.mask_size > 0:
            d_mask_model = MultiscaleMaskDiscriminator(
                vocab=cfg.vocab, num_D=cfg.num_D, n_layers_D=cfg.n_layers_D,
                ndf=cfg.ndf, norm_D=cfg.norm_D)
            d_mask = d_state(d_mask_model, (objs, masks),
                             cfg.mask_learning_rate)
    return GanStates(g=g_state, d_img=d_img, d_obj=d_obj, d_mask=d_mask)


# ----------------------------------------------------------------- internals

def _apply(state, params, args, kwargs, train: bool, rngs=None):
    variables = {"params": params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    mutable = ["batch_stats"] if (train and state.batch_stats) else False
    out = state.apply_fn(variables, *args, train=train, mutable=mutable,
                         rngs=rngs, **kwargs)
    if mutable:
        y, new_vars = out
        return y, new_vars.get("batch_stats", state.batch_stats)
    return out, state.batch_stats


def _masked_gan_g(scores, mask, mode: str):
    """Generator-side GAN loss over per-slot (B, O) scores with validity
    masking — the fixed-shape replacement for the reference's
    remove_dummy_objects (sg2im/utils.py:56-63): dummy/padding crop scores
    must not enter the mean for ANY gan mode."""
    m = mask.astype(scores.dtype)
    if mode in ("hinge", "w"):
        elem = -scores
    elif mode == "ls":
        elem = (scores - 1.0) ** 2
    else:  # 'original' — numerically-stable BCE with target 1
        elem = (jnp.clip(scores, 0.0, None) - scores
                + jnp.log1p(jnp.exp(-jnp.abs(scores))))
    return (elem * m).sum() / jnp.maximum(m.sum(), 1.0)


def _masked_multiscale_gan_loss(feature_lists, slot_mask, target_is_real: bool,
                                for_discriminator: bool, mode: str):
    """GanLoss over multiscale (B*O)-leading feature lists with per-slot
    validity weighting (fixed-shape replacement for the reference's dynamic
    dummy dropping in the mask discriminator)."""
    m = slot_mask
    total = 0.0
    for feats in feature_lists:
        x = feats[-1]
        if mode == "hinge":
            if for_discriminator:
                elem = (-jnp.minimum(x - 1.0, 0.0) if target_is_real
                        else -jnp.minimum(-x - 1.0, 0.0))
            else:
                elem = -x
        elif mode == "ls":
            elem = (x - float(target_is_real)) ** 2
        elif mode == "original":
            t = float(target_is_real)
            elem = (jnp.clip(x, 0.0, None) - x * t
                    + jnp.log1p(jnp.exp(-jnp.abs(x))))
        else:  # wgan
            elem = -x if target_is_real else x
        per_slot = elem.reshape(elem.shape[0], -1).mean(axis=1)
        total = total + (per_slot * m).sum() / jnp.maximum(m.sum(), 1.0)
    return total / len(feature_lists)


def _masked_bce(scores, target: float, mask):
    m = mask.astype(scores.dtype)
    s = scores
    loss = jnp.clip(s, 0.0, None) - s * target + jnp.log1p(jnp.exp(-jnp.abs(s)))
    return (loss * m).sum() / jnp.maximum(m.sum(), 1.0)


def seg_for_d_img(states: GanStates, d_img_params, batch):
    """Build the image-D's layout seg ONCE per step.

    The seg depends only on (objs, boxes, masks) and the D's embedding params
    — not on the scored image — so the step's four image-D forwards
    (fake/real x G-loss/D-loss) share one seg instead of rebuilding the
    (B, H, W, semantic_nc) coverage tensors in every forward (the HBM
    live-set reduction of docs/ROUND1_NOTES.md)."""
    variables = {"params": d_img_params}
    if states.d_img.batch_stats:
        variables["batch_stats"] = states.d_img.batch_stats
    return states.d_img.apply_fn(variables, batch.objs, batch.boxes,
                                 batch.masks, method="seg_layout")


def generator_losses(sc: StepCfg, states: GanStates, g_params, batch, rng,
                     vgg_params, d_params=None, seg_img=None):
    """compute_generator_loss (pix2pix_model.py:65-143).

    ``d_params`` supplies the discriminator parameters to score against
    (stop-gradded here); defaults to the live state params. Passing the same
    tensors that the discriminator pass differentiates lets XLA CSE the
    duplicated D forwards when both passes live in one jit. ``seg_img`` is the
    precomputed image-D layout seg (see :func:`seg_for_d_img`); it is
    stop-gradded here like the rest of the D parameters.
    """
    if d_params is None:
        d_params = {"img": states.d_img.params if states.d_img else None,
                    "obj": states.d_obj.params if states.d_obj else None,
                    "mask": states.d_mask.params if states.d_mask else None}
    criterion = GanLoss(sc.gan_mode)
    boxes_gt = batch.boxes if sc.use_gt_boxes else None
    masks_gt = batch.masks if (sc.use_gt_masks and batch.masks is not None) else None

    (img_pred, boxes_pred, masks_pred), new_gstats = _apply(
        states.g, g_params,
        (batch.objs, batch.triplets, batch.triplet_type),
        {"boxes_gt": boxes_gt, "masks_gt": masks_gt},
        train=True, rngs={"noise": rng})

    losses = {}
    total = 0.0
    per_sample = None
    if not sc.skip_graph_model:
        per_sample, bbox_mean = bbox_losses(boxes_pred, batch.boxes,
                                            batch.objs, weight=sc.bbox_weight)
        losses["bbox_pred"] = bbox_mean
        total = total + bbox_mean
        if batch.masks is not None and masks_pred is not None and sc.mask_weight:
            m = mask_pred_loss(masks_pred, batch.masks, batch.objs,
                               sc.mask_weight)
            losses["masks_pred"] = m
            total = total + m

    # Gradients flow into these scoring networks only through the generator
    # outputs (D params are stop-gradded), so under sc.remat_loss each
    # forward is wrapped in jax.checkpoint with the generator output as the
    # explicit argument: backward recomputes the (cheap) forward instead of
    # keeping its activations live across the whole fused step.
    ckpt = jax.checkpoint if sc.remat_loss == "all" else (lambda f: f)
    ckpt_vgg = (jax.checkpoint if sc.remat_loss in ("vgg", "all")
                else (lambda f: f))
    dnoise = _make_d_noise(sc, states, rng)

    if not sc.skip_generation:
        d_boxes = batch.boxes
        B = batch.imgs.shape[0]
        seg_frozen = (jax.lax.stop_gradient(seg_img)
                      if seg_img is not None else None)
        # instance/spectral norms are per-sample, so fake and real ride ONE
        # batched D forward (halves the D kernel count per step); batch-norm
        # discriminators keep the reference's separate forwards to preserve
        # their per-forward statistics
        batch_fr = (sc.batch_fake_real and seg_frozen is not None
                    and "batch" not in sc.norm_D)

        def _score_img(img):
            n_rep = img.shape[0] // B
            seg = (jnp.concatenate([seg_frozen] * n_rep, axis=0)
                   if n_rep > 1 else seg_frozen)
            out, _ = _apply(states.d_img,
                            jax.lax.stop_gradient(d_params["img"]),
                            (img, batch.objs, d_boxes),
                            {"layout_masks": batch.masks, "seg": seg},
                            train=True)
            return out

        if batch_fr and not sc.no_ganFeat_loss:
            both = ckpt(_score_img)(dnoise(
                jnp.concatenate([img_pred,
                                 jax.lax.stop_gradient(batch.imgs)], axis=0),
                "both"))
            pred_fake = [[t[:B] for t in feats] for feats in both]
            pred_real = [[t[B:] for t in feats] for feats in both]
        else:
            pred_fake = ckpt(_score_img)(dnoise(img_pred, "fake"))
            # no gradient flows through the real-image features (they are
            # stop-gradded below), so no checkpoint is needed here
            pred_real = (None if sc.no_ganFeat_loss
                         else _score_img(dnoise(batch.imgs, "real")))
        gan_img = criterion(pred_fake, True, for_discriminator=False)
        losses["GAN_Img"] = gan_img * sc.w_d_img
        total = total + losses["GAN_Img"]

        if not sc.no_ganFeat_loss:
            feat = 0.0
            for i in range(sc.num_D):
                for j in range(len(pred_fake[i]) - 1):
                    feat = feat + jnp.abs(
                        pred_fake[i][j] - jax.lax.stop_gradient(pred_real[i][j])
                    ).mean() * sc.lambda_feat / sc.num_D
            losses["GAN_Feat"] = feat
            total = total + feat

        if not sc.no_vgg_loss:
            vgg_loss = VGGLoss(vgg_params, dtype=jnp.dtype(sc.compute_dtype))
            vgg = ckpt_vgg(lambda img: vgg_loss(img, batch.imgs))(
                img_pred) * sc.lambda_vgg
            losses["VGG"] = vgg
            total = total + vgg

        if not sc.use_img_disc and states.d_obj is not None:
            def _score_obj(img):
                (sf, real, ac, _), _ = _apply(
                    states.d_obj, jax.lax.stop_gradient(d_params["obj"]),
                    (img, batch.objs, d_boxes), {}, train=True)
                return sf, real, ac

            scores_fake, real, ac_loss = ckpt(_score_obj)(img_pred)
            g_obj = _masked_gan_g(scores_fake, real, sc.gan_mode)
            losses["GAN_Obj"] = g_obj * sc.w_d_obj
            losses["GAN_Ac"] = ac_loss * sc.w_ac
            total = total + losses["GAN_Obj"] + losses["GAN_Ac"]

            if states.d_mask is not None and sc.mask_size > 0 and masks_pred is not None:
                def _score_mask(mp):
                    (sfm, sr), _ = _apply(
                        states.d_mask, jax.lax.stop_gradient(d_params["mask"]),
                        (batch.objs, mp), {}, train=True)
                    return sfm, sr

                scores_fake_m, slot_real = ckpt(_score_mask)(masks_pred)
                gan_mask = _masked_multiscale_gan_loss(
                    scores_fake_m, slot_real, True, False, sc.gan_mode)
                losses["GAN_Mask"] = gan_mask * sc.w_d_img
                total = total + losses["GAN_Mask"]
                if not sc.no_ganFeat_loss and batch.masks is not None:
                    (scores_real_m, _), _ = _apply(
                        states.d_mask,
                        jax.lax.stop_gradient(d_params["mask"]),
                        (batch.objs, batch.masks), {}, train=True)
                    w = slot_real[:, None, None, None]
                    denom = jnp.maximum(slot_real.sum(), 1.0) / slot_real.shape[0]
                    feat_m = 0.0
                    for i in range(len(scores_fake_m)):
                        for j in range(len(scores_fake_m[i]) - 1):
                            diff = jnp.abs(
                                scores_fake_m[i][j]
                                - jax.lax.stop_gradient(scores_real_m[i][j]))
                            feat_m = feat_m + (diff * w).mean() / denom \
                                * sc.lambda_feat / len(scores_fake_m)
                    losses["GAN_Mask_Feat"] = feat_m
                    total = total + feat_m

    if sc.learned_converse and per_sample is not None:
        r = jax.lax.stop_gradient(per_sample)
        B = r.shape[0]
        if B > 1:
            std = jnp.sqrt(jnp.sum((r - r.mean()) ** 2) / (B - 1))
            r = (r - r.mean()) / (std + jnp.finfo(jnp.float32).eps)
        conv_w = symmetrize_converse(
            g_params["sg_to_layout"]["converse_candidates_weights"])
        log_p = converse_log_likelihood(conv_w, sc.non_meta_rels,
                                        batch.conv_counts)
        loss_conv = jnp.mean(r * log_p)
        losses["loss_conv"] = loss_conv
        total = total + loss_conv

    losses["total_loss"] = total
    outputs = (img_pred, boxes_pred, masks_pred)
    return total, (losses, outputs, new_gstats)


def _make_d_noise(sc: StepCfg, states: GanStates, rng):
    """Annealed instance-noise injector for image-D inputs (see
    StepCfg.d_instance_noise). Returns identity when the knob is off.

    Keys are derived from (rng, tag) so the generator-loss and
    discriminator-loss sides noise the SAME sample sets identically —
    preserving both the one-noisy-view semantics and the XLA CSE between
    the duplicated D forwards of the fused step."""
    if sc.d_instance_noise <= 0:
        return lambda img, tag: img
    frac = jnp.clip(
        1.0 - jnp.asarray(states.g.step, jnp.float32) / sc.d_noise_anneal,
        0.0, 1.0)
    sigma = sc.d_instance_noise * frac
    tags = {"both": 1, "fake": 2, "real": 3}

    def dnoise(img, tag):
        # Multi-scale: iid pixel noise is low-passed away by the D's
        # strided scales (effective sigma/sqrt(k) over k-pixel receptive
        # fields — measured: sigma=1.0 pixel noise leaves the hinge D
        # saturated at ~1e-4, out/wsgc_gan_256_r5n_sigma*.log), so half the
        # power rides spatially-correlated components drawn at 1/8 and
        # 1/32 resolution and bilinearly upsampled: those survive every
        # receptive-field average and actually blur the low-frequency
        # color/layout statistics the D separates on.
        key = jax.random.fold_in(rng, tags[tag])
        k1, k2, k3 = jax.random.split(key, 3)
        B, H, W, C = img.shape
        n = 0.5 * jax.random.normal(k1, img.shape, jnp.float32)
        for k, r in ((k2, 8), (k3, 32)):
            low = jax.random.normal(
                k, (B, max(1, H // r), max(1, W // r), C), jnp.float32)
            n = n + 0.5 * jax.image.resize(low, img.shape, "bilinear")
        return img + (sigma * n).astype(img.dtype)

    return dnoise


def discriminator_losses(sc: StepCfg, states: GanStates, d_params, batch,
                         outputs, seg_img=None, noise_rng=None):
    """compute_discriminator_loss (pix2pix_model.py:145-202).

    ``seg_img`` is the live-parameter image-D seg (see :func:`seg_for_d_img`);
    gradient flows through it into the D's embedding params exactly as if each
    forward had rebuilt it."""
    criterion = GanLoss(sc.gan_mode)
    img_pred, boxes_pred, masks_pred = [
        jax.lax.stop_gradient(o) if o is not None else None for o in outputs]
    d_boxes = batch.boxes

    # Both D calls seed their spectral power iteration from the SAME (step-
    # start) stats rather than threading fake->real: flax recomputes the
    # iteration every forward anyway, and identical seeding makes these
    # forwards CSE-able against the generator-loss D calls in the fused step.
    # Gradients flow to the D params here, so under sc.remat_loss="all" the
    # params are the explicit argument of each checkpointed forward (the
    # image inputs are detached constants).
    ckpt = jax.checkpoint if sc.remat_loss == "all" else (lambda f: f)

    losses = {}
    new_stats = {}
    B = batch.imgs.shape[0]
    batch_fr = (sc.batch_fake_real and seg_img is not None
                and "batch" not in sc.norm_D)
    dnoise = _make_d_noise(sc, states, noise_rng)

    def _d_img(params, img):
        n_rep = img.shape[0] // B
        seg = (jnp.concatenate([seg_img] * n_rep, axis=0)
               if (seg_img is not None and n_rep > 1) else seg_img)
        return _apply(states.d_img, params, (img, batch.objs, d_boxes),
                      {"layout_masks": batch.masks, "seg": seg},
                      train=True)

    if batch_fr:
        both, new_stats["img"] = ckpt(_d_img)(
            d_params["img"],
            dnoise(jnp.concatenate([img_pred, batch.imgs], axis=0), "both"))
        pred_fake = [[t[:B] for t in feats] for feats in both]
        gt_real = [[t[B:] for t in feats] for feats in both]
    else:
        pred_fake, _ = ckpt(_d_img)(d_params["img"],
                                    dnoise(img_pred, "fake"))
        gt_real, new_stats["img"] = ckpt(_d_img)(d_params["img"],
                                                 dnoise(batch.imgs, "real"))
    losses["D_img_fake"] = criterion(pred_fake, False, for_discriminator=True)
    losses["D_img_real"] = criterion(gt_real, True, for_discriminator=True)
    total = losses["D_img_fake"] + losses["D_img_real"]
    losses["total_img_loss"] = total
    if not sc.use_img_disc:
        # vestigial in the reference: logged, never backpropagated
        losses["D_img_wrong"] = jax.lax.stop_gradient(
            criterion(gt_real, False, for_discriminator=True) * 0.25)

    if not sc.use_img_disc and states.d_obj is not None:
        def _d_obj(params, img):
            return _apply(states.d_obj, params, (img, batch.objs, d_boxes),
                          {}, train=True)

        (scores_fake, _, ac_fake, _), _ = ckpt(_d_obj)(
            d_params["obj"], img_pred)
        (scores_real, real, ac_real, _), new_stats["obj"] = ckpt(_d_obj)(
            d_params["obj"], batch.imgs)
        d_obj = (_masked_bce(scores_real, 1.0, real)
                 + _masked_bce(scores_fake, 0.0, real)) * 0.5
        losses["D_obj"] = d_obj
        losses["D_ac_real"] = ac_real
        losses["D_ac_fake"] = ac_fake
        obj_total = d_obj + ac_real + ac_fake
        losses["total_obj_loss"] = obj_total
        total = total + obj_total

        if states.d_mask is not None and sc.mask_size > 0 and masks_pred is not None:
            def _d_mask(params, m):
                return _apply(states.d_mask, params, (batch.objs, m),
                              {}, train=True)

            (fake_m, slot_real), _ = ckpt(_d_mask)(
                d_params["mask"], masks_pred)
            (real_m, _), new_stats["mask"] = ckpt(_d_mask)(
                d_params["mask"], batch.masks)
            mask_total = (_masked_multiscale_gan_loss(
                fake_m, slot_real, False, True, sc.gan_mode) * 0.5
                + _masked_multiscale_gan_loss(
                    real_m, slot_real, True, True, sc.gan_mode) * 0.5)
            losses["total_mask_loss"] = mask_total
            total = total + mask_total

    return total, (losses, new_stats)


# ----------------------------------------------------------------- the steps

def _gan_train_body(states: GanStates, batch, rng, vgg_params, sc: StepCfg):
    """One full G + REINFORCE + D update (traceable; shared by the single-
    and multi-step entry points). Returns (states, metrics).

    Generator and discriminator losses are combined in a SINGLE
    value_and_grad over the disjoint {g, img-D, obj-D, mask-D} parameter
    groups: stop_gradients keep the update semantics identical to the
    reference's five separate backward passes (the G terms see frozen D
    params, the D terms see detached fakes), while the shared primal graph
    lets XLA CSE the duplicated discriminator forwards (D(real) for feature
    matching vs. the D loss, D(fake) for the G hinge vs. the D loss)."""
    g_rng, _ = jax.random.split(rng)

    all_params = {"g": states.g.params}
    if not sc.skip_generation:
        all_params["img"] = states.d_img.params
        if states.d_obj is not None:
            all_params["obj"] = states.d_obj.params
        if states.d_mask is not None:
            all_params["mask"] = states.d_mask.params

    def loss_fn(p):
        d_params = {k: p.get(k) for k in ("img", "obj", "mask")}
        # one seg for all four image-D forwards (fake/real x G-loss/D-loss):
        # built from the live params so the D update trains its embedding;
        # generator_losses stop-grads it (frozen-D semantics preserved)
        seg_img = (seg_for_d_img(states, p["img"], batch)
                   if not sc.skip_generation else None)
        g_total, (g_losses, outputs, new_gstats) = generator_losses(
            sc, states, p["g"], batch, g_rng, vgg_params, d_params=d_params,
            seg_img=seg_img)
        metrics = dict(g_losses)
        d_stats = {}
        total = g_total
        if not sc.skip_generation:
            d_total, (d_losses, d_stats) = discriminator_losses(
                sc, states, {k: v for k, v in d_params.items()
                             if v is not None}, batch, outputs,
                seg_img=seg_img, noise_rng=g_rng)
            metrics.update(d_losses)
            total = total + d_total
        return total, (metrics, new_gstats, d_stats)

    (_, (metrics, new_gstats, d_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(all_params)

    g_state = states.g.apply_gradients(grads=grads["g"]).replace(
        batch_stats=new_gstats)
    states = states.replace(g=g_state)
    if not sc.skip_generation:
        d_img = states.d_img.apply_gradients(grads=grads["img"]).replace(
            batch_stats=d_stats.get("img", states.d_img.batch_stats))
        states = states.replace(d_img=d_img)
        if states.d_obj is not None:
            d_obj = states.d_obj.apply_gradients(grads=grads["obj"]).replace(
                batch_stats=d_stats.get("obj", states.d_obj.batch_stats))
            states = states.replace(d_obj=d_obj)
        if states.d_mask is not None:
            d_mask = states.d_mask.apply_gradients(
                grads=grads["mask"]).replace(
                batch_stats=d_stats.get("mask", states.d_mask.batch_stats))
            states = states.replace(d_mask=d_mask)
    return states, metrics


def _conv_w(states: GanStates, sc: StepCfg):
    if sc.skip_graph_model:
        return None
    return symmetrize_converse(
        states.g.params["sg_to_layout"]["converse_candidates_weights"])


@partial(jax.jit, static_argnames=("sc",), donate_argnames=("states",))
def gan_train_step(states: GanStates, batch, rng, vgg_params, *, sc: StepCfg):
    """One fused G + REINFORCE + D update. Returns (states, metrics, conv_w).
    See :func:`_gan_train_body` for the fusion semantics."""
    states, metrics = _gan_train_body(states, batch, rng, vgg_params, sc)
    return states, metrics, _conv_w(states, sc)


@partial(jax.jit, static_argnames=("sc",), donate_argnames=("states",))
def gan_train_multi_step(states: GanStates, batches, rngs, vgg_params, *,
                         sc: StepCfg):
    """K GAN train steps in ONE dispatch via lax.scan over stacked batches.

    Amortizes host->device dispatch latency (the chip sits behind a network
    tunnel): ``batches`` is a batch pytree with a leading K axis, ``rngs``
    is (K, 2) PRNG keys. Bit-equivalent to K sequential gan_train_step calls
    (tests/test_gan_training.py); the learned-converse host feedback then
    updates every K steps. Returns (states, last-step metrics, conv_w)."""

    def body(carry, xs):
        batch, rng = xs
        carry, metrics = _gan_train_body(carry, batch, rng, vgg_params, sc)
        return carry, metrics

    states, metrics = jax.lax.scan(body, states, (batches, rngs))
    metrics = jax.tree_util.tree_map(lambda m: m[-1], metrics)
    return states, metrics, _conv_w(states, sc)


@partial(jax.jit, static_argnames=("sc", "use_gt", "use_gt_masks"))
def gan_eval_step(states: GanStates, batch, rng, *, sc: StepCfg,
                  use_gt: bool = True, use_gt_masks: bool | None = None):
    """Inference forward (test_mode) + IoU totals — check_model's core.

    `use_gt`/`use_gt_masks` select among the reference's four qualitative
    sample variants (gt_box_gt_mask / gt_box_pred_mask / pred_box_gt_mask /
    pred_box_pred_mask, scripts/train.py:243-251)."""
    from canonicalsg2im_tpu.evaluation.metrics import masked_batch_iou

    if use_gt_masks is None:
        use_gt_masks = use_gt
    boxes_gt = batch.boxes if use_gt else None
    masks_gt = batch.masks if (use_gt_masks and batch.masks is not None) else None
    (img, boxes_pred, masks_pred), _ = _apply(
        states.g, states.g.params,
        (batch.objs, batch.triplets, batch.triplet_type),
        {"boxes_gt": boxes_gt, "masks_gt": masks_gt, "test_mode": True},
        train=False, rngs={"noise": rng})
    metrics = {}
    if boxes_pred is not None:
        totals, per_image = masked_batch_iou(boxes_pred, batch.boxes,
                                             batch.objs)
        metrics.update(totals)
    return img, boxes_pred, masks_pred, metrics
