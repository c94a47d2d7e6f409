"""Training driver — counterpart of the reference `scripts/train.py`.

Drives both stages end-to-end: the SG->Layout stage (the reference's
``--skip_generation 1`` configuration) via `train_layout`, and the full
AttSPADE GAN stage (G + REINFORCE + all discriminators, `train_gan` below)
with K-step scan dispatch, host prefetch, val harness, checkpointing, and
JSONL + TensorBoard logging.

Usage:
  # SG->Layout stage
  python -m scripts.train --dataset packed_clevr_syn --skip_generation 1 \
      --num_iterations 200 --batch_size 16 --learned_converse 1
  # full GAN stage
  python -m scripts.train --dataset packed_coco --dataroot datasets/synth \
      --image_size 256,256 --batch_size 16 --num_iterations 4000
"""
from __future__ import annotations

import logging
import os
import time

from canonicalsg2im_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax
import numpy as np

from canonicalsg2im_tpu.config import Config, parse_cli
from canonicalsg2im_tpu.data import BucketedLoader, get_dataset
from canonicalsg2im_tpu.data.vocab import non_meta_relation_ids
from canonicalsg2im_tpu.graphs.converse import format_probability_tables
from canonicalsg2im_tpu.parallel import create_mesh, shard_batch, replicate
from canonicalsg2im_tpu.train import (
    create_layout_state,
    layout_eval_step,
    layout_train_step,
)
from canonicalsg2im_tpu.utils import MetricLogger, restore_checkpoint, save_checkpoint


def evaluate_layout(cfg, state, loader, rng, max_samples=None):
    sums = {"iou_sum": 0.0, "iou05_sum": 0.0, "iou03_sum": 0.0, "count": 0.0}
    bbox_losses, seen = [], 0
    for batch in loader:
        metrics, *_ = layout_eval_step(state, batch, rng,
                                       bbox_weight=cfg.bbox_pred_loss_weight)
        for k in sums:
            sums[k] += float(metrics[k])
        bbox_losses.append(float(metrics["bbox_pred"]))
        seen += batch.objs.shape[0]
        if max_samples and seen >= max_samples:
            break
    n = max(sums["count"], 1.0)
    return {
        "avg_iou": sums["iou_sum"] / n,
        "total_iou_05": sums["iou05_sum"] / n,
        "total_iou_03": sums["iou03_sum"] / n,
        "bbox_pred": float(np.mean(bbox_losses)) if bbox_losses else 0.0,
    }


def _block_size(t: int, cfg: Config, K: int) -> int:
    """Steps in the next dispatch block: K clipped to num_iterations and to
    the next print/checkpoint/full_test boundary, so every `t % every == 0`
    event fires exactly as in the single-step loop."""
    n = min(K, cfg.num_iterations - t)
    for every in (cfg.print_every, cfg.checkpoint_every, cfg.full_test):
        if every and every > 0:
            n = min(n, every - (t % every))
    return max(n, 1)


def _stack_batches(batches):
    """K Batch pytrees -> one pytree with a leading K axis (scan input)."""
    if len(batches) == 1:
        return batches[0]
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def _batch_sig(b):
    return tuple(None if x is None else x.shape for x in b)


def _fetch_block(it, k: int, held: list):
    """Up to k SAME-SHAPE batches from the epoch iterator.

    Batches land in different bucket-ladder shapes, and a lax.scan block must
    be shape-homogeneous — a batch that breaks the run is parked in ``held``
    (a 1-slot pushback) and leads the next block. Short blocks at epoch end /
    shape changes are fine: the loop falls back to smaller scan programs or
    the single-step path."""
    out = []
    if held[0] is not None:
        out.append(held[0])
        held[0] = None
    try:
        while len(out) < k:
            b = next(it)
            if out and _batch_sig(b) != _batch_sig(out[0]):
                held[0] = b
                break
            out.append(b)
    except StopIteration:
        pass
    return out


def _prefetched_blocks(batch_iter, cfg: Config, K: int, t0: int, mesh,
                       lookahead: int = 1, attach=None):
    """Yield (k, device_resident_block) with host work pipelined.

    A daemon thread assembles dispatch block t+1 — loader fetch (per-sample
    canonicalization + synthetic render), stacking, and the device upload —
    while the device executes block t, so the host never sits between
    dispatches (VERDICT r2 task 5; the TPU analogue of the reference
    DataLoader's worker+pin_memory overlap). The thread tracks its own step
    counter: block sizes depend only on t, which advances deterministically
    by k per block. Cost: batches for block t+1 are rendered with converse
    weights one block staler than the synchronous loop — the reference's own
    feedback is one full EPOCH stale (update_loader_params,
    scripts/train.py:274-278), so this is still tighter.

    ``lookahead=0`` falls back to synchronous in-loop assembly (the
    pre-pipeline behavior; used for A/B measurement)."""
    import queue as queue_mod
    import threading

    def make_block(t, held):
        block = _fetch_block(batch_iter, _block_size(t, cfg, K), held)
        if not block:
            return None
        k = len(block)
        host = block[0] if k == 1 else _stack_batches(block)
        dev = shard_batch(host, mesh, stacked=k > 1)
        if attach is not None:
            # device-image-pool feed: fill imgs by an on-device gather keyed
            # by the HOST copy of image_ids (no device->host readback)
            dev = attach(dev, host.image_ids)
        return k, dev

    if lookahead <= 0:
        held = [None]
        t = t0
        while t < cfg.num_iterations:
            item = make_block(t, held)
            if item is None:
                return
            yield item
            t += item[0]
        return

    q: queue_mod.Queue = queue_mod.Queue(maxsize=lookahead)
    stop = threading.Event()

    def producer():
        try:
            held = [None]
            t = t0
            while t < cfg.num_iterations and not stop.is_set():
                item = make_block(t, held)
                if item is None:
                    break
                while not stop.is_set():  # bounded put, abandonment-safe
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue_mod.Full:
                        continue
                if stop.is_set():
                    return
                t += item[0]
            q.put(None)
        except BaseException as e:  # propagate to the consumer
            if not stop.is_set():
                q.put(e)

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def train_gan(cfg: Config, train_loader, val_loader, mesh, logger):
    """Adversarial training loop (reference train.py:346-438, GAN configs)."""
    from canonicalsg2im_tpu.models.vgg import load_vgg_params
    from canonicalsg2im_tpu.train.gan import (
        create_gan_states, gan_eval_step, gan_train_multi_step,
        gan_train_step, step_cfg_from_config)

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    states = create_gan_states(cfg, init_rng)
    states = replicate(states, mesh)
    sc = step_cfg_from_config(cfg)
    vgg_params, vgg_pretrained = load_vgg_params(cfg.weights_dir)
    if not vgg_pretrained and not cfg.no_vgg_loss:
        print("WARNING: no converted VGG19 weights found under "
              f"{cfg.weights_dir}/ — using a fixed-seed random perceptual "
              "net. Run scripts/convert_weights.py for reference parity.")
    vgg_params = replicate(vgg_params, mesh)

    t, epoch = 0, 0
    if cfg.restore_checkpoint and cfg.checkpoint_name:
        states, counters = restore_checkpoint(cfg.checkpoint_name, like=states)
        t, epoch = counters["t"], counters["epoch"]
        # resume the model->loader feedback loop immediately: without this
        # the first post-restore epoch samples converse edges from the
        # DEFAULT weights instead of the learned ones (the reference has the
        # same one-epoch staleness; here the checkpoint carries the weights,
        # so push them before the first batch)
        _push_converse_weights(cfg, states.g.params,
                               (train_loader, val_loader))

    # Inception Score accumulated over generated val images each checkpoint
    # (reference check_model, train.py:198,266-268)
    inception = None
    if not cfg.skip_generation:
        from canonicalsg2im_tpu.evaluation.inception import InceptionScore

        inception = InceptionScore(cfg.weights_dir)

    # Opt-in proxy-feature FID/IS (evaluation/proxy.py): the in-image
    # stand-in for the reference's pretrained instrument
    # (evaluation/fid/fid_score.py:232-250). RELATIVE metric — ranks
    # checkpoints / detects texture regressions on the synthetic
    # distribution; NOT literature-comparable.
    proxy = proxy_real_stats = None
    if cfg.proxy_metrics and not cfg.skip_generation:
        from canonicalsg2im_tpu.evaluation.proxy import ProxyActivations

        proxy = ProxyActivations(cfg.proxy_weights)
        print(f"proxy metrics on ({cfg.proxy_weights}) — relative, "
              "not literature-comparable")

    def run_val(use_gt, eval_rng, max_samples):
        nonlocal proxy_real_stats
        sums = {"iou_sum": 0.0, "iou05_sum": 0.0,
                "iou03_sum": 0.0, "count": 0.0}
        seen, img, vb = 0, None, None
        if inception is not None:
            inception.clean()
        if proxy is not None:
            proxy.clean()
        real_acc = None
        if proxy is not None and proxy_real_stats is None:
            from canonicalsg2im_tpu.evaluation.proxy import ProxyActivations

            real_acc = ProxyActivations(cfg.proxy_weights)
        for vb in val_loader:
            vb = shard_batch(vb, mesh)
            img, *_rest, vmetrics = gan_eval_step(
                states, vb, eval_rng, sc=sc, use_gt=use_gt)
            for k in sums:
                if k in vmetrics:
                    sums[k] += float(vmetrics[k])
            if inception is not None and img is not None:
                inception(np.asarray(jax.device_get(img)))
            if proxy is not None and img is not None:
                proxy(np.asarray(jax.device_get(img)))
                if real_acc is not None and vb.imgs is not None:
                    real_acc(np.asarray(jax.device_get(vb.imgs)))
            seen += vb.objs.shape[0]
            if max_samples and seen >= max_samples:
                break
        if real_acc is not None and real_acc.acts:
            proxy_real_stats = real_acc.statistics()
        n = max(sums["count"], 1.0)
        out = {"avg_iou": sums["iou_sum"] / n,
               "total_iou_05": sums["iou05_sum"] / n,
               "total_iou_03": sums["iou03_sum"] / n}
        if inception is not None:
            mean, std = inception.compute_score(splits=5)
            out["inception_mean"], out["inception_std"] = mean, std
        if proxy is not None and proxy.acts:
            from canonicalsg2im_tpu.evaluation.fid import (
                calculate_frechet_distance)

            pm, ps = proxy.inception_score(splits=5)
            out["proxy_is_mean"], out["proxy_is_std"] = pm, ps
            if proxy_real_stats is not None:
                mu_f, sig_f = proxy.statistics()
                out["proxy_fid"] = float(calculate_frechet_distance(
                    proxy_real_stats[0], proxy_real_stats[1], mu_f, sig_f))
        return out, img, vb

    attach = None
    if cfg.device_image_pool and cfg.pool_segment_size > 0:
        from canonicalsg2im_tpu.data.device_cache import RotatingDevicePool

        pool = RotatingDevicePool(
            train_loader.dataset, mesh,
            segment_size=cfg.pool_segment_size,
            batch_size=cfg.batch_size,
            passes_per_segment=cfg.pool_passes_per_segment,
            block_batches=max(1, cfg.steps_per_dispatch),
            dtype=cfg.device_pool_dtype, seed=cfg.seed, progress=True)
        train_loader.index_sampler = pool.sampler
        print(f"RotatingDevicePool: {len(train_loader.dataset)} train images "
              f"in segments of {cfg.pool_segment_size} "
              f"(x{cfg.pool_passes_per_segment} passes, "
              f"{cfg.device_pool_dtype}); loader rendering disabled")
        attach = pool.attach
    elif cfg.device_image_pool:
        from canonicalsg2im_tpu.data.device_cache import DeviceImagePool

        pool = DeviceImagePool(train_loader.dataset, mesh,
                               dtype=cfg.device_pool_dtype, progress=True)
        print(f"DeviceImagePool: cached {pool.pool.shape[0]} train images "
              f"({pool.nbytes() / 1e9:.2f} GB HBM, {pool.pool.dtype}); "
              "loader rendering disabled")
        attach = pool.attach

    t_start, t0_steps = time.time(), t
    K = max(1, cfg.steps_per_dispatch)
    while t < cfg.num_iterations:
        epoch += 1
        batch_iter = iter(train_loader)
        for k, dev in _prefetched_blocks(batch_iter, cfg, K, t, mesh,
                                         cfg.host_prefetch_blocks,
                                         attach=attach):
            maybe_profile(cfg, t + k)
            rng, sub = jax.random.split(rng)
            step_rngs = jax.random.split(sub, k)
            try:
                if k == 1:
                    states, metrics, conv_w = gan_train_step(
                        states, dev, step_rngs[0], vgg_params, sc=sc)
                else:
                    states, metrics, conv_w = gan_train_multi_step(
                        states, dev, step_rngs, vgg_params, sc=sc)
            except Exception as e:  # keep training through bad batches,
                if not cfg.continue_on_error:  # as the reference does
                    raise  # (scripts/train.py:440-441)
                logging.getLogger(__name__).exception(e)
                t += k
                continue
            t += k
            if cfg.learned_converse and conv_w is not None:
                w = np.asarray(jax.device_get(conv_w))
                train_loader.set_converse_weights(w)
                val_loader.set_converse_weights(w)

            if t % cfg.print_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                rate = ((t - t0_steps) * cfg.batch_size
                        / max(time.time() - t_start, 1e-9))
                print(f"t = {t} / {cfg.num_iterations} "
                      + " ".join(f"[{k}]: {v:.4f}" for k, v in sorted(m.items()))
                      + f" ({rate:.2f} imgs/s)")
                logger.log("train/loss", m, t, force=True)

            if t % cfg.checkpoint_every == 0 or t == cfg.num_iterations:
                rng, eval_rng = jax.random.split(rng)
                # GT-layout pass then pred-layout pass (train.py:410-424)
                gt_val, _, _ = run_val(True, eval_rng, cfg.num_val_samples)
                logger.log("gt_val/loss", gt_val, t, force=True)
                val, img, vb = run_val(cfg.skip_graph_model, eval_rng,
                                       cfg.num_val_samples)
                print(f"Iter: {t}, VAL avg_iou: {val['avg_iou']:.4f}"
                      + (f" IS: {val['inception_mean']:.3f}"
                         if "inception_mean" in val else ""))
                logger.log("val/loss", val, t, force=True)
                path = os.path.join(cfg.output_dir, f"itr_{t}.ckpt")
                save_checkpoint(path, states, vocab=cfg.vocab,
                                counters={"t": t, "epoch": epoch})
                print("Saving checkpoint to", path)
                print_canonicalization_tables(cfg, states.g.params)
                # the reference's four qualitative variants
                # (scripts/train.py:243-251) on the last val batch
                variants = {"gt_box_gt_mask": (True, True),
                            "gt_box_pred_mask": (True, False),
                            "pred_box_gt_mask": (False, True),
                            "pred_box_pred_mask": (False, False)}
                if cfg.skip_graph_model:
                    variants = {"gt_box_gt_mask": (True, True)}
                for name, (gb, gm) in variants.items():
                    vi, *_ = gan_eval_step(states, vb, eval_rng, sc=sc,
                                           use_gt=gb, use_gt_masks=gm)
                    if vi is not None:
                        row = save_image_grid(
                            np.asarray(jax.device_get(vi)),
                            os.path.join(cfg.output_dir, "val", str(t),
                                         f"{name}.png"), cfg.img_deprocess)
                        if row is not None:
                            # reference mirrors val grids to TB
                            # (train.py:454-465 add_images)
                            logger.log_image(f"val_{name}", row, t)
                save_image_grid(np.asarray(vb.imgs),
                                os.path.join(cfg.output_dir, "val", str(t),
                                             "gt_img.png"), cfg.img_deprocess)

            if cfg.full_test and t % cfg.full_test == 0:
                # periodic full-val pass (reference train.py:432-438)
                rng, eval_rng = jax.random.split(rng)
                full, _, _ = run_val(False, eval_rng, None)
                print(f"Iter: {t}, FULL TEST avg_iou: {full['avg_iou']:.4f}")
                logger.log("test/loss", full, t, force=True)
    return states


def maybe_profile(cfg, t, start_at: int = 10, steps: int = 3):
    """--timing: capture a jax.profiler trace of a few steady-state steps
    (the reference declares --timing but never uses it, scripts/args.py:74;
    here it produces a real TensorBoard-loadable device trace).

    Threshold-based (not exact-match) so it also works when the loop
    advances t by steps_per_dispatch-sized blocks."""
    if not cfg.timing:
        return
    state = maybe_profile.__dict__
    if not state.get("started") and t >= start_at:
        jax.profiler.start_trace(os.path.join(cfg.output_dir, "profile"))
        state["started"] = True
    elif (state.get("started") and not state.get("stopped")
          and t >= start_at + steps):
        jax.profiler.stop_trace()
        state["stopped"] = True
        print("profiler trace ->", os.path.join(cfg.output_dir, "profile"))


def deprocess(imgs, mode: str = "decode_img"):
    """NHWC float batch -> uint8, per the reference's deprocess functions
    (sg2im/data/utils.py:13-43): decode_img inverts (x-.5)/.5; imagenet
    inverts the ImageNet normalization."""
    if mode == "imagenet":
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x = imgs * std + mean
    else:
        x = (imgs + 1.0) / 2.0
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


def save_image_grid(imgs, path, mode: str = "decode_img"):
    """Dump an NHWC image batch as one PNG row (train.py:454-465)."""
    try:
        from PIL import Image
    except ImportError:
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = deprocess(np.asarray(imgs), mode)
    row = np.concatenate(list(arr), axis=1)
    Image.fromarray(row).save(path)
    return row


def main(cfg: Config):
    train_ds = get_dataset(cfg.dataset, "train", cfg)
    val_ds = get_dataset(cfg.dataset, "val", cfg)
    cfg.vocab = train_ds.vocab
    cfg.finalize()
    os.makedirs(cfg.output_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.output_dir, "run_args.json"))
    logger = MetricLogger(cfg.output_dir, every=min(cfg.print_every, 500))

    loader_kw = dict(bucket_objects=cfg.bucket_objects,
                     bucket_triplets=cfg.bucket_triplets, seed=cfg.seed,
                     num_workers=cfg.loader_num_workers,
                     ratchet_buckets=cfg.ratchet_buckets)
    train_loader = BucketedLoader(train_ds, cfg.batch_size, shuffle=True, **loader_kw)
    val_loader = BucketedLoader(val_ds, cfg.batch_size, shuffle=cfg.shuffle_val,
                                **loader_kw)

    mesh = create_mesh(cfg.mesh_shape)

    if not cfg.skip_generation:
        states = train_gan(cfg, train_loader, val_loader, mesh, logger)
        logger.close()
        return states

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    state = create_layout_state(cfg, init_rng)
    state = replicate(state, mesh)

    t, epoch = 0, 0
    if cfg.restore_checkpoint and cfg.checkpoint_name:
        tree, counters = restore_checkpoint(cfg.checkpoint_name, like=state)
        state, t, epoch = tree, counters["t"], counters["epoch"]
        _push_converse_weights(cfg, state.params, (train_loader, val_loader))

    non_meta = tuple(non_meta_relation_ids(cfg.vocab))
    t_start, t0_steps = time.time(), t
    K = max(1, cfg.steps_per_dispatch)
    step_kw = dict(non_meta_rels=non_meta,
                   bbox_weight=cfg.bbox_pred_loss_weight,
                   mask_weight=cfg.mask_pred_loss_weight,
                   learned_converse=cfg.learned_converse)

    while t < cfg.num_iterations:
        epoch += 1
        batch_iter = iter(train_loader)
        for k, dev in _prefetched_blocks(batch_iter, cfg, K, t, mesh,
                                         cfg.host_prefetch_blocks):
            maybe_profile(cfg, t + k)
            rng, sub = jax.random.split(rng)
            step_rngs = jax.random.split(sub, k)
            if k == 1:
                state, metrics, conv_w = layout_train_step(
                    state, dev, step_rngs[0], **step_kw)
            else:
                from canonicalsg2im_tpu.train import layout_train_multi_step

                state, metrics, conv_w = layout_train_multi_step(
                    state, dev, step_rngs, **step_kw)
            t += k
            if cfg.learned_converse:
                # device -> host -> data pipeline feedback (train.py:383-385)
                w = np.asarray(jax.device_get(conv_w))
                train_loader.set_converse_weights(w)
                val_loader.set_converse_weights(w)

            if t % cfg.print_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                rate = (t - t0_steps) * cfg.batch_size / max(time.time() - t_start, 1e-9)
                print(f"t = {t} / {cfg.num_iterations} "
                      + " ".join(f"[{k}]: {v:.4f}" for k, v in m.items())
                      + f" ({rate:.1f} graphs/s)")
                logger.log("train/loss", m, t, force=True)

            if t % cfg.checkpoint_every == 0 or t == cfg.num_iterations:
                rng, eval_rng = jax.random.split(rng)
                val = evaluate_layout(cfg, state, val_loader, eval_rng,
                                      max_samples=cfg.num_val_samples)
                print(f"Iter: {t}, VAL avg_iou: {val['avg_iou']:.4f} "
                      f"iou03: {val['total_iou_03']:.4f} "
                      f"iou05: {val['total_iou_05']:.4f}")
                logger.log("val/loss", val, t, force=True)
                path = os.path.join(cfg.output_dir, f"itr_{t}.ckpt")
                save_checkpoint(path, state, vocab=cfg.vocab,
                                counters={"t": t, "epoch": epoch})
                print("Saving checkpoint to", path)
                print_canonicalization_tables(cfg, state.params)
    logger.close()
    return state


def _push_converse_weights(cfg, params, loaders):
    """Copy the (restored) learned converse weights into the data loaders —
    the model->dataset feedback edge of WSGC (reference update_loader_params,
    scripts/train.py:274-278) re-established at resume time."""
    from canonicalsg2im_tpu.models.sg2layout import symmetrize_converse

    if not cfg.learned_converse:
        return
    p = params.get("sg_to_layout", params)
    if "converse_candidates_weights" not in p:
        return
    w = np.asarray(jax.device_get(
        symmetrize_converse(p["converse_candidates_weights"])))
    for loader in loaders:
        loader.set_converse_weights(w)


def print_canonicalization_tables(cfg, params):
    """Checkpoint-time learned-canonicalization diagnostics (the reference
    prints these every checkpoint, scripts/train.py:406-408)."""
    import jax.numpy as jnp  # noqa: F401 (device_get handles jnp arrays)
    from canonicalsg2im_tpu.models.sg2layout import symmetrize_converse

    p = params.get("sg_to_layout", params)
    conv = trans = None
    if cfg.learned_converse and "converse_candidates_weights" in p:
        conv = np.asarray(jax.device_get(
            symmetrize_converse(p["converse_candidates_weights"])))
    if cfg.learned_transitivity and "trans_candidates_weights" in p:
        trans = np.asarray(jax.device_get(p["trans_candidates_weights"]))
    if conv is None and trans is None:
        return
    non_meta = tuple(non_meta_relation_ids(cfg.vocab))
    print(format_probability_tables(conv, trans, cfg.vocab, non_meta))


if __name__ == "__main__":
    main(parse_cli())
