"""Full GAN stack smoke + behavior tests at tiny resolution (32x32)."""
import jax
import numpy as np
import pytest

from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.data import BucketedLoader, get_dataset
from canonicalsg2im_tpu.models.vgg import load_vgg_params
from canonicalsg2im_tpu.train.gan import (
    create_gan_states,
    gan_eval_step,
    gan_train_step,
    step_cfg_from_config,
)


def _setup(**kw):
    base = dict(dataset="packed_clevr_syn", num_train_samples=16,
                num_val_samples=8, batch_size=2, min_objects=3, max_objects=5,
                image_size=(32, 32), ngf=16, ndf=16, num_D=2, n_layers_D=2,
                gconv_num_layers=2, gconv_hidden_dim=32, gconv_dim=16,
                embedding_dim=4, crop_size=32, learned_converse=True)
    base.update(kw)
    cfg = Config(**base)
    ds = get_dataset(cfg.dataset, "train", cfg)
    cfg.vocab = ds.vocab
    cfg.finalize()
    loader = BucketedLoader(ds, cfg.batch_size, seed=0, prefetch=0,
                            bucket_objects=(8,), bucket_triplets=(64,))
    vgg_params, pretrained = load_vgg_params(cfg.weights_dir)
    return cfg, loader, vgg_params


def test_gan_train_step_runs_and_updates_everything():
    cfg, loader, vgg_params = _setup()
    states = create_gan_states(cfg, jax.random.PRNGKey(0))
    sc = step_cfg_from_config(cfg)
    batch = next(iter(loader))

    g0 = jax.tree.map(np.asarray, states.g.params)
    d0 = jax.tree.map(np.asarray, states.d_img.params)
    states, metrics, conv_w = gan_train_step(
        states, batch, jax.random.PRNGKey(1), vgg_params, sc=sc)

    for key in ("bbox_pred", "GAN_Img", "GAN_Feat", "VGG", "GAN_Obj",
                "GAN_Ac", "loss_conv", "total_loss", "D_img_fake",
                "D_img_real", "D_img_wrong", "D_obj", "D_ac_real",
                "D_ac_fake", "total_img_loss", "total_obj_loss"):
        assert key in metrics, key
        assert np.isfinite(float(metrics[key])), key

    g1 = states.g.params
    d1 = states.d_img.params
    changed_g = any(not np.allclose(np.asarray(a), np.asarray(b))
                    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)))
    changed_d = any(not np.allclose(np.asarray(a), np.asarray(b))
                    for a, b in zip(jax.tree.leaves(d0), jax.tree.leaves(d1)))
    assert changed_g and changed_d
    assert conv_w is not None and conv_w.shape[0] == conv_w.shape[1]


def test_gan_eval_step_generates_images():
    cfg, loader, vgg_params = _setup()
    states = create_gan_states(cfg, jax.random.PRNGKey(0))
    sc = step_cfg_from_config(cfg)
    batch = next(iter(loader))
    img, boxes_pred, _, metrics = gan_eval_step(
        states, batch, jax.random.PRNGKey(2), sc=sc, use_gt=True)
    B = batch.objs.shape[0]
    assert img.shape == (B, 32, 32, 3)
    assert np.asarray(img).min() >= -1.0 and np.asarray(img).max() <= 1.0
    assert boxes_pred.shape == batch.boxes.shape
    assert np.isfinite(float(metrics["iou_sum"]))

    # predicted-box path (use_gt=False) also traces and runs
    img2, *_ = gan_eval_step(states, batch, jax.random.PRNGKey(2), sc=sc,
                             use_gt=False)
    assert img2.shape == img.shape


def test_gan_with_masks_and_mask_discriminator():
    cfg, loader, vgg_params = _setup(mask_size=8, mask_pred_loss_weight=1.0)
    states = create_gan_states(cfg, jax.random.PRNGKey(0))
    assert states.d_mask is not None
    sc = step_cfg_from_config(cfg)
    batch = next(iter(loader))
    assert batch.masks is not None
    states, metrics, _ = gan_train_step(states, batch, jax.random.PRNGKey(1),
                                        vgg_params, sc=sc)
    for key in ("masks_pred", "GAN_Mask", "GAN_Mask_Feat", "total_mask_loss"):
        assert key in metrics and np.isfinite(float(metrics[key])), key


def test_img_disc_only_mode():
    cfg, loader, vgg_params = _setup(use_img_disc=True)
    states = create_gan_states(cfg, jax.random.PRNGKey(0))
    assert states.d_obj is None and states.d_mask is None
    sc = step_cfg_from_config(cfg)
    batch = next(iter(loader))
    states, metrics, _ = gan_train_step(states, batch, jax.random.PRNGKey(1),
                                        vgg_params, sc=sc)
    assert "GAN_Obj" not in metrics and "D_obj" not in metrics
    assert np.isfinite(float(metrics["total_img_loss"]))


def test_gan_multi_step_matches_sequential():
    """lax.scan multi-step (one dispatch) vs K sequential fused steps.

    The guarantee is semantic, not bitwise: XLA fuses the scan body
    differently from the standalone step (and CPU multi-threaded reductions
    are not even run-to-run bit-stable at this model size), so float32
    sums differ by ~1e-7 — and Adam normalizes near-zero gradients to full
    step size, decorrelating those parameters' low-order bits. What must
    hold: the loss trajectory matches to float tolerance, every parameter
    stays within the per-step Adam update bound of its sequential twin, and
    the REINFORCE converse weights agree. Run in float32: the equivalence is
    dtype-independent, and only f32 keeps the 1e-3 trajectory tolerance
    meaningful (bf16 compute diverges ~1e-2 across fusion variants)."""
    from canonicalsg2im_tpu.train.gan import gan_train_multi_step

    cfg, loader, vgg_params = _setup(compute_dtype="float32")
    sc = step_cfg_from_config(cfg)
    batch = next(iter(loader))
    rng = jax.random.PRNGKey(42)

    # K=1: same loss (tight) against the single fused step
    seq = create_gan_states(cfg, jax.random.PRNGKey(0))
    seq, seq_metrics, seq_conv = gan_train_step(seq, batch, rng, vgg_params,
                                                sc=sc)
    scan = create_gan_states(cfg, jax.random.PRNGKey(0))
    stacked1 = jax.tree.map(lambda x: np.stack([x]), batch)
    scan, scan_metrics, scan_conv = gan_train_multi_step(
        scan, stacked1, rng[None], vgg_params, sc=sc)
    np.testing.assert_allclose(float(seq_metrics["total_loss"]),
                               float(scan_metrics["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(seq_conv), np.asarray(scan_conv),
                               atol=5e-4)

    # K=2: same loss trajectory to float32 tolerance, same update scale
    K = 2
    rngs = jax.random.split(jax.random.PRNGKey(7), K)
    stacked = jax.tree.map(lambda x: np.stack([x] * K), batch)
    seq2 = create_gan_states(cfg, jax.random.PRNGKey(0))
    for k in rngs:
        seq2, m_seq, _ = gan_train_step(seq2, batch, k, vgg_params, sc=sc)
    scan2 = create_gan_states(cfg, jax.random.PRNGKey(0))
    scan2, m_scan, _ = gan_train_multi_step(scan2, stacked, rngs, vgg_params,
                                            sc=sc)
    np.testing.assert_allclose(float(m_seq["total_loss"]),
                               float(m_scan["total_loss"]), rtol=1e-3)
    lr_bound = 4 * K * 1e-4  # Adam per-step |update| <= ~lr
    for a, b in zip(jax.tree.leaves(seq2.g.params),
                    jax.tree.leaves(scan2.g.params)):
        assert float(abs(np.asarray(a) - np.asarray(b)).max()) <= lr_bound
    for a, b in zip(jax.tree.leaves(seq2.d_img.params),
                    jax.tree.leaves(scan2.d_img.params)):
        assert float(abs(np.asarray(a) - np.asarray(b)).max()) <= lr_bound


@pytest.mark.parametrize("mode", ["vgg", "all"])
def test_remat_loss_matches_unremat(mode):
    """sc.remat_loss only changes the backward schedule (recompute vs save);
    metrics and parameter updates must match the un-rematerialized step."""
    cfg, loader, vgg_params = _setup()
    batch = next(iter(loader))
    rng = jax.random.PRNGKey(3)
    sc_on = step_cfg_from_config(cfg)._replace(remat_loss=mode)
    sc_off = sc_on._replace(remat_loss="none")

    s_on = create_gan_states(cfg, jax.random.PRNGKey(0))
    s_on, m_on, _ = gan_train_step(s_on, batch, rng, vgg_params, sc=sc_on)
    s_off = create_gan_states(cfg, jax.random.PRNGKey(0))
    s_off, m_off, _ = gan_train_step(s_off, batch, rng, vgg_params, sc=sc_off)

    for key in ("total_loss", "VGG", "GAN_Img", "GAN_Feat", "D_img_fake",
                "D_img_real", "D_obj"):
        np.testing.assert_allclose(float(m_on[key]), float(m_off[key]),
                                   rtol=1e-5, err_msg=key)
    # Param tolerance is the one-Adam-step bound (~lr=4e-4): remat changes
    # fusion/reassociation in the backward (e.g. the split first D conv's
    # two-term sum), and Adam's sqrt(v)-normalized update can amplify a
    # float-epsilon gradient difference on a near-zero element up to ~lr.
    # Gross remat bugs still fail: they shift the metrics (checked tight
    # above) and every parameter, not one element by epsilon.
    def check(tree_a, tree_b):
        n_total = n_loose = 0
        for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(a, b, atol=5e-4)
            n_total += a.size
            n_loose += int((np.abs(a - b) > 1e-5).sum())
        # ... and the epsilon-amplification must stay rare: a real remat bug
        # shifts gradients broadly, not a handful of near-zero elements
        assert n_loose <= max(2, n_total // 1000), (n_loose, n_total)

    check(s_on.g.params, s_off.g.params)
    check(s_on.d_img.params, s_off.d_img.params)


def test_masked_gan_g_excludes_dummy_slots():
    """Generator object-D loss must ignore padding-slot scores for EVERY
    gan mode (reference drops dummies via remove_dummy_objects,
    sg2im/utils.py:56-63; only the hinge branch used to mask)."""
    import jax.numpy as jnp
    import numpy as np

    from canonicalsg2im_tpu.train.gan import _masked_gan_g

    scores = jnp.asarray([[0.7, -0.3, 5.0, 5.0],
                          [1.2, 0.1, 5.0, 5.0]], jnp.float32)
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 0, 0]], jnp.float32)
    real = np.asarray([[0.7, -0.3], [1.2, 0.1]], np.float32)

    for mode, expect in [
        ("hinge", -real.mean()),
        ("w", -real.mean()),
        ("ls", ((real - 1.0) ** 2).mean()),
        ("original", (np.clip(real, 0, None) - real
                      + np.log1p(np.exp(-np.abs(real)))).mean()),
    ]:
        got = float(_masked_gan_g(scores, mask, mode))
        assert abs(got - float(expect)) < 1e-6, (mode, got, expect)
        # dummy slots with huge scores must not move the loss
        scores2 = scores.at[:, 2:].set(-100.0)
        assert abs(float(_masked_gan_g(scores2, mask, mode)) - got) < 1e-6


def test_gan_multichip_equivalence():
    """The full adversarial step — all four optimizers, BatchNorm
    batch_stats, spectral-norm state — must produce the same losses and
    parameters on 1 device, an (8, 1) data mesh, and a (4, 2) data x graph
    mesh over the same global batch. This is the TPU analogue of SyncBN's
    correctness claim (sync_batchnorm/batchnorm.py:51-145): batch statistics
    under the data-sharded jit are global, so device count must not change
    the math (only f32 reduction order)."""
    from canonicalsg2im_tpu.parallel import create_mesh, replicate, shard_batch
    from canonicalsg2im_tpu.train.gan import (create_gan_states,
                                              gan_train_step,
                                              step_cfg_from_config)

    cfg, loader, vgg_params = _setup(batch_size=8, compute_dtype="float32",
                                     num_train_samples=8)
    sc = step_cfg_from_config(cfg)
    batch = next(iter(loader))
    assert batch.objs.shape[0] == 8
    rng = jax.random.PRNGKey(5)

    results = {}
    meshes = {
        "1dev": (create_mesh((1, 1), devices=jax.devices()[:1]), False),
        "dp8": (create_mesh((8, 1)), False),
        "dp4xg2": (create_mesh((4, 2)), True),
    }
    for name, (mesh, shard_graph) in meshes.items():
        states = replicate(create_gan_states(cfg, jax.random.PRNGKey(0)),
                           mesh)
        sharded = shard_batch(batch, mesh, shard_graph=shard_graph)
        states, metrics, conv_w = gan_train_step(states, sharded, rng,
                                                 replicate(vgg_params, mesh),
                                                 sc=sc)
        results[name] = (states, {k: float(v) for k, v in metrics.items()},
                         np.asarray(conv_w))

    ref_states, ref_metrics, ref_conv = results["1dev"]
    for name in ("dp8", "dp4xg2"):
        states, metrics, conv_w = results[name]
        for k in ("total_loss", "bbox_pred", "VGG", "GAN_Img", "GAN_Feat",
                  "D_img_fake", "D_img_real", "D_obj", "loss_conv"):
            np.testing.assert_allclose(metrics[k], ref_metrics[k], rtol=2e-4,
                                       err_msg=f"{name}:{k}")
        np.testing.assert_allclose(conv_w, ref_conv, atol=1e-5)
        # params within the one-Adam-step epsilon-amplification bound, with
        # broad drift ruled out (same pattern as the remat equivalence test)
        for part in ("g", "d_img", "d_obj"):
            a_tree = getattr(states, part).params
            b_tree = getattr(ref_states, part).params
            n_total = n_loose = 0
            for a, b in zip(jax.tree.leaves(a_tree), jax.tree.leaves(b_tree)):
                a, b = np.asarray(a), np.asarray(b)
                np.testing.assert_allclose(a, b, atol=2e-2,
                                           err_msg=f"{name}:{part}")
                n_total += a.size
                n_loose += int((np.abs(a - b) > 1e-4).sum())
            assert n_loose <= max(2, n_total // 500), (name, part, n_loose,
                                                       n_total)
        # BatchNorm statistics are global batch moments on every mesh
        for a, b in zip(jax.tree.leaves(states.g.batch_stats),
                        jax.tree.leaves(ref_states.g.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=name)


def test_d_instance_noise_perturbs_then_anneals_to_reference():
    """BEYOND-REFERENCE --d_instance_noise: with sigma > 0 the image-D losses
    move off the clean-step values (the hinge margin is re-populated); once
    the step counter passes d_noise_anneal, sigma hits 0 and the step is
    IDENTICAL to the reference-semantics (noise-off) step."""
    cfg, loader, vgg_params = _setup(compute_dtype="float32")
    sc_off = step_cfg_from_config(cfg)
    sc_on = sc_off._replace(d_instance_noise=0.2, d_noise_anneal=100)
    batch = next(iter(loader))
    rng = jax.random.PRNGKey(1)

    fresh = lambda: create_gan_states(cfg, jax.random.PRNGKey(0))
    _, m_off, _ = gan_train_step(fresh(), batch, rng, vgg_params, sc=sc_off)
    _, m_on, _ = gan_train_step(fresh(), batch, rng, vgg_params, sc=sc_on)
    # noise lands on the image-D path only
    assert not np.isclose(float(m_on["D_img_real"]),
                          float(m_off["D_img_real"]))
    assert not np.isclose(float(m_on["GAN_Img"]), float(m_off["GAN_Img"]))
    for k in ("D_obj", "bbox_pred", "loss_conv"):
        np.testing.assert_allclose(float(m_on[k]), float(m_off[k]),
                                   rtol=1e-6, err_msg=k)

    # past the anneal horizon sigma == 0: bit-identical to reference
    late = lambda: (lambda s: s.replace(g=s.g.replace(step=100)))(fresh())
    _, m_late_on, _ = gan_train_step(late(), batch, rng, vgg_params,
                                     sc=sc_on)
    _, m_late_off, _ = gan_train_step(late(), batch, rng, vgg_params,
                                      sc=sc_off)
    # sigma == 0 adds an exact +0.0 to the D inputs; the extra op shifts
    # XLA fusion/reassociation by ~1 ulp, so "identical" means float-tight
    for k in m_late_off:
        np.testing.assert_allclose(np.asarray(m_late_on[k]),
                                   np.asarray(m_late_off[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
