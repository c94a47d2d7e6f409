"""Save -> restore -> continue equivalence (the reference's resume path,
scripts/train.py:29-60,488-519).

What must hold for resume to be trustworthy on long runs:

1. the checkpoint roundtrip is BIT-EXACT for every piece of training state —
   params, Adam moments (incl. the multi_transform groups), the step counter,
   BatchNorm batch_stats, spectral-norm power-iteration state, and the
   learned canonicalization weights;
2. training K steps equals training K/2 steps, saving, restoring into a
   freshly initialized state, and training K/2 more — on the same batch/rng
   sequence. The comparison is the established scan-equivalence tolerance
   (tests/test_gan_training.py): XLA:CPU multi-threaded reductions are not
   run-to-run bit-stable at this model size, so trajectories match to float
   tolerance and parameters to the one-Adam-step amplification bound, with
   broad drift ruled out by a rare-loose-element budget.
"""
import os

import jax
import numpy as np
import pytest

from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.data import BucketedLoader, get_dataset
from canonicalsg2im_tpu.utils import restore_checkpoint, save_checkpoint


def _assert_tree_bitexact(a, b, what=""):
    la, ka = jax.tree_util.tree_flatten_with_path(a)[0], None
    lb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert len(la) == len(lb), (what, len(la), len(lb))
    for (pa, xa), (pb, xb) in zip(la, lb):
        assert pa == pb, (what, pa, pb)
        xa, xb = np.asarray(xa), np.asarray(xb)
        assert xa.dtype == xb.dtype, (what, pa, xa.dtype, xb.dtype)
        np.testing.assert_array_equal(xa, xb, err_msg=f"{what}{pa}")


def _assert_tree_close(a, b, lr_bound, what=""):
    """One-Adam-step tolerance with a rare-loose-element budget (the pattern
    of test_gan_training.py::test_remat_loss_matches_unremat)."""
    n_total = n_loose = 0
    for xa, xb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        xa, xb = np.asarray(xa, np.float64), np.asarray(xb, np.float64)
        np.testing.assert_allclose(xa, xb, atol=lr_bound, err_msg=what)
        n_total += xa.size
        n_loose += int((np.abs(xa - xb) > 1e-5).sum())
    assert n_loose <= max(2, n_total // 1000), (what, n_loose, n_total)


# ------------------------------------------------------------------ layout


def _layout_setup():
    cfg = Config(dataset="packed_clevr_syn", num_train_samples=16,
                 batch_size=4, min_objects=3, max_objects=5,
                 image_size=(32, 32), gconv_num_layers=2,
                 gconv_hidden_dim=32, gconv_dim=16, embedding_dim=4,
                 learned_converse=True, learned_transitivity=True,
                 compute_dtype="float32")
    ds = get_dataset(cfg.dataset, "train", cfg)
    cfg.vocab = ds.vocab
    cfg.finalize()
    loader = BucketedLoader(ds, cfg.batch_size, seed=0, prefetch=0,
                            bucket_objects=(8,), bucket_triplets=(128,))
    batches = list(loader)[:4]
    assert len(batches) == 4
    return cfg, batches


def test_layout_resume_equivalence(tmp_path):
    from canonicalsg2im_tpu.data.vocab import non_meta_relation_ids
    from canonicalsg2im_tpu.train import create_layout_state, layout_train_step

    cfg, batches = _layout_setup()
    non_meta = tuple(non_meta_relation_ids(cfg.vocab))
    rngs = jax.random.split(jax.random.PRNGKey(3), 4)
    kw = dict(non_meta_rels=non_meta, bbox_weight=cfg.bbox_pred_loss_weight,
              learned_converse=True)

    def run(state, steps):
        ms = []
        for b, r in steps:
            state, metrics, conv_w = layout_train_step(state, b, r, **kw)
            ms.append({k: float(v) for k, v in metrics.items()})
        return state, ms, conv_w

    # uninterrupted: 4 steps
    full, full_metrics, full_conv = run(
        create_layout_state(cfg, jax.random.PRNGKey(0)),
        list(zip(batches, rngs)))

    # interrupted: 2 steps, save, restore into a FRESH state, 2 steps
    half, half_metrics, _ = run(
        create_layout_state(cfg, jax.random.PRNGKey(0)),
        list(zip(batches[:2], rngs[:2])))
    path = os.path.join(tmp_path, "itr_2.ckpt")
    save_checkpoint(path, half, vocab=cfg.vocab, counters={"t": 2, "epoch": 1})

    fresh = create_layout_state(cfg, jax.random.PRNGKey(9))  # different init
    restored, counters = restore_checkpoint(path, like=fresh)
    assert counters == {"t": 2, "epoch": 1}
    # 1. bit-exact roundtrip of params, Adam moments (multi_transform groups),
    #    and the step counter
    import flax.serialization as ser

    _assert_tree_bitexact(ser.to_state_dict(half), ser.to_state_dict(restored),
                          "layout roundtrip: ")

    resumed, resumed_metrics, resumed_conv = run(
        restored, list(zip(batches[2:], rngs[2:])))

    # 2. trajectory + final state match the uninterrupted run
    for m_full, m_res in zip(full_metrics[2:], resumed_metrics):
        for k in m_full:
            np.testing.assert_allclose(m_full[k], m_res[k], rtol=1e-5,
                                       err_msg=k)
    _assert_tree_close(full.params, resumed.params, 4 * 2 * 1e-2,
                       "layout params: ")
    np.testing.assert_allclose(np.asarray(full_conv),
                               np.asarray(resumed_conv), atol=1e-5)
    assert int(resumed.step) == int(full.step) == 4


# --------------------------------------------------------------------- GAN


def _gan_setup():
    from canonicalsg2im_tpu.models.vgg import load_vgg_params

    cfg = Config(dataset="packed_clevr_syn", num_train_samples=8,
                 batch_size=2, min_objects=3, max_objects=5,
                 image_size=(32, 32), ngf=16, ndf=16, num_D=2, n_layers_D=2,
                 gconv_num_layers=2, gconv_hidden_dim=32, gconv_dim=16,
                 embedding_dim=4, crop_size=32, learned_converse=True,
                 compute_dtype="float32")
    ds = get_dataset(cfg.dataset, "train", cfg)
    cfg.vocab = ds.vocab
    cfg.finalize()
    loader = BucketedLoader(ds, cfg.batch_size, seed=0, prefetch=0,
                            bucket_objects=(8,), bucket_triplets=(64,))
    batches = list(loader)[:2] * 2
    vgg_params, _ = load_vgg_params(cfg.weights_dir)
    return cfg, batches, vgg_params


def test_gan_resume_equivalence(tmp_path):
    """The full adversarial state: 4 optimizers' moments, G + 3 D params,
    BatchNorm batch_stats, spectral-norm u/sigma, converse weights."""
    from canonicalsg2im_tpu.train.gan import (create_gan_states,
                                              gan_train_step,
                                              step_cfg_from_config)

    cfg, batches, vgg_params = _gan_setup()
    sc = step_cfg_from_config(cfg)
    rngs = jax.random.split(jax.random.PRNGKey(11), 4)

    def run(states, steps):
        ms = []
        for b, r in steps:
            states, metrics, conv_w = gan_train_step(states, b, r,
                                                     vgg_params, sc=sc)
            ms.append({k: float(v) for k, v in metrics.items()})
        return states, ms, conv_w

    full, full_metrics, full_conv = run(
        create_gan_states(cfg, jax.random.PRNGKey(0)),
        list(zip(batches, rngs)))

    half, _, _ = run(create_gan_states(cfg, jax.random.PRNGKey(0)),
                     list(zip(batches[:2], rngs[:2])))
    path = os.path.join(tmp_path, "itr_2.ckpt")
    save_checkpoint(path, half, vocab=cfg.vocab, counters={"t": 2, "epoch": 1})

    fresh = create_gan_states(cfg, jax.random.PRNGKey(9))
    restored, counters = restore_checkpoint(path, like=fresh)
    assert counters["t"] == 2

    import flax.serialization as ser

    # spectral-norm state must exist and roundtrip (it lives in batch_stats)
    sd = ser.to_state_dict(half)
    flat_keys = "/".join(str(k) for k, _ in
                         jax.tree_util.tree_flatten_with_path(sd)[0])
    assert "u0" in flat_keys or "sigma" in flat_keys, (
        "expected spectral power-iteration state in the checkpoint")
    _assert_tree_bitexact(sd, ser.to_state_dict(restored), "gan roundtrip: ")

    resumed, resumed_metrics, resumed_conv = run(
        restored, list(zip(batches[2:], rngs[2:])))

    for m_full, m_res in zip(full_metrics[2:], resumed_metrics):
        for k in ("total_loss", "bbox_pred", "VGG", "GAN_Img", "D_img_fake",
                  "D_img_real", "D_obj"):
            np.testing.assert_allclose(m_full[k], m_res[k], rtol=1e-4,
                                       err_msg=k)
    lr_bound = 4 * 2 * 1e-2  # canonical lr dominates (1e-2), 2 divergent steps
    _assert_tree_close(full.g.params, resumed.g.params, lr_bound, "g: ")
    _assert_tree_close(full.d_img.params, resumed.d_img.params,
                       4 * 2 * 1e-4, "d_img: ")
    _assert_tree_close(full.d_obj.params, resumed.d_obj.params,
                       4 * 2 * 1e-4, "d_obj: ")
    _assert_tree_close(full.g.batch_stats, resumed.g.batch_stats, 1e-4,
                       "g stats: ")
    np.testing.assert_allclose(np.asarray(full_conv),
                               np.asarray(resumed_conv), atol=1e-5)


def test_gan_restore_rejects_shape_mismatch(tmp_path):
    """Restoring into a differently-configured model must fail loudly, not
    silently truncate (the reference hard-raises, scripts/train.py:57-59)."""
    from canonicalsg2im_tpu.train.gan import create_gan_states

    cfg, batches, _ = _gan_setup()
    states = create_gan_states(cfg, jax.random.PRNGKey(0))
    path = os.path.join(tmp_path, "ck.ckpt")
    save_checkpoint(path, states, counters={"t": 1, "epoch": 1})

    cfg2, _, _ = _gan_setup()
    cfg2.ngf = 8
    other = create_gan_states(cfg2, jax.random.PRNGKey(0))
    with pytest.raises(Exception):
        restore_checkpoint(path, like=other)
