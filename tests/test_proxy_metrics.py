"""Proxy-feature FID/IS (evaluation/proxy.py) — the in-image stand-in for
the reference's pretrained FID/IS instrument
(/root/reference/evaluation/fid/fid_score.py:232-250), whose weight bytes
cannot exist in this environment. Tests: the trainer learns on a tiny set,
the activation accumulator matches the FidActivations interface, proxy FID
is ~0 on identical distributions and large against noise, and proxy IS is
well-formed."""
import os

import numpy as np
import pytest

from scripts.make_synthetic_raw_data import make_coco


@pytest.fixture(scope="module")
def tiny_proxy(tmp_path_factory):
    """Tiny photometric dataset + a briefly-trained proxy net."""
    root = str(tmp_path_factory.mktemp("proxyds"))
    make_coco(root, n_train=48, n_val=16, size=64, seed=0, photometric=1.0)
    out = os.path.join(root, "proxy.npz")

    from canonicalsg2im_tpu.evaluation.proxy import train_proxy

    metrics = train_proxy(root, out, steps=60, batch_size=8, lr=2e-3,
                          log_every=30)
    return root, out, metrics


def test_trainer_learns_grid_task(tiny_proxy):
    _, out, metrics = tiny_proxy
    assert os.path.exists(out)
    # 60 steps on 48 images: not convergence, but both grid accuracies must
    # beat coin-flip — proof the labels/net/loss are wired correctly
    assert metrics["grid_pos_acc"] + metrics["grid_neg_acc"] > 1.05, metrics


def test_activations_interface_and_determinism(tiny_proxy):
    from canonicalsg2im_tpu.evaluation.proxy import (FEATURE_DIM,
                                                     ProxyActivations)

    _, out, _ = tiny_proxy
    acc = ProxyActivations(out)
    rng = np.random.default_rng(0)
    batch = rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32)
    acc(batch)
    acc(batch)
    assert acc.acts[0].shape == (4, FEATURE_DIM)
    # eval path is deterministic (GroupNorm, no batch statistics)
    np.testing.assert_allclose(acc.acts[0], acc.acts[1], atol=1e-6)
    mu, sigma = acc.statistics()
    assert mu.shape == (FEATURE_DIM,)
    assert sigma.shape == (FEATURE_DIM, FEATURE_DIM)
    # scene softmax rows sum to 1
    np.testing.assert_allclose(acc.probs[0].sum(axis=1), 1.0, atol=1e-5)


def test_proxy_fid_separates_noise_from_data(tiny_proxy, tmp_path):
    """FID(real_half_A, real_half_B) must be far below FID(real, noise) —
    the discriminative property the random-weight Inception fallback lacks
    (it ranked the dithered r4 run better than clean output)."""
    from PIL import Image

    from canonicalsg2im_tpu.evaluation.proxy import proxy_fid_given_paths

    root, out, _ = tiny_proxy
    img_dir = os.path.join(root, "MSCoco", "images", "train2017")
    names = sorted(os.listdir(img_dir))
    a_dir, b_dir, n_dir = (tmp_path / d for d in ("a", "b", "noise"))
    for d in (a_dir, b_dir, n_dir):
        d.mkdir()
    rng = np.random.default_rng(1)
    for i, n in enumerate(names):
        src = os.path.join(img_dir, n)
        dst = (a_dir if i % 2 == 0 else b_dir) / n
        os.symlink(src, dst)
        if i < len(names) // 2:
            noise = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(noise).save(n_dir / n.replace(".jpg", ".png"))

    fid_real = proxy_fid_given_paths([str(a_dir), str(b_dir)], out,
                                     batch_size=8)
    fid_noise = proxy_fid_given_paths([str(a_dir), str(n_dir)], out,
                                      batch_size=8)
    assert fid_real >= 0.0
    assert fid_noise > 3.0 * max(fid_real, 1e-3), (fid_real, fid_noise)


def test_proxy_is_well_formed(tiny_proxy):
    from canonicalsg2im_tpu.evaluation.proxy import proxy_is_given_path

    root, out, _ = tiny_proxy
    img_dir = os.path.join(root, "MSCoco", "images", "train2017")
    mean, std = proxy_is_given_path(img_dir, out, batch_size=8, splits=3)
    n_scene = 30  # 6 instance cats x 5 count buckets
    assert 1.0 - 1e-5 <= mean <= n_scene
    assert std >= 0.0


def test_missing_weights_raises(tmp_path):
    from canonicalsg2im_tpu.evaluation.proxy import ProxyActivations

    with pytest.raises(FileNotFoundError):
        ProxyActivations(str(tmp_path / "nope.npz"))


def test_train_cli_logs_proxy_metrics(tiny_proxy, tmp_path):
    """--proxy_metrics wires proxy FID/IS into the val harness: metrics.jsonl
    val rows must carry proxy_fid (vs real-val stats) and proxy_is_mean."""
    import json

    from canonicalsg2im_tpu.config import Config
    from scripts.train import main

    _, weights, _ = tiny_proxy
    out = tmp_path / "run"
    cfg = Config(dataset="packed_clevr_syn", num_train_samples=16,
                 num_val_samples=8, batch_size=8, min_objects=3,
                 max_objects=5, image_size=(32, 32), ngf=16, ndf=16,
                 num_D=2, n_layers_D=2, gconv_num_layers=2,
                 gconv_hidden_dim=32, gconv_dim=16, embedding_dim=4,
                 crop_size=32, learned_converse=True,
                 compute_dtype="float32", num_iterations=2, print_every=1,
                 checkpoint_every=2, proxy_metrics=True,
                 proxy_weights=weights, output_dir=str(out))
    main(cfg)
    rows = [json.loads(ln) for ln in
            (out / "metrics.jsonl").read_text().splitlines()]
    val = [r for r in rows if r.get("tag") == "val/loss"]
    assert val, rows
    assert "proxy_fid" in val[-1], val[-1]
    assert val[-1]["proxy_fid"] >= 0.0
    assert val[-1]["proxy_is_mean"] >= 1.0 - 1e-5
