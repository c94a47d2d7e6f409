"""Evaluation stack tests: IS accumulation, FID math, legacy diversity."""
import numpy as np
import pytest

from canonicalsg2im_tpu.evaluation.fid import calculate_frechet_distance
from canonicalsg2im_tpu.evaluation.legacy_fid import (
    confusion_matrix,
    get_fid,
    kl,
    quant,
)


def test_frechet_distance_zero_for_identical():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 16))
    mu, sigma = x.mean(0), np.cov(x, rowvar=False)
    d = calculate_frechet_distance(mu, sigma, mu, sigma)
    assert abs(d) < 1e-6


def test_frechet_distance_mean_shift():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2000, 8))
    mu, sigma = x.mean(0), np.cov(x, rowvar=False)
    mu2 = mu + 3.0
    d = calculate_frechet_distance(mu, sigma, mu2, sigma)
    assert abs(d - 8 * 9.0) < 1.0  # ||diff||^2 = 8 * 3^2


def test_kl_and_quant():
    p = np.array([0.5, 0.5, 0.0])
    q = np.array([0.25, 0.25, 0.5])
    assert kl(p, q) > 0
    assert abs(kl(p, p)) < 1e-12

    rng = np.random.default_rng(2)
    dist = rng.dirichlet(np.ones(5), size=40)
    i_score, intra, inter, per_class = quant(dist, ["a", "b", "c", "d", "e"])
    assert i_score >= 1.0
    assert 0 <= intra <= np.log(5) + 1e-9
    assert per_class


def test_confusion_matrix_rows_sum_100():
    m = confusion_matrix(3, [0, 1, 2, 0], [0, 1, 2, 1])
    np.testing.assert_allclose(m.sum(axis=1), [100, 100, 100])


def test_get_fid_per_class():
    rng = np.random.default_rng(3)
    tr = rng.normal(size=(100, 4))
    te = tr + 2.0
    cats = np.repeat([0, 1], 50)
    d = get_fid(tr, te, cats, cats)
    assert abs(d - 4 * 4.0) < 1.5


def test_inception_score_random_net_runs():
    from canonicalsg2im_tpu.evaluation.inception import InceptionScore

    isc = InceptionScore(weights_dir="weights")
    assert isc.pretrained is False  # no converted weights in this image
    rng = np.random.default_rng(4)
    imgs = rng.uniform(-1, 1, size=(4, 75, 75, 3)).astype(np.float32)
    isc(imgs)
    isc(imgs)
    mean, std = isc.compute_score(splits=2)
    assert np.isfinite(mean) and mean >= 1.0 - 1e-6
    isc.clean()
    assert isc.compute_score() == (0.0, 0.0)


def test_inception_architecture_matches_torchvision_param_count():
    """23.83M params (torchvision inception_v3 minus aux head) and a 2048-d
    pool — guarantees converted weights drop in cleanly."""
    import jax
    import jax.numpy as jnp

    from canonicalsg2im_tpu.evaluation.inception import InceptionV3

    m = InceptionV3()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert abs(n - 23_834_568) < 60_000, n
    logits, pool = m.apply(v, jnp.zeros((1, 299, 299, 3)))
    assert logits.shape == (1, 1000) and pool.shape == (1, 2048)


def test_load_dir_batches_reads_images(tmp_path):
    """Regression: the FID CLI's directory loader must yield real file paths
    (it used to stringify os.DirEntry objects and crash on open)."""
    from PIL import Image

    from canonicalsg2im_tpu.evaluation.fid import _load_dir_batches

    for i in range(5):
        Image.new("RGB", (16, 16), (i * 40, 0, 0)).save(
            tmp_path / f"img_{i}.png")
    batches = list(_load_dir_batches(str(tmp_path), batch_size=2))
    # remainder images must not be dropped (was: 5 % 2 = 1 image silently
    # excluded; a dir smaller than batch_size yielded nothing at all)
    assert [b.shape[0] for b in batches] == [2, 2, 1]
    assert batches[0].shape == (2, 16, 16, 3)
    assert batches[0].min() >= -1.0 and batches[0].max() <= 1.0
    small = list(_load_dir_batches(str(tmp_path), batch_size=50))
    assert [b.shape[0] for b in small] == [5]


def test_fallback_activations_not_collapsed():
    """Without pretrained weights, per-batch BN (train_bn) must keep the
    pool3 features alive — with init running-stats they collapse to ~1e-6
    std, pinning every FID near 0 and IS at 1.0 (the round-1 failure mode)."""
    from canonicalsg2im_tpu.evaluation.fid import FidActivations

    fa = FidActivations(weights_dir="weights")
    if fa.pretrained:
        pytest.skip("real Inception weights present; fallback path unused")
    rng = np.random.default_rng(7)
    imgs = rng.uniform(-1, 1, size=(8, 75, 75, 3)).astype(np.float32)
    fa(imgs)
    acts = np.concatenate(fa.acts, axis=0)
    assert acts.shape == (8, 2048)
    # per-image variation across the feature dim must be macroscopic
    assert float(acts.std()) > 1e-2, float(acts.std())


def test_fallback_inception_score_responds_to_diversity():
    """Fallback IS (z-scored logits) must rank a diverse set above a
    near-constant set — random-weight softmax alone pins both at 1.0."""
    from canonicalsg2im_tpu.evaluation.inception import InceptionScore

    rng = np.random.default_rng(5)
    diverse = rng.uniform(-1, 1, size=(16, 75, 75, 3)).astype(np.float32)
    constant = np.tile(diverse[:1], (16, 1, 1, 1)) \
        + rng.normal(0, 1e-3, (16, 75, 75, 3)).astype(np.float32)

    is_div = InceptionScore(weights_dir="weights")
    if is_div.pretrained:
        pytest.skip("real Inception weights present; fallback path unused")
    is_div(diverse)
    is_con = InceptionScore(weights_dir="weights")
    is_con(constant)
    m_div, _ = is_div.compute_score()
    m_con, _ = is_con.compute_score()
    assert m_div > m_con, (m_div, m_con)
