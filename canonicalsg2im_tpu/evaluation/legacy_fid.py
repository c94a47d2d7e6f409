"""Legacy per-class FID / diversity metrics (reference `evaluation/fid.py`,
used in older experiments: `kl`, `quant` inception-style diversity scores,
`confusion_matrix`, and the per-class mean-distance `get_fid`)."""
from __future__ import annotations

import numpy as np


def kl(p, q):
    """Discrete KL(P || Q) over the support of q (fid.py:10-22)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    mask = q != 0
    p, q = p[mask], q[mask]
    return float(np.sum(np.where(p != 0, p * np.log(p / q), 0.0)))


def quant(pred_dist, action_set):
    """Diversity statistics over predicted class distributions (fid.py:25-55):
    inception-style I-score, mean intra-entropy, inter-entropy, and per-class
    intra-entropies."""
    pred_dist = np.asarray(pred_dist, dtype=np.float64)
    overall = pred_dist.mean(axis=0)
    predicted = pred_dist.argmax(axis=1)

    def entropy(p):
        p = p / p.sum()
        nz = p > 0
        return float(-(p[nz] * np.log(p[nz])).sum())

    klds, intra, per_class = [], [], {}
    for i in range(len(pred_dist)):
        e = entropy(pred_dist[i])
        klds.append(kl(pred_dist[i], overall))
        intra.append(e)
        cls = action_set[predicted[i] % len(action_set)]
        per_class.setdefault(cls, []).append(e)
    per_class = {k: float(np.mean(v)) for k, v in per_class.items()}
    return (float(np.exp(np.mean(klds))), float(np.mean(intra)),
            entropy(overall), per_class)


def confusion_matrix(num_classes, pred_cat, gt_cat):
    """Row-normalized (%) confusion matrix (fid.py:58-66)."""
    m = np.zeros((num_classes, num_classes))
    for p, g in zip(np.asarray(pred_cat), np.asarray(gt_cat)):
        m[g, p] += 1
    totals = m.sum(axis=1, keepdims=True)
    return np.where(totals > 0, m / totals * 100.0, 0.0)


def get_mean_covar(samples):
    samples = np.asarray(samples, dtype=np.float64)
    mean = samples.mean(axis=0)
    white = samples - mean
    return mean, white.T @ white / samples.shape[0]


def get_fid(train_feature, test_feature, train_cat, test_cat):
    """Per-class mean-feature distance averaged over classes (fid.py:79-93;
    the reference comments out the covariance trace term — reproduced)."""
    train_cat = np.asarray(train_cat)
    test_cat = np.asarray(test_cat)
    distances = []
    for cls in np.unique(test_cat):
        tr = np.asarray(train_feature)[train_cat == cls]
        te = np.asarray(test_feature)[test_cat == cls]
        if len(tr) == 0 or len(te) == 0:
            continue
        mu_tr, _ = get_mean_covar(tr)
        mu_te, _ = get_mean_covar(te)
        distances.append(float(np.linalg.norm(mu_te - mu_tr) ** 2))
    return float(np.mean(distances)) if distances else 0.0
