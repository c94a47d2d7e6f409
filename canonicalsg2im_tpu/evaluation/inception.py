"""InceptionV3 in flax + Inception Score (reference `evaluation/inception.py`).

The reference uses torchvision's pretrained inception_v3 (a downloaded native
dependency, SURVEY.md §2.10). Weights are loaded from
``<weights_dir>/inception_v3.npz`` (produced by scripts/convert_weights.py
from the torchvision .pth); without them a fixed-seed random init is used —
IS/FID numbers are then only self-consistent, not comparable to the
literature. Matches torchvision's layout (BasicConv2d = conv + BN(eps=1e-3) +
relu, blocks 5b..7c, 2048-d pool, 1000-way fc) with transform_input=False, as
the reference constructs it (inception.py:16).
"""
from __future__ import annotations

import functools
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    out: int
    kernel: tuple
    stride: tuple = (1, 1)
    padding: tuple | str = ((0, 0), (0, 0))
    # True -> normalize by the current batch's statistics instead of the
    # (loaded) running stats. Only used by the no-pretrained-weights fallback:
    # with random weights the identity running stats let the signal collapse
    # (~1e-6 activation std at pool3), making every FID ~0 and IS ~1.
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out, self.kernel, strides=self.stride,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not self.train_bn, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _conv(train_bn):
    """BasicConv2d constructor with the block's train_bn baked in."""
    return functools.partial(BasicConv2d, train_bn=train_bn)


def _pad(k):
    if isinstance(k, int):
        return ((k, k), (k, k))
    return ((k[0], k[0]), (k[1], k[1]))


def _pool_3x3_pad1(x, mode: str):
    """The 3x3 stride-1 pad-1 branch pool, in its three variants:

    - 'avg': torch avg_pool2d(count_include_pad=True) — torchvision arch;
    - 'avg_excl': count_include_pad=False — the TF semantics the FID blocks
      patch in (reference evaluation/fid/inception.py:185-188 etc.);
    - 'max': FIDInceptionE_2's max-pool branch swap (inception.py:298-302).
    """
    if mode == "max":
        return nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=(mode == "avg"))


class InceptionA(nn.Module):
    pool_features: int
    pool_mode: str = "avg"
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        BasicConv2d = _conv(self.train_bn)
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = _pool_3x3_pad1(x, self.pool_mode)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        BasicConv2d = _conv(self.train_bn)
        b3 = BasicConv2d(384, (3, 3), stride=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    pool_mode: str = "avg"
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        BasicConv2d = _conv(self.train_bn)
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_5")(bd)
        bp = _pool_3x3_pad1(x, self.pool_mode)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        BasicConv2d = _conv(self.train_bn)
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        BasicConv2d = _conv(self.train_bn)
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(1),
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _pool_3x3_pad1(x, self.pool_mode)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """torchvision inception_v3 body. Returns (logits, pool (N, 2048));
    images NHWC in [-1, 1] are resized to 299 by callers.

    ``variant='fid'`` reproduces the exact FID-Inception architecture the
    reference's FID weights require (evaluation/fid/inception.py:168-310):
    the A/C blocks and Mixed_7b use TF avg-pool semantics
    (count_include_pad=False), Mixed_7c swaps its pool branch to max-pool,
    and the classifier head is 1008-way (the TF-ported weights)."""

    variant: str = "torchvision"  # 'torchvision' | 'fid'
    # Per-batch BN statistics — the no-pretrained-weights fallback (see
    # BasicConv2d.train_bn). Callers must then apply with
    # mutable=["batch_stats"] and discard the mutated stats.
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        fid = self.variant == "fid"
        ac_pool = "avg_excl" if fid else "avg"
        tb = self.train_bn
        BasicConv2d = _conv(tb)
        x = BasicConv2d(32, (3, 3), stride=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, ac_pool, tb, name="Mixed_5b")(x)
        x = InceptionA(64, ac_pool, tb, name="Mixed_5c")(x)
        x = InceptionA(64, ac_pool, tb, name="Mixed_5d")(x)
        x = InceptionB(tb, name="Mixed_6a")(x)
        x = InceptionC(128, ac_pool, tb, name="Mixed_6b")(x)
        x = InceptionC(160, ac_pool, tb, name="Mixed_6c")(x)
        x = InceptionC(160, ac_pool, tb, name="Mixed_6d")(x)
        x = InceptionC(192, ac_pool, tb, name="Mixed_6e")(x)
        x = InceptionD(tb, name="Mixed_7a")(x)
        x = InceptionE(ac_pool, tb, name="Mixed_7b")(x)
        x = InceptionE("max" if fid else "avg", tb, name="Mixed_7c")(x)
        pool = x.mean(axis=(1, 2))  # adaptive avg pool to 1x1
        logits = nn.Dense(1008 if fid else 1000, name="fc")(pool)
        return logits, pool


def load_inception_variables(weights_dir: str,
                             name: str = "inception_v3.npz",
                             rng_seed: int = 7,
                             variant: str = "torchvision"):
    """Returns ({'params', 'batch_stats'}, pretrained: bool)."""
    model = InceptionV3(variant=variant)
    variables = model.init(jax.random.PRNGKey(rng_seed),
                           jnp.zeros((1, 299, 299, 3)))
    path = os.path.join(weights_dir, name)
    if not os.path.exists(path):
        return variables, False
    data = np.load(path)

    import flax

    flat_p = flax.traverse_util.flatten_dict(variables["params"])
    flat_s = flax.traverse_util.flatten_dict(variables["batch_stats"])

    def torch_name(path_tuple, leaf):
        mods = [p for p in path_tuple[:-1]]
        base = ".".join(mods)
        inner = path_tuple[-1]
        if inner == "kernel" and path_tuple[-2] == "conv":
            return base + ".weight"
        if path_tuple[-2] == "bn":
            table = {"scale": "weight", "bias": "bias",
                     "mean": "running_mean", "var": "running_var"}
            return base + "." + table[inner]
        if path_tuple[-2] == "fc":
            return "fc." + {"kernel": "weight", "bias": "bias"}[inner]
        return None

    for flat, kind in ((flat_p, "params"), (flat_s, "stats")):
        for key in list(flat):
            tn = torch_name(key, flat[key])
            if tn is None or tn not in data:
                continue
            arr = jnp.asarray(data[tn])
            if arr.shape != flat[key].shape:
                raise ValueError(f"shape mismatch for {tn}: "
                                 f"{arr.shape} vs {flat[key].shape}")
            flat[key] = arr
    params = flax.traverse_util.unflatten_dict(flat_p)
    stats = flax.traverse_util.unflatten_dict(flat_s)
    return {"params": params, "batch_stats": stats}, True


def resize_bilinear(x, size):
    """F.interpolate(mode='bilinear', align_corners=False) equivalent."""
    return jax.image.resize(x, (x.shape[0], size, size, x.shape[3]),
                            method="bilinear")


class InceptionScore:
    """Accumulating IS evaluator (evaluation/inception.py:8-49).

    Call with [-1, 1] NHWC batches; compute_score(splits) -> (mean, std).
    """

    def __init__(self, weights_dir: str = "weights", resize: bool = True):
        self.variables, self.pretrained = load_inception_variables(weights_dir)
        self.resize = resize
        # Without pretrained weights, per-batch BN statistics keep the random
        # features informative (running stats are the init identity and the
        # signal collapses by pool3) — numbers stay relative-only either way.
        self.model = InceptionV3(train_bn=not self.pretrained)
        self._predict = jax.jit(self._predict_impl)
        self._fb_temp = None
        self.clean()

    def _predict_impl(self, variables, imgs):
        x = resize_bilinear(imgs, 299) if self.resize else imgs
        if self.model.train_bn:
            (logits, _), _ = self.model.apply(variables, x,
                                              mutable=["batch_stats"])
        else:
            logits, _ = self.model.apply(variables, x)
        return logits

    def clean(self):
        self.logits = np.zeros((0, 1000))

    def __call__(self, imgs):
        p = np.asarray(self._predict(self.variables, imgs))
        self.logits = np.append(self.logits, p, axis=0)

    def _fallback_temperature(self):
        """Fixed softmax temperature for the random-weight fallback,
        calibrated once on a seeded noise batch. Raw random-net logits vary
        by only ~0.1 across classes, so plain softmax is near-uniform and IS
        pins at 1.0 for any input. Scaling by the evaluated set's own std
        would erase the *magnitude* of diversity (a near-constant set would
        score like a diverse one), so the scale must come from a fixed
        reference instead: maximally-diverse noise inputs."""
        if self._fb_temp is None:
            rng = np.random.default_rng(0)
            ref = rng.uniform(-1, 1, (8, 299, 299, 3)).astype(np.float32)
            lg = np.asarray(self._predict(self.variables, ref))
            # mean per-class std across the reference set ≙ "fully diverse"
            self._fb_temp = float(lg.std(axis=0).mean()) + 1e-8
        return self._fb_temp

    def _softmax_preds(self):
        logits = self.logits
        if not self.pretrained and logits.shape[0] > 1:
            # Center per class across the evaluated set (removes the
            # weight-dependent bias; keeps per-image variation), then apply
            # the fixed reference temperature with a gain that lets a
            # fully-diverse set produce peaked, image-dependent softmaxes.
            logits = logits - logits.mean(axis=0, keepdims=True)
            logits = logits * (8.0 / self._fallback_temperature())
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)

    def compute_score(self, splits: int = 1):
        preds = self._softmax_preds()
        N = preds.shape[0]
        if N == 0:
            return 0.0, 0.0
        scores = []
        for k in range(splits):
            part = preds[k * (N // splits): (k + 1) * (N // splits)]
            if part.shape[0] == 0:
                continue
            py = part.mean(axis=0)
            kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12)[None])
            scores.append(np.exp(kl.sum(axis=1).mean()))
        if not scores:  # fewer images than splits
            py = preds.mean(axis=0)
            kl = preds * (np.log(preds + 1e-12) - np.log(py + 1e-12)[None])
            return float(np.exp(kl.sum(axis=1).mean())), 0.0
        return float(np.mean(scores)), float(np.std(scores))
