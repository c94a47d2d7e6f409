"""Fused eval-mode SPADE Pallas kernel vs the flax SPADE module.

Interpret-mode (CPU) equivalence of ops/pallas_spade.spade_fused_eval against
models/spade.SPADE applied with train=False (running statistics), across the
generator pyramid's block shapes. Reference chain being fused:
spade/models/networks/normalization.py:96-110.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonicalsg2im_tpu.models.spade import SPADE
from canonicalsg2im_tpu.ops.pallas_spade import (
    spade_fused_eval,
    spade_fused_supported,
)


def _setup(H, W, C, Ci, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32))
    seg = jnp.asarray(rng.randn(2, H, W, Ci).astype(np.float32))
    mod = SPADE("spadesyncbatch3x3", C)
    variables = mod.init(jax.random.PRNGKey(seed), x, seg, train=False)
    # non-trivial running statistics (init leaves mean=0, var=1)
    stats = variables["batch_stats"]["ParamFreeNorm_0"]["BatchNorm_0"]
    mean = jnp.asarray(rng.randn(C).astype(np.float32) * 0.3)
    var = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    stats = dict(stats, mean=mean, var=var)
    variables = {
        "params": variables["params"],
        "batch_stats": {"ParamFreeNorm_0": {"BatchNorm_0": stats}},
    }
    return mod, variables, x, seg


def _fused(variables, x, seg):
    p = variables["params"]
    st = variables["batch_stats"]["ParamFreeNorm_0"]["BatchNorm_0"]
    return spade_fused_eval(
        x, seg,
        p["mlp_shared"]["kernel"], p["mlp_shared"]["bias"],
        p["mlp_gamma"]["kernel"], p["mlp_gamma"]["bias"],
        p["mlp_beta"]["kernel"], p["mlp_beta"]["bias"],
        st["mean"], st["var"], interpret=True)


@pytest.mark.parametrize("H,W,C,Ci", [
    (8, 8, 1024, 128),    # pyramid head
    (16, 16, 512, 128),
    (32, 32, 256, 96),    # non-multiple-of-128 seg width
    (16, 16, 64, 32),     # thin-channel block (single chunk)
    (64, 64, 128, 128),   # largest supported plane
])
def test_fused_matches_flax_eval(H, W, C, Ci):
    assert spade_fused_supported(H, W, C, "syncbatch")
    mod, variables, x, seg = _setup(H, W, C, Ci)
    ref = mod.apply(variables, x, seg, train=False)
    out = _fused(variables, x, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_bf16_input_keeps_dtype():
    mod, variables, x, seg = _setup(16, 16, 128, 128)
    out = _fused(variables, x.astype(jnp.bfloat16), seg)
    assert out.dtype == jnp.bfloat16
    ref = mod.apply(variables, x, seg, train=False)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_supported_gate():
    assert not spade_fused_supported(128, 128, 128, "syncbatch")  # plane
    assert not spade_fused_supported(32, 32, 128, "instance")     # norm kind
    assert spade_fused_supported(64, 64, 64, "batch")
    # C divisible by 128 but NOT by the kernel's actual chunk (16x16 picks
    # cc=256): must be rejected, else channels past the chunk go unwritten
    assert not spade_fused_supported(16, 16, 384, "syncbatch")
    assert spade_fused_supported(16, 16, 512, "syncbatch")


def test_gate_consistent_with_kernel_chunk():
    """Every supported (H, W, C) must have C divisible by the chunk the
    kernel will use — the C=384@16x16 failure mode, swept broadly."""
    from canonicalsg2im_tpu.ops.pallas_spade import _channel_chunk

    for hw in (8, 16, 32, 64):
        for C in (64, 128, 256, 384, 512, 640, 768, 1024):
            if spade_fused_supported(hw, hw, C, "syncbatch"):
                assert C % _channel_chunk(C, hw, hw) == 0, (hw, C)


def test_generator_fused_eval_matches_standard():
    """SPADEGenerator eval forward with fused_spade_eval on vs off (flag
    threading through SPADEResnetBlock; interpret-mode kernel on CPU)."""
    from canonicalsg2im_tpu.models.spade import SPADEGenerator

    vocab = {"attributes": {"shape": {"__image__": 0, "cube": 1, "ball": 2},
                            "color": {"__image__": 0, "red": 1, "blue": 2},
                            "material": {"m0": 0, "m1": 1},
                            "size": {"s0": 0, "s1": 1}}}
    rng = np.random.RandomState(0)
    B, O = 2, 4
    objs = jnp.asarray(rng.randint(0, 2, size=(B, O, 4)), jnp.int32)
    objs = objs.at[:, :, 0].set(jnp.asarray([[1, 2, 1, 0], [2, 1, 0, 0]]))
    xy = rng.uniform(0, 0.6, (B, O, 2)); wh = rng.uniform(0.1, 0.4, (B, O, 2))
    boxes = jnp.asarray(np.concatenate([xy, wh], -1).astype(np.float32))

    def run(fused):
        gen = SPADEGenerator(vocab=vocab, embedding_dim=32, ngf=8,
                             image_size=(32, 32), fused_spade_eval=fused)
        variables = gen.init({"params": jax.random.PRNGKey(0),
                              "noise": jax.random.PRNGKey(1)},
                             objs, boxes, train=False)
        return gen.apply(variables, objs, boxes, train=False)

    ref = run(False)
    out = run(True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
