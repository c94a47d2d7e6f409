"""The trainer's K-step dispatch blocks (--steps_per_dispatch).

The CLI loop fetches the learned-converse weights to the host every step
(reference scripts/train.py:383-385), a device sync that dominates wall time
on a dispatch-latency-bound link. steps_per_dispatch=K runs K fused steps per
dispatch via the lax.scan entry points and syncs once per block. These tests
pin the host-side chunking logic (boundary clipping, shape-homogeneous
blocks, pushback) and run the full CLI loop end-to-end with K>1.
"""
import numpy as np

from scripts.train import _batch_sig, _block_size, _fetch_block, _stack_batches


class _Cfg:
    def __init__(self, num_iterations, print_every=10, checkpoint_every=10000,
                 full_test=0):
        self.num_iterations = num_iterations
        self.print_every = print_every
        self.checkpoint_every = checkpoint_every
        self.full_test = full_test


def test_block_size_clips_to_every_boundary():
    cfg = _Cfg(num_iterations=100, print_every=3, checkpoint_every=5)
    # t=0: print at 3 is the nearest boundary
    assert _block_size(0, cfg, K=10) == 3
    # t=3: checkpoint at 5 is nearer than print at 6
    assert _block_size(3, cfg, K=10) == 2
    # t=5: print at 6
    assert _block_size(5, cfg, K=10) == 1
    # K smaller than every gap just uses K
    assert _block_size(6, cfg, K=2) == 2


def test_block_size_clips_to_num_iterations():
    cfg = _Cfg(num_iterations=7, print_every=100, checkpoint_every=100)
    assert _block_size(5, cfg, K=10) == 2
    assert _block_size(6, cfg, K=10) == 1


def test_block_size_walks_every_boundary_exactly():
    cfg = _Cfg(num_iterations=23, print_every=4, checkpoint_every=6,
               full_test=9)
    t, hits = 0, []
    while t < cfg.num_iterations:
        k = _block_size(t, cfg, K=10)
        t += k
        for every in (4, 6, 9):
            if t % every == 0 and t not in hits:
                hits.append(t)
    # every multiple of every boundary in [1, 23] is landed on exactly
    expected = sorted({m for e in (4, 6, 9) for m in range(e, 24, e)})
    assert sorted(hits) == expected
    assert t == 23


def _mk(shape):
    # stand-in "batch": a tuple of arrays (+ a None leaf, like masks=None)
    return (np.zeros(shape), np.ones((shape[0],)), None)


def test_fetch_block_homogeneous_shapes_with_pushback():
    batches = [_mk((4, 8)), _mk((4, 8)), _mk((4, 16)), _mk((4, 16)),
               _mk((4, 8))]
    it = iter(batches)
    held = [None]
    b1 = _fetch_block(it, 4, held)
    assert len(b1) == 2 and _batch_sig(b1[0]) == _batch_sig(b1[1])
    assert held[0] is not None  # the (4,16) batch is parked
    b2 = _fetch_block(it, 4, held)
    assert len(b2) == 2
    assert b2[0][0].shape == (4, 16)
    b3 = _fetch_block(it, 4, held)
    assert len(b3) == 1 and b3[0][0].shape == (4, 8)
    assert _fetch_block(it, 4, held) == []  # exhausted, nothing held


def test_stack_batches_adds_leading_axis_and_keeps_none():
    blk = [_mk((4, 8)), _mk((4, 8)), _mk((4, 8))]
    stacked = _stack_batches(blk)
    assert stacked[0].shape == (3, 4, 8)
    assert stacked[1].shape == (3, 4)
    assert stacked[2] is None
    # single-batch block passes through unstacked (single-step path)
    assert _stack_batches(blk[:1])[0].shape == (4, 8)


def test_layout_cli_trains_with_multi_step_dispatch(tmp_path):
    """The full CLI loop with steps_per_dispatch=4: uneven blocks at print/
    checkpoint boundaries, converse feedback per block, checkpoints at the
    exact reference iterations."""
    import os

    from canonicalsg2im_tpu.config import Config
    from scripts.train import main

    cfg = Config(dataset="packed_clevr_syn", skip_generation=True,
                 compute_dtype="float32", num_train_samples=32,
                 num_val_samples=8, batch_size=8, min_objects=3,
                 max_objects=5, image_size=(32, 32), gconv_num_layers=2,
                 gconv_hidden_dim=32, gconv_dim=16, embedding_dim=8,
                 learned_converse=True, learned_transitivity=True,
                 steps_per_dispatch=4, num_iterations=10, print_every=3,
                 checkpoint_every=5, output_dir=str(tmp_path / "run"))
    state = main(cfg)
    # 10 optimizer steps happened (checkpoint counters say so)
    assert os.path.exists(tmp_path / "run" / "itr_5.ckpt")
    assert os.path.exists(tmp_path / "run" / "itr_10.ckpt")
    assert int(np.asarray(state.step)) == 10
