"""CPU smoke tests for the remaining CLI entry points (VERDICT r4 task 5).

Each reference entry point (reference scripts/: layout_generation.py,
generation_dataframe.py, generation_attspade.py, generate_clevr.py) plus the
run summarizer gets a tiny-config end-to-end run on the virtual-CPU mesh, so
a loader/config regression in any of them fails the suite instead of only
surfacing in manual TPU runs. Pattern follows tests/test_run_model.py /
tests/test_converse_table.py: drive the script's main() with a real tiny
checkpoint + run_args.json on packed_clevr_syn.

InceptionScore is stubbed: the real InceptionV3 forward is covered by
tests/test_evaluation.py, and extra InceptionV3 CPU compiles late in the
suite are the known LLVM-segfault trigger (tests/conftest.py).
"""
import argparse
import json
import os

import jax
import numpy as np
import pytest

from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.data import get_dataset
from canonicalsg2im_tpu.train import create_layout_state
from canonicalsg2im_tpu.train.gan import create_gan_states
from canonicalsg2im_tpu.utils import save_checkpoint


class _StubInception:
    """Counts batches; returns a fixed (mean, std). Same call surface as
    evaluation.inception.InceptionScore."""

    def __init__(self, *a, **kw):
        self.pretrained = False
        self.batches = 0

    def __call__(self, imgs):
        assert np.asarray(imgs).ndim == 4
        self.batches += 1

    def compute_score(self, splits=5):
        return 1.0, 0.0


def _layout_run_dir(tmp_path):
    """Tiny trained-shape layout run dir: itr_5.ckpt + run_args.json."""
    cfg = Config(dataset="packed_clevr_syn", num_train_samples=8,
                 num_val_samples=8, batch_size=2, min_objects=3,
                 max_objects=5, image_size=(32, 32), gconv_num_layers=2,
                 gconv_hidden_dim=32, gconv_dim=16, embedding_dim=4,
                 learned_converse=True, skip_generation=True,
                 output_dir=str(tmp_path))
    ds = get_dataset(cfg.dataset, "train", cfg)
    cfg.vocab = ds.vocab
    cfg.finalize()
    state = create_layout_state(cfg, jax.random.PRNGKey(0))
    ckpt = os.path.join(str(tmp_path), "itr_5.ckpt")
    save_checkpoint(ckpt, state, vocab=cfg.vocab,
                    counters={"t": 5, "epoch": 0})
    cfg.save(os.path.join(str(tmp_path), "run_args.json"))
    return ckpt, cfg


def _gan_run_dir(tmp_path):
    """Tiny trained-shape GAN run dir (32x32 AttSPADE)."""
    cfg = Config(dataset="packed_clevr_syn", num_train_samples=8,
                 num_val_samples=8, batch_size=2, min_objects=3,
                 max_objects=5, image_size=(32, 32), ngf=16, ndf=16,
                 num_D=2, n_layers_D=2, gconv_num_layers=2,
                 gconv_hidden_dim=32, gconv_dim=16, embedding_dim=4,
                 crop_size=32, learned_converse=True,
                 output_dir=str(tmp_path))
    ds = get_dataset(cfg.dataset, "train", cfg)
    cfg.vocab = ds.vocab
    cfg.finalize()
    states = create_gan_states(cfg, jax.random.PRNGKey(0))
    ckpt = os.path.join(str(tmp_path), "itr_3.ckpt")
    save_checkpoint(ckpt, states, vocab=cfg.vocab,
                    counters={"t": 3, "epoch": 0})
    cfg.save(os.path.join(str(tmp_path), "run_args.json"))
    return ckpt, cfg


def test_layout_generation_writes_reference_csv(tmp_path, capsys):
    from scripts import layout_generation

    ckpt, cfg = _layout_run_dir(tmp_path)
    layout_generation.main(argparse.Namespace(
        checkpoint=ckpt, dataset=None, partition="val",
        output_dir=str(tmp_path), max_samples=4))
    out = capsys.readouterr().out
    assert "avg_iou:" in out and "total_iou_05:" in out

    csv_path = tmp_path / "results_packed_clevr_syn.csv"
    assert csv_path.exists()
    import csv as _csv

    with open(csv_path) as f:
        rows = list(_csv.DictReader(f))
    assert rows, "no result rows written"
    # the reference schema generation_dataframe consumes
    # (reference layout_generation.py:59-61)
    for col in ("image_id", "avg_iou", "iou03", "iou05", "predicted_boxes",
                "gt_boxes", "number_of_objects", "class"):
        assert col in rows[0], col
    import ast

    boxes = ast.literal_eval(rows[0]["predicted_boxes"])
    assert len(boxes) == int(rows[0]["number_of_objects"])
    assert all(len(b) == 4 for b in boxes)


def test_layout_generation_best_checkpoint_from_metrics(tmp_path):
    """Directory argument -> best-val-IoU checkpoint via metrics.jsonl
    (reference layout_generation.py:76-85 semantics)."""
    from scripts.layout_generation import best_checkpoint

    ckpt, _ = _layout_run_dir(tmp_path)  # writes itr_5.ckpt
    with open(tmp_path / "metrics.jsonl", "w") as f:
        for step, iou in ((5, 0.4), (10, 0.3)):
            f.write(json.dumps({"tag": "val/loss", "step": step,
                                "avg_iou": iou}) + "\n")
    assert best_checkpoint(str(tmp_path)) == str(tmp_path / "itr_5.ckpt")


def test_generation_dataframe_renders_from_csv(tmp_path, monkeypatch, capsys):
    from scripts import generation_dataframe, layout_generation

    # stage 1: the layout CLI produces the CSV the dataframe CLI consumes
    lckpt, _ = _layout_run_dir(tmp_path / "layout")
    layout_generation.main(argparse.Namespace(
        checkpoint=lckpt, dataset=None, partition="val",
        output_dir=str(tmp_path / "layout"), max_samples=4))
    csv_path = tmp_path / "layout" / "results_packed_clevr_syn.csv"

    gckpt, _ = _gan_run_dir(tmp_path / "gan")
    monkeypatch.setattr("canonicalsg2im_tpu.evaluation.inception."
                        "InceptionScore", _StubInception)
    generation_dataframe.main(argparse.Namespace(
        checkpoint=gckpt, csv=str(csv_path), use_gt_boxes=1,
        output_dir=str(tmp_path / "gan"), max_samples=2))
    out = capsys.readouterr().out
    assert "Inception mean:" in out

    gen_dir = tmp_path / "gan" / "generation"
    jpgs = list(gen_dir.glob("*.jpg"))
    assert len(jpgs) >= 2, "no generated JPEGs dumped"


def test_generation_attspade_both_layout_paths(tmp_path, monkeypatch, capsys):
    from scripts import generation_attspade

    ckpt, _ = _gan_run_dir(tmp_path)
    monkeypatch.setattr("scripts.generation_attspade.InceptionScore",
                        _StubInception)
    generation_attspade.main(argparse.Namespace(
        checkpoint=ckpt, dataset=None, partition="val",
        output_dir=str(tmp_path / "gen"), max_samples=2))
    out = capsys.readouterr().out
    # the reference's separate GT-layout / pred-layout scores
    # (reference generation_attspade.py:127-136)
    assert "GT-layout Inception mean:" in out
    assert "pred-layout Inception mean:" in out
    assert (tmp_path / "gen" / "gt_layout").glob("*.jpg")
    gt = list((tmp_path / "gen" / "gt_layout").glob("*.jpg"))
    pred = list((tmp_path / "gen" / "pred_layout").glob("*.jpg"))
    assert len(gt) >= 2 and len(pred) >= 2


def test_generate_clevr_large_graph_iou(tmp_path, capsys):
    from scripts import generate_clevr

    ckpt, _ = _layout_run_dir(tmp_path)
    results = generate_clevr.main(argparse.Namespace(
        checkpoint=ckpt, baseline_checkpoint=ckpt,
        generation_checkpoint=None, num_scenes=4, min_objects=4,
        max_objects=6, batch_size=2, seed=0, weights_dir="weights"))
    out = capsys.readouterr().out
    assert "[learned]" in out and "[not_learned]" in out
    assert set(results) == {"learned", "not_learned"}
    for v in results.values():
        assert np.isfinite(v) and 0.0 <= v <= 1.0


def test_summarize_run_resume_lineage(tmp_path, capsys, monkeypatch):
    """Two-pass metrics.jsonl (a resume): rows prefer the surviving lineage
    and rates are computed within a pass."""
    from scripts import summarize_run

    rec = lambda step, wall, loss: {  # noqa: E731
        "tag": "train/loss", "step": step, "wall": wall,
        "total_loss": loss, "bbox_pred": loss, "D_img_real": 0.5,
        "D_img_fake": 0.5, "GAN_Img": 1.0, "GAN_Feat": 1.0, "VGG": 1.0,
        "loss_conv": 0.1}
    run = tmp_path / "run"
    run.mkdir()
    with open(run / "metrics.jsonl", "w") as f:
        # pass 1: steps 100..500; pass 2 resumes from itr_300 (wall resets)
        for s in range(100, 501, 100):
            f.write(json.dumps(rec(s, 1000.0 + s, 2.0)) + "\n")
        for s in range(400, 801, 100):
            f.write(json.dumps(rec(s, 50.0 + s, 1.0)) + "\n")
        f.write(json.dumps({"tag": "val/loss", "step": 800, "wall": 900.0,
                            "avg_iou": 0.42}) + "\n")
    monkeypatch.setattr("sys.argv",
                        ["summarize_run", str(run), "--stride", "100"])
    summarize_run.main()
    out = capsys.readouterr().out
    assert "2 passes" in out
    assert "avg_iou" in out and "0.42" in out
    # overlapping steps 400/500 come from the surviving pass 2 (loss 1.0)
    row_400 = [ln for ln in out.splitlines() if ln.startswith("400 | ")][0]
    assert "1.000" in row_400 and "2.000" not in row_400
