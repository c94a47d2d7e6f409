"""TensorBoard event-file interop (utils/tb_events.py): the reference picks
its best checkpoint by argmax over scalar 'val/loss/avg_iou' in a run dir's
event files (layout_generation.py:76-85); our dependency-free reader must
parse files written by the real writers bit-for-bit."""
import os
import struct

import pytest

from canonicalsg2im_tpu.utils.tb_events import (
    best_step_from_events,
    read_scalars,
    scalar_tags,
)


def _write_with_real_writer(run_dir, records):
    """Prefer tensorboardX (what the reference uses, scripts/train.py:292);
    fall back to torch's SummaryWriter (same wire format)."""
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        from torch.utils.tensorboard import SummaryWriter
    w = SummaryWriter(run_dir)
    for step, tag, value in records:
        w.add_scalar(tag, value, step)
    w.close()


RECORDS = [
    (100, "val/loss/avg_iou", 0.21),
    (100, "val/loss/total_iou_03", 0.40),
    (200, "val/loss/avg_iou", 0.35),
    (300, "val/loss/avg_iou", 0.30),
    (400, "val/loss/avg_iou", 0.35),  # tie: argmax keeps the FIRST max
]


def test_reads_real_writer_output(tmp_path):
    run_dir = str(tmp_path)
    _write_with_real_writer(run_dir, RECORDS)
    got = read_scalars(run_dir, "val/loss/avg_iou")
    assert [s for s, _ in got] == [100, 200, 300, 400]
    for (_, v), (_, _, want) in zip(
            got, [r for r in RECORDS if r[1] == "val/loss/avg_iou"]):
        assert abs(v - want) < 1e-6
    assert scalar_tags(run_dir)["val/loss/total_iou_03"] == 1

    step, value = best_step_from_events(run_dir)
    assert step == 200 and abs(value - 0.35) < 1e-6


def _varint(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _event_bytes(step, tag, value):
    tag_b = tag.encode()
    val_msg = (b"\x0a" + _varint(len(tag_b)) + tag_b  # field 1: tag
               + b"\x15" + struct.pack("<f", value))  # field 2: simple_value
    summary = b"\x0a" + _varint(len(val_msg)) + val_msg  # Summary.value
    event = (b"\x09" + struct.pack("<d", 0.0)        # field 1: wall_time
             + b"\x10" + _varint(step)               # field 2: step
             + b"\x2a" + _varint(len(summary)) + summary)  # field 5: summary
    return (struct.pack("<Q", len(event)) + b"\x00" * 4  # framing (crc unread)
            + event + b"\x00" * 4)


def test_reads_hand_encoded_records(tmp_path):
    """Byte-level spec pin, independent of any installed writer."""
    path = os.path.join(tmp_path, "events.out.tfevents.123.host")
    with open(path, "wb") as f:
        for step, tag, value in RECORDS:
            f.write(_event_bytes(step, tag, value))
        f.write(b"\x01\x02")  # trailing truncation must end cleanly
    step, value = best_step_from_events(str(tmp_path))
    assert step == 200 and abs(value - 0.35) < 1e-6


def test_missing_tag_raises(tmp_path):
    path = os.path.join(tmp_path, "events.out.tfevents.1.h")
    with open(path, "wb") as f:
        f.write(_event_bytes(1, "train/loss", 1.0))
    with pytest.raises(FileNotFoundError):
        best_step_from_events(str(tmp_path))


def test_best_checkpoint_falls_back_to_tb_events(tmp_path, capsys):
    """scripts.layout_generation.best_checkpoint on a reference-style run dir
    (TB events, .pt checkpoints): picks the argmax step and points at the
    conversion path for the torch checkpoint."""
    from scripts.layout_generation import best_checkpoint

    run_dir = str(tmp_path)
    _write_with_real_writer(run_dir, RECORDS)
    open(os.path.join(run_dir, "itr_200.pt"), "wb").close()
    with pytest.raises(SystemExit, match="convert_reference_checkpoint"):
        best_checkpoint(run_dir)

    # with a converted checkpoint present, selection succeeds
    open(os.path.join(run_dir, "itr_200.ckpt"), "wb").close()
    assert best_checkpoint(run_dir).endswith("itr_200.ckpt")
