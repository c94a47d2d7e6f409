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


# ---------------------------------------------------------------------------
# Writer tests (round 4): TBEventWriter must produce files that (1) our own
# reader parses, and (2) TensorBoard's real CRC-verifying EventAccumulator
# loads — so a reference user's TB tooling plots a fresh run of THIS
# framework (reference writes via tensorboardX, scripts/train.py:292,364).
# ---------------------------------------------------------------------------


def test_writer_roundtrip_own_reader(tmp_path):
    from canonicalsg2im_tpu.utils.tb_events import TBEventWriter

    run_dir = str(tmp_path)
    w = TBEventWriter(run_dir)
    for step, tag, value in RECORDS:
        w.add_scalar(tag, value, step)
    w.close()
    got = read_scalars(run_dir, "val/loss/avg_iou")
    assert [s for s, _ in got] == [100, 200, 300, 400]
    step, value = best_step_from_events(run_dir)
    assert step == 200 and abs(value - 0.35) < 1e-6


def test_writer_crc32c_known_vector():
    from canonicalsg2im_tpu.utils.tb_events import _crc32c, _masked_crc

    # RFC 3720 CRC-32C check value
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    # mask formula: rot15 + magic (TFRecord spec)
    crc = _crc32c(b"abc")
    assert _masked_crc(b"abc") == ((((crc >> 15) | (crc << 17))
                                    + 0xA282EAD8) & 0xFFFFFFFF)


def test_writer_read_by_real_tensorboard(tmp_path):
    """The CRC-verifying reader TensorBoard actually uses must accept our
    framing, file-version record, scalars, and PNG image summaries."""
    ea = pytest.importorskip("tensorboard.backend.event_processing"
                             ".event_accumulator")
    np = pytest.importorskip("numpy")
    from canonicalsg2im_tpu.utils.tb_events import TBEventWriter

    run_dir = str(tmp_path)
    w = TBEventWriter(run_dir)
    w.add_scalars("val/loss", {"avg_iou": 0.25, "total_loss": 1.5}, 100)
    w.add_scalars("val/loss", {"avg_iou": 0.35}, 200)
    w.add_image("val/grid", (np.arange(8 * 8 * 3, dtype=np.uint8)
                             .reshape(8, 8, 3)), 200)
    w.close()

    acc = ea.EventAccumulator(run_dir)
    acc.Reload()
    assert sorted(acc.Tags()["scalars"]) == ["val/loss/avg_iou",
                                             "val/loss/total_loss"]
    scalars = [(e.step, e.value) for e in acc.Scalars("val/loss/avg_iou")]
    assert scalars[0][0] == 100 and abs(scalars[0][1] - 0.25) < 1e-6
    assert scalars[1][0] == 200 and abs(scalars[1][1] - 0.35) < 1e-6
    img = acc.Images("val/grid")[0]
    assert (img.width, img.height) == (8, 8)
    assert img.encoded_image_string[:8] == b"\x89PNG\r\n\x1a\n"


def test_metric_logger_mirrors_to_tb(tmp_path):
    from canonicalsg2im_tpu.utils import MetricLogger

    run_dir = str(tmp_path)
    logger = MetricLogger(run_dir, every=1)
    logger.log("val/loss", {"avg_iou": 0.4}, 500, force=True)
    logger.close()
    step, value = best_step_from_events(run_dir)
    assert step == 500 and abs(value - 0.4) < 1e-6
