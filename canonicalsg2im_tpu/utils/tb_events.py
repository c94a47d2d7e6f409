"""Minimal TensorBoard event-file reader (no TensorFlow dependency).

The reference selects its best checkpoint by argmax over the scalar tag
``val/loss/avg_iou`` in a run directory's TensorBoard event files
(`scripts/layout_generation.py:76-85`, via tensorboardX's EventAccumulator).
A reference user pointing this framework at an existing run directory needs
those event files readable — this module parses exactly what the reference
writes (tensorboardX ``add_scalar`` → ``Summary.Value.simple_value``) from
the TFRecord-framed protobuf stream, in ~100 lines of stdlib Python.

Format notes (stable since TF1):
- TFRecord framing: u64-LE length, u32 masked-CRC(length), payload,
  u32 masked-CRC(payload). CRCs are not verified here (tensorboardX always
  writes them; corruption ends iteration at the framing check instead).
- ``Event`` proto: field 1 ``wall_time`` (double), field 2 ``step``
  (varint int64), field 5 ``summary`` (message).
- ``Summary`` proto: repeated field 1 ``value`` (message).
- ``Summary.Value``: field 1 ``tag`` (string), field 2 ``simple_value``
  (float). Tensor-encoded scalars (TB2's default) are not needed for
  reference interop and are skipped.
"""
from __future__ import annotations

import os
import struct
from typing import Dict, Iterator, List, Tuple


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, bytes | int]]:
    """Yield (field_number, wire_type, raw value) over one message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 0x7
        if wire == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wire == 1:  # fixed64
            val = buf[i:i + 8]
            i += 8
        elif wire == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wire == 5:  # fixed32
            val = buf[i:i + 4]
            i += 4
        else:  # groups (3/4) never appear in Event protos
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _iter_records(path: str) -> Iterator[bytes]:
    """TFRecord payloads from one event file; stops at truncation."""
    with open(path, "rb") as f:
        while True:
            header = f.read(12)  # u64 length + u32 masked crc
            if len(header) < 12:
                return
            (length,) = struct.unpack("<Q", header[:8])
            payload = f.read(length)
            if len(payload) < length or len(f.read(4)) < 4:  # + data crc
                return
            yield payload


def iter_scalars(path: str) -> Iterator[Tuple[int, str, float]]:
    """Yield (step, tag, simple_value) from one event file."""
    for record in _iter_records(path):
        step = 0
        summaries: List[bytes] = []
        for field, wire, val in _iter_fields(record):
            if field == 2 and wire == 0:
                step = val
            elif field == 5 and wire == 2:
                summaries.append(val)
        for summary in summaries:
            for field, wire, val in _iter_fields(summary):
                if field != 1 or wire != 2:
                    continue
                tag, simple = None, None
                for f2, w2, v2 in _iter_fields(val):
                    if f2 == 1 and w2 == 2:
                        tag = v2.decode("utf-8", "replace")
                    elif f2 == 2 and w2 == 5:
                        (simple,) = struct.unpack("<f", v2)
                if tag is not None and simple is not None:
                    yield step, tag, simple


def read_scalars(run_dir: str, tag: str) -> List[Tuple[int, float]]:
    """All (step, value) pairs for ``tag`` across a run directory's event
    files, in file-then-record order (EventAccumulator semantics)."""
    out: List[Tuple[int, float]] = []
    for name in sorted(os.listdir(run_dir)):
        if not name.startswith("events.out.tfevents"):
            continue
        for step, t, value in iter_scalars(os.path.join(run_dir, name)):
            if t == tag:
                out.append((step, value))
    return out


def best_step_from_events(run_dir: str,
                          tag: str = "val/loss/avg_iou") -> Tuple[int, float]:
    """argmax step for ``tag`` — the reference's best-checkpoint rule
    (layout_generation.py:82-85: np.argmax returns the FIRST maximum)."""
    scalars = read_scalars(run_dir, tag)
    if not scalars:
        raise FileNotFoundError(
            f"no scalars for tag {tag!r} in event files under {run_dir}")
    best = max(range(len(scalars)), key=lambda i: (scalars[i][1], -i))
    return scalars[best]


def scalar_tags(run_dir: str) -> Dict[str, int]:
    """tag -> record count, for diagnostics."""
    counts: Dict[str, int] = {}
    for name in sorted(os.listdir(run_dir)):
        if not name.startswith("events.out.tfevents"):
            continue
        for _, tag, _ in iter_scalars(os.path.join(run_dir, name)):
            counts[tag] = counts.get(tag, 0) + 1
    return counts


# ---------------------------------------------------------------------------
# Event-file WRITING — the inverse of the reader above.
#
# The reference's entire observability surface is tensorboardX scalars and
# images (`scripts/train.py:292,364,454-465` via `sg2im/utils.py:53`
# `writer.add_scalar('%s/%s' % (tag, k), v, itr)`). Writing the same wire
# format lets a reference user's TensorBoard dashboards and the TB-based
# best-checkpoint flow (`best_step_from_events` above) work on runs produced
# by THIS framework. Unlike the reader, the writer emits real masked-CRC32C
# record framing — TensorBoard's own loader verifies CRCs on read.
# ---------------------------------------------------------------------------

_CRC32C_TABLE = None


def _crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), the checksum TFRecord framing requires."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        table = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            table.append(c)
        _CRC32C_TABLE = table
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(number: int, wire: int, payload: bytes) -> bytes:
    return _varint((number << 3) | wire) + payload


def _len_delim(number: int, payload: bytes) -> bytes:
    return _field(number, 2, _varint(len(payload)) + payload)


def _encode_event(wall_time: float, step: int = 0, *,
                  summary: bytes = b"", file_version: str = "") -> bytes:
    """Event proto: 1=wall_time double, 2=step varint, 3=file_version,
    5=summary (matching the field map in the module docstring)."""
    buf = _field(1, 1, struct.pack("<d", wall_time))
    if step:
        buf += _field(2, 0, _varint(step))
    if file_version:
        buf += _len_delim(3, file_version.encode("utf-8"))
    if summary:
        buf += _len_delim(5, summary)
    return buf


def _scalar_value(tag: str, value: float) -> bytes:
    """Summary{1=Value{1=tag, 2=simple_value float32}}."""
    return _len_delim(1, _len_delim(1, tag.encode("utf-8")) + _field(
        2, 5, struct.pack("<f", float(value))))


def _image_value(tag: str, png: bytes, height: int, width: int,
                 colorspace: int = 3) -> bytes:
    """Summary.Value: 1=tag, 4=Summary.Image{1=h,2=w,3=colorspace,4=png}."""
    image = (_field(1, 0, _varint(height)) + _field(2, 0, _varint(width)) +
             _field(3, 0, _varint(colorspace)) + _len_delim(4, png))
    return _len_delim(1, _len_delim(1, tag.encode("utf-8")) +
                      _len_delim(4, image))


class TBEventWriter:
    """Append-only TensorBoard event file writer (tensorboardX-compatible).

    Emits one ``events.out.tfevents.<time>.<host>`` file per instance, with
    the mandatory ``brain.Event:2`` file-version record first — TensorBoard
    refuses files without it.
    """

    def __init__(self, run_dir: str):
        os.makedirs(run_dir, exist_ok=True)
        import socket
        import time as _time
        t = _time.time()
        self.path = os.path.join(
            run_dir, "events.out.tfevents.%d.%s" % (int(t),
                                                    socket.gethostname()))
        self._f = open(self.path, "ab")
        self._write_record(_encode_event(t, file_version="brain.Event:2"))

    def _write_record(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))
        self._f.flush()

    def add_scalar(self, tag: str, value: float, step: int,
                   wall_time: float | None = None) -> None:
        import time as _time
        summary = _scalar_value(tag, value)
        self._write_record(_encode_event(
            wall_time if wall_time is not None else _time.time(),
            step, summary=summary))

    def add_scalars(self, tag_prefix: str, metrics: Dict, step: int) -> None:
        """The reference's ``log_scalar_dict`` (sg2im/utils.py:46-53):
        one scalar record per key, tagged ``{prefix}/{key}``."""
        import time as _time
        t = _time.time()
        for k, v in metrics.items():
            self._write_record(_encode_event(
                t, step, summary=_scalar_value(f"{tag_prefix}/{k}",
                                               float(v))))

    def add_image(self, tag: str, image_hwc, step: int) -> None:
        """uint8/float HWC image -> PNG-encoded Summary.Image record
        (the reference's add_images val grids, scripts/train.py:454-465)."""
        import io
        import time as _time
        import numpy as _np
        from PIL import Image
        arr = _np.asarray(image_hwc)
        if arr.dtype != _np.uint8:
            arr = (_np.clip(arr, 0.0, 1.0) * 255).astype(_np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="png")
        h, w = arr.shape[:2]
        self._write_record(_encode_event(
            _time.time(), step,
            summary=_image_value(tag, buf.getvalue(), h, w,
                                 colorspace=arr.shape[2]
                                 if arr.ndim == 3 else 1)))

    def close(self) -> None:
        self._f.close()
