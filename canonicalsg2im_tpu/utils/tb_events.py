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
