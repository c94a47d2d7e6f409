"""Scalar metric logging: console + JSONL + TensorBoard event files.

The JSONL stream is this framework's native record; the TensorBoard event
file mirrors every scalar as ``{tag}/{key}`` — exactly what the reference
writes through tensorboardX (scripts/train.py:292,364 via
sg2im/utils.py:53), so a reference user's TB dashboards and the TB-based
best-checkpoint flow work unchanged on runs produced here. A new event file
is opened per process (tensorboardX restart semantics); readers merge files.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricLogger:
    def __init__(self, output_dir: str, every: int = 500, tb: bool = True):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self.every = every
        self._f = open(self.path, "a")
        self.t0 = time.time()
        self._tb = None
        if tb:
            from canonicalsg2im_tpu.utils.tb_events import TBEventWriter
            self._tb = TBEventWriter(output_dir)

    def log(self, tag: str, metrics: Dict, step: int, force: bool = False):
        if not force and step % self.every:
            return
        rec = {"tag": tag, "step": step, "wall": round(time.time() - self.t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalars(tag, {k: float(v) for k, v in metrics.items()},
                                 step)

    def log_image(self, tag: str, image_hwc, step: int):
        """Mirror a val image grid to TB (reference: train.py:454-465)."""
        if self._tb is not None:
            self._tb.add_image(tag, image_hwc, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
