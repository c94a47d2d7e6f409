"""Scalar metric logging: console + JSONL (stand-in for the reference's
tensorboardX writer, scripts/train.py:292,364)."""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricLogger:
    def __init__(self, output_dir: str, every: int = 500):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self.every = every
        self._f = open(self.path, "a")
        self.t0 = time.time()

    def log(self, tag: str, metrics: Dict, step: int, force: bool = False):
        if not force and step % self.every:
            return
        rec = {"tag": tag, "step": step, "wall": round(time.time() - self.t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
