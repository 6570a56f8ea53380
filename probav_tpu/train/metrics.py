"""Metrics accumulation and experiment logging.

Replaces the reference's keras ``Mean`` accumulators + ``tf.summary`` scalar
logging (trainClass.py:43-46, 73, 102-112) with:

- ``Mean`` — a tiny streaming mean that keeps values as device arrays until
  read, so logging never forces a device sync mid-step;
- ``ScalarLogger`` — writes TensorBoard event files via tensorboardX when
  available (same tags as the reference: 'Train PSNR', 'Train loss',
  'Test PSNR', 'Test loss') and always a machine-readable ``metrics.jsonl``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class Mean:
    """Streaming mean over scalars (device arrays welcome; sync on result)."""

    def __init__(self, name: str = "mean"):
        self.name = name
        self._values = []

    def update(self, value) -> None:
        self._values.append(value)

    def result(self) -> float:
        if not self._values:
            return float("nan")
        return float(np.mean([float(v) for v in self._values]))

    def reset(self) -> None:
        self._values.clear()

    def __len__(self) -> int:
        return len(self._values)


class ScalarLogger:
    """TensorBoard (optional) + JSONL scalar logger."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int) -> None:
        value = float(value)
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": value, "step": int(step),
             "time": time.time()}) + "\n")
        if self._tb is not None:
            # Keep the reference's human tag names in JSONL but feed TB a
            # sanitized tag up front (it would warn and rewrite otherwise).
            self._tb.add_scalar(tag.replace(" ", "_"), value, step)

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
