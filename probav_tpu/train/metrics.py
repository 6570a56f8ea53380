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
import numpy as np


class Mean:
    """Weighted streaming mean over scalars.

    ``update`` only appends (device scalars are NOT touched — even one eager
    add per step costs a dispatch RPC on remote TPU backends); ``result``
    reduces everything in a single fused op + one device->host fetch.
    ``weight`` lets a caller down-weight a partial batch's mean by its true
    sample count (the trainer's padded-final-val-batch case).
    """

    def __init__(self, name: str = "mean"):
        self.name = name
        self._values = []     # (value, weight) pairs
        self._carry = None    # (weighted sum, weight total, n) folded

    def update(self, value, weight: float = 1.0) -> None:
        self._values.append((value, float(weight)))

    def result(self) -> float:
        total, count, n = self._carry if self._carry else (0.0, 0.0, 0)
        if self._values:
            batch = self._values
            self._values = []
            vals = [v for v, _ in batch]
            ws = np.asarray([w for _, w in batch], np.float32)
            if any(hasattr(v, "device") for v in vals):
                import jax.numpy as jnp
                total = total + float(jnp.sum(jnp.stack(
                    [jnp.asarray(v, jnp.float32) for v in vals]) * ws))
            else:
                total = total + float(np.sum(
                    [float(v) * w for v, w in batch]))
            count += float(np.sum(ws))
            n += len(batch)
            self._carry = (total, count, n)
        if count == 0:
            return float("nan")
        return total / count

    def reset(self) -> None:
        self._values.clear()
        self._carry = None

    def __len__(self) -> int:
        n = len(self._values)
        return n + (self._carry[2] if self._carry else 0)


class ScalarLogger:
    """TensorBoard (optional) + JSONL scalar logger.

    ``split_writers=True`` reproduces the reference's two-writer experiment
    (debug/trainClassTwoWriters.py:28-38): Train*/Test* tags go to separate
    ``Train/`` and ``Test/`` event-file subdirectories so TensorBoard
    overlays them as two runs.
    """

    def __init__(self, log_dir: str, split_writers: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.split_writers = split_writers
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tbs = {}
        try:
            from tensorboardX import SummaryWriter
            if split_writers:
                self._tbs = {
                    "Train": SummaryWriter(os.path.join(log_dir, "Train")),
                    "Test": SummaryWriter(os.path.join(log_dir, "Test")),
                }
            else:
                self._tbs = {"": SummaryWriter(log_dir)}
        except Exception:
            self._tbs = {}

    def _writer_for(self, tag: str):
        if not self._tbs:
            return None
        if self.split_writers:
            key = "Test" if tag.startswith("Test") else "Train"
            return self._tbs.get(key)
        return self._tbs.get("")

    def scalar(self, tag: str, value: float, step: int) -> None:
        value = float(value)
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": value, "step": int(step),
             "time": time.time()}) + "\n")
        tb = self._writer_for(tag)
        if tb is not None:
            # Keep the reference's human tag names in JSONL but feed TB a
            # sanitized tag up front (it would warn and rewrite otherwise).
            tb.add_scalar(tag.replace(" ", "_"), value, step)

    def flush(self) -> None:
        self._jsonl.flush()
        for tb in self._tbs.values():
            tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        for tb in self._tbs.values():
            tb.close()
