"""Profiling / tracing utilities (absent in the reference — SURVEY §5).

- ``trace``: context manager around ``jax.profiler`` writing a TensorBoard-
  loadable trace (xplane) for a window of steps.
- ``StepTimer``: cheap wall-clock step timing with percentile summaries,
  suitable for per-step telemetry without forcing device syncs (call
  ``lap`` around already-synchronized boundaries, e.g. after blocking
  metric flushes).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace into ``log_dir`` (view in TensorBoard)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self._laps: List[float] = []
        self._t = None

    def start(self) -> None:
        self._t = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - (self._t if self._t is not None else now)
        self._t = now
        self._laps.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self._laps:
            return {}
        laps = sorted(self._laps)
        n = len(laps)
        pick = lambda q: laps[min(n - 1, int(q * n))]
        return {
            "steps": n,
            "mean_s": sum(laps) / n,
            "p50_s": pick(0.50),
            "p90_s": pick(0.90),
            "p99_s": pick(0.99),
            "steps_per_sec": n / sum(laps),
        }
