"""Host-side input pipeline: shuffled batching + device prefetch.

Replaces the reference's tf.data pipeline (utils/utils.py:32-39:
from_tensor_slices -> shuffle(256) -> repeat -> batch -> prefetch) with a
numpy batcher and an explicit double-buffered device prefetcher, so the next
batch's host->device copy overlaps the current step's compute.

Deviations from the reference, by design:
- full-permutation shuffling per epoch instead of a 256-element shuffle
  buffer (strictly better mixing; reproducible via seed), and
- ``drop_remainder=True`` for training so every step has a static shape (no
  XLA recompile for the ragged final batch; with per-epoch reshuffling every
  sample is still seen across epochs).
"""

from __future__ import annotations

import collections
import itertools
from typing import Iterable, Iterator, Optional, Sequence

import jax
import numpy as np


class Batcher:
    """Iterate tuples of equally-indexed numpy arrays in shuffled batches."""

    def __init__(self, arrays: Sequence[np.ndarray], batch_size: int,
                 shuffle: bool = True, seed: int = 17,
                 drop_remainder: bool = True):
        n = len(arrays[0])
        assert all(len(a) == n for a in arrays), "array length mismatch"
        self.arrays = arrays
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.seed = seed
        self._rng = np.random.default_rng(seed)

    @property
    def steps_per_epoch(self) -> int:
        if self.drop_remainder:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def epoch(self, skip: int = 0, rng=None) -> Iterator[tuple]:
        """One pass; ``skip`` drops the first batches WITHOUT materializing
        them (the permutation is still drawn, so a resumed run sees the
        exact remainder an uninterrupted run would).  An explicit ``rng``
        draws the permutation from it WITHOUT consuming the batcher's own
        stream — callers that must be resume-deterministic (the trainer's
        validation pass) derive one from (seed, global_step)."""
        r = self._rng if rng is None else rng
        idx = (r.permutation(self.n) if self.shuffle
               else np.arange(self.n))
        end = (self.n - self.n % self.batch_size
               if self.drop_remainder else self.n)
        for start in range(skip * self.batch_size, end, self.batch_size):
            take = idx[start:start + self.batch_size]
            yield tuple(a[take] for a in self.arrays)

    def skip_epochs(self, epochs: int) -> None:
        """Advance the shuffle RNG past ``epochs`` whole epochs (draws and
        discards their permutations) — the replay half of sample-accurate
        resume."""
        for _ in range(epochs):
            if self.shuffle:
                self._rng.permutation(self.n)

    def repeat(self, epochs: Optional[int] = None,
               skip: int = 0) -> Iterator[tuple]:
        """``skip`` batches are dropped from the FIRST epoch only."""
        counter = range(epochs) if epochs is not None else itertools.count()
        for _ in counter:
            yield from self.epoch(skip=skip)
            skip = 0


def prefetch_to_device(it: Iterable, size: int = 2, sharding=None,
                       threaded: bool = True) -> Iterator:
    """device_put up to ``size`` elements ahead of consumption.

    With ``threaded`` (default) the host-side batch materialization and the
    host->device copies run on a producer thread, overlapping the consumer's
    device steps (device dispatch releases the GIL) — at ~1 ms/step the
    host-side fancy-indexing would otherwise dominate the loop.
    """

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    if not threaded:
        queue = collections.deque()
        it = iter(it)
        try:
            for _ in range(size):
                queue.append(put(next(it)))
        except StopIteration:
            pass
        while queue:
            out = queue.popleft()
            try:
                queue.append(put(next(it)))
            except StopIteration:
                pass
            yield out
        return

    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for batch in it:
                q.put(put(batch))
            q.put(_END)
        except BaseException as exc:  # noqa: BLE001 — re-raised in consumer
            q.put(exc)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            # Surface producer failures instead of truncating the stream
            # (a swallowed error would let training "succeed" early).
            raise item
        yield item
