"""Thread-safe per-dataset RNG.

`data/loader.py::DataLoader` runs `dataset.__getitem__` on a thread pool
(num_workers concurrent batch loads), but `np.random.RandomState` is NOT
thread-safe: concurrent MT19937 state updates corrupt the stream
(duplicated/correlated augmentation draws). Datasets therefore hold a
ThreadLocalRNG: each pool thread gets its own RandomState sub-stream.

The first thread to touch the RNG (ordinal 0 — the main thread in
direct/single-threaded use, e.g. tests) gets RandomState(seed) exactly,
so single-threaded behaviour is bit-identical to the plain RandomState
this replaces. Later threads get decorrelated sub-streams. Which idx
lands on which thread still depends on pool scheduling — the same
reproducibility contract as torch's multi-worker DataLoader.
"""

from __future__ import annotations

import threading

import numpy as np


class ThreadLocalRNG:
    """Duck-types np.random.RandomState via attribute proxying."""

    def __init__(self, seed: int):
        self._seed = int(seed) & 0xFFFFFFFF
        self._local = threading.local()
        self._next_ordinal = 0
        self._lock = threading.Lock()

    def _stream(self) -> np.random.RandomState:
        rs = getattr(self._local, "rs", None)
        if rs is None:
            with self._lock:
                ordinal = self._next_ordinal
                self._next_ordinal += 1
            # golden-ratio stride decorrelates the per-thread seeds
            rs = np.random.RandomState(
                (self._seed + 0x9E3779B9 * ordinal) & 0xFFFFFFFF)
            self._local.rs = rs
        return rs

    def __getattr__(self, name):
        return getattr(self._stream(), name)
