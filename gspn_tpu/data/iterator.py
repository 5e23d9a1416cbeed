"""Deterministic, resumable data iteration (SURVEY.md §5: the rebuild's
answer to crash-recovery — the reference restarts from a Saver checkpoint
with a fresh shuffle; here batch ``i`` is a pure function of (seed, i), so
restoring a checkpoint at step ``s`` and continuing from batch ``s``
reproduces the original run exactly)."""

from __future__ import annotations

import numpy as np


class DeterministicBatches:
    """Wraps any ``sample_fn(np_rng, batch_size) -> batch dict``; batch i
    is generated from an rng seeded by ``(seed, i)`` only."""

    def __init__(self, sample_fn, batch_size: int, seed: int = 0):
        self.sample_fn = sample_fn
        self.batch_size = batch_size
        self.seed = seed

    def batch_at(self, step: int) -> dict:
        rng = np.random.default_rng(
            np.random.SeedSequence(entropy=self.seed, spawn_key=(step,))
        )
        return self.sample_fn(rng, self.batch_size)

    def iterate(self, start_step: int = 0):
        step = start_step
        while True:
            yield self.batch_at(step)
            step += 1
