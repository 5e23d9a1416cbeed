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


class DevicePrefetcher:
    """Overlap host-side batch generation (and staging, e.g.
    ``jax.device_put``) with the running train step.

    A daemon thread keeps up to ``depth`` staged batches ahead of the
    consumer: while step ``i`` executes on the device, the host is
    already sampling/transferring batches ``i+1..i+depth``. On a
    tunneled chip the host->device transfer is the expensive leg, so
    without this the step serializes behind it.

    Determinism/resume contract is EXACTLY :class:`DeterministicBatches`:
    ``iterate(start_step)`` yields ``(step, stage(batch_at(step)))`` for
    ``step = start_step, start_step+1, ...`` in order — the staged values
    are the same arrays, just moved early. ``stage`` defaults to
    identity; trainers pass the jnp conversion so this module stays
    NumPy-only. Worker exceptions re-raise in the consumer."""

    def __init__(self, batches: DeterministicBatches, depth: int = 2,
                 stage=None):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self.batches = batches
        self.depth = depth
        self.stage = stage if stage is not None else (lambda b: b)

    def iterate(self, start_step: int = 0, stop_step: int | None = None):
        """Yield ``(step, staged_batch)`` for ``start_step <= step <
        stop_step`` (unbounded when ``stop_step`` is None). The worker
        never generates past ``stop_step``, so a bounded feed winds down
        on its own when training ends."""
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def worker():
            step = start_step
            while not stop.is_set() and (
                stop_step is None or step < stop_step
            ):
                try:
                    item = (step, self.stage(self.batches.batch_at(step)))
                except BaseException as e:  # noqa: BLE001 — re-raised below
                    item = ("error", e)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if item[0] == "error":
                    return
                step += 1

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            step = start_step
            while stop_step is None or step < stop_step:
                item = q.get()
                if item[0] == "error":
                    raise item[1]
                yield item
                step += 1
        finally:
            stop.set()


def make_feed(batches: DeterministicBatches, start_step: int,
              stop_step: int, prefetch: int, stage=None):
    """The trainers' batch feed: yields ``(step, stage(batch_at(step)))``
    for ``start_step <= step < stop_step``, through a
    :class:`DevicePrefetcher` when ``prefetch > 0`` (identical values
    and order either way — resume stays bit-exact). Close the generator
    (or exhaust it) to stop the worker thread."""
    stage = stage if stage is not None else (lambda b: b)
    if prefetch > 0:
        return DevicePrefetcher(batches, depth=prefetch, stage=stage).iterate(
            start_step, stop_step
        )
    return (
        (i, stage(batches.batch_at(i))) for i in range(start_step, stop_step)
    )
