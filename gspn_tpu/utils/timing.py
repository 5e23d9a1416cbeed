"""Timing that is honest on tunneled/async TPU platforms.

On this image's axon (tunneled) TPU backend, ``jax.block_until_ready``
returns before the device finishes — only a device->host transfer
synchronizes. All throughput numbers must go through :func:`sync` /
:func:`time_fn`.
"""

from __future__ import annotations

import time

import jax
import numpy as np


_reduce = None


def sync(tree) -> None:
    """Force completion of the program that produced ``tree``: reduce one
    output leaf on-device and fetch the scalar (all leaves of one jitted
    call complete together). Fetching a scalar keeps tunnel-transfer time
    out of the measurement."""
    global _reduce
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return
    if _reduce is None:
        _reduce = jax.jit(lambda x: jax.numpy.sum(x, dtype=jax.numpy.float32))
    smallest = min(leaves, key=lambda l: getattr(l, "size", 0))
    np.asarray(jax.device_get(_reduce(smallest)))


def time_fn(
    fn,
    *args,
    iters: int = 10,
    warmup: int = 2,
    batches: int = 1,
    stat: str = "mean",
) -> float:
    """Seconds per call, completion-synchronized.

    With ``batches > 1``, times ``batches`` independent blocks of
    ``iters`` calls and aggregates the per-block means with ``stat``
    ("mean" | "median" | "min"). The tunneled backend's throughput
    drifts by ~±5% between multi-second windows (external queueing, not
    our program — measured on back-to-back identical bench runs);
    median-of-batches makes measurements comparable across sessions.
    """
    for _ in range(warmup):
        sync(fn(*args))
    means = []
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        means.append((time.perf_counter() - t0) / iters)
    if stat == "mean":
        return float(np.mean(means))
    if stat == "median":
        return float(np.median(means))
    if stat == "min":
        return float(np.min(means))
    raise ValueError(f"stat must be mean|median|min, got {stat!r}")
