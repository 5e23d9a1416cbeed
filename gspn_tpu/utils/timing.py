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


def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Mean seconds per call, completion-synchronized."""
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters
