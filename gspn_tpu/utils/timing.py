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


def sync(tree) -> None:
    """Force completion of the program that produced ``tree``: fetch the
    smallest output leaf to host (all leaves of one jitted call complete
    together)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return
    smallest = min(leaves, key=lambda l: getattr(l, "size", 0))
    np.asarray(jax.device_get(smallest))


def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Mean seconds per call, completion-synchronized."""
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters
