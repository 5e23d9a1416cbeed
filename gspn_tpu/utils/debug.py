"""Kernel debugging aids — the rebuild's answer to the reference's absent
sanitizer story (SURVEY.md §5 "race detection"): Pallas interpret mode for
kernel-level stepping, and checkify for OOB/NaN assertions in jitted code."""

from __future__ import annotations

import contextlib

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def interpret_kernels():
    """Run every Pallas kernel in interpreter mode within the block (slow,
    but python-debuggable and platform-independent)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def checked(fn, errors=checkify.float_checks):
    """Wrap a jittable fn with checkify NaN/div checks. Returns
    ``wrapped(*args) -> (error, out)``; call ``error.throw()`` to raise."""
    return jax.jit(checkify.checkify(fn, errors=errors))
