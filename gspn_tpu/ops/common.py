"""Shared helpers for the point-op library."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.cache
def default_use_pallas() -> bool:
    """Pallas kernels compile natively on TPU; elsewhere we interpret."""
    return jax.default_backend() == "tpu"


def resolve_impl(impl: str) -> str:
    """Resolve ``impl in {"auto", "pallas", "xla"}`` to a concrete choice."""
    if impl == "auto":
        return "pallas" if default_use_pallas() else "xla"
    if impl not in ("pallas", "xla"):
        raise ValueError(f"impl must be auto|pallas|xla, got {impl!r}")
    return impl


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared L2 distances between two point sets.

    a: (..., N, D), b: (..., M, D) -> (..., N, M).

    Computed with explicit differences (not the ||a||^2 - 2ab + ||b||^2
    expansion) so that results agree bit-for-bit with the NumPy oracle and
    with the Pallas kernels; threshold comparisons (ball query) and
    argmin tie-breaks depend on it. D=3 is tiny, so the VPU does this at
    memory speed; the MXU expansion would not help at these shapes.
    """
    d = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sum(d * d, axis=-1)


def masked_sqdist(
    a: jax.Array,
    b: jax.Array,
    b_valid: jax.Array | None,
    fill: float = 1e10,
) -> jax.Array:
    """pairwise_sqdist with invalid columns (padded b points) pushed to ``fill``."""
    d2 = pairwise_sqdist(a, b)
    if b_valid is not None:
        d2 = jnp.where(b_valid[..., None, :], d2, fill)
    return d2
