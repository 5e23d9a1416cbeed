"""Morton (z-order) spatial ordering — the TPU-native locality layout.

The reference scans all N dataset points per query in its CUDA ball-query
kernel (SURVEY.md §2.1 `query_ball_point`), which a GPU hides with massive
thread parallelism. On TPU the idiomatic answer is data layout: sort each
scene's points along a Morton curve once (an XLA sort, on device), after
which consecutive points are spatially local. The fused ball-query kernel
(`ops/ball_group.py`) then skips whole point chunks whose bounding box is
farther than the query radius from the query tile's bounding box — an
always-correct pruning that becomes highly effective on sorted scenes.

Sorting a scene is a permutation of a point *set*: every op here is
permutation-equivariant except the FPS seed choice (greedy from index 0)
and first-come ball-query ordering, so results on a sorted scene are the
same quality but not bit-identical to the unsorted layout. Pipelines that
need bit-parity with the unsorted oracle layout simply skip the sort.
"""

from __future__ import annotations

import jax.numpy as jnp


def _spread_bits3(v):
    """Spread the low 10 bits of ``v`` so bit i lands at position 3*i."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_codes(xyz, valid=None, bits: int = 10):
    """30-bit Morton codes per point. xyz (B, N, 3) -> (B, N) int32.

    Coordinates are normalized per scene to the valid-point bounding box.
    Invalid points get the sentinel code 2^30 (sorts last).
    """
    assert 1 <= bits <= 10
    big = jnp.asarray(1e30, xyz.dtype)
    if valid is not None:
        v3 = valid[..., None]
        lo = jnp.min(jnp.where(v3, xyz, big), axis=1, keepdims=True)
        hi = jnp.max(jnp.where(v3, xyz, -big), axis=1, keepdims=True)
    else:
        lo = jnp.min(xyz, axis=1, keepdims=True)
        hi = jnp.max(xyz, axis=1, keepdims=True)
    nmax = (1 << bits) - 1
    scale = nmax / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((xyz - lo) * scale), 0, nmax).astype(jnp.int32)
    code = (
        _spread_bits3(q[..., 0])
        | (_spread_bits3(q[..., 1]) << 1)
        | (_spread_bits3(q[..., 2]) << 2)
    )
    if valid is not None:
        code = jnp.where(valid, code, jnp.int32(1 << 30))
    return code


def spatial_order(xyz, valid=None, bits: int = 10):
    """Morton sort permutation: (B, N) int32, stable (ties keep input
    order; invalid points last)."""
    return jnp.argsort(
        morton_codes(xyz, valid, bits), axis=-1, stable=True
    ).astype(jnp.int32)


def apply_order(perm, *arrays):
    """Permute per-point arrays (B, N, ...) by ``perm`` (B, N)."""
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        idx = perm.reshape(perm.shape + (1,) * (a.ndim - 2))
        out.append(jnp.take_along_axis(a, idx, axis=1))
    return tuple(out) if len(arrays) != 1 else out[0]
