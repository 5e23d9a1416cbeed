"""Three-nearest-neighbor feature interpolation.

Reference parity (``tf_ops/3d_interpolation/tf_interpolate.cpp`` —
CPU-only C++ in the reference, meaning every feature-propagation layer
round-tripped GPU->host->GPU; here it is fused on-device, a free win.
Reconstructed, see SURVEY.md §2.1):

- ``three_nn(xyz1, xyz2)``: for each of N target points in ``xyz1``, the 3
  nearest of M source points in ``xyz2`` -> ``dist (B, N, 3) f32`` (squared
  distances, ascending), ``idx (B, N, 3) i32``.
- ``three_interpolate(points, idx, weight)``: ``(B, M, C)`` gathered at idx,
  weighted sum -> ``(B, N, C)``; gradient scatter-adds into points
  (autodiff provides it).
- ``three_interpolate_weights``: the reference computes inverse-distance
  weights at model level (``pointnet_util.pointnet_fp_module``):
  ``d = max(d, 1e-10); w = (1/d) / sum(1/d)``. Provided here as a helper so
  every call site matches exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gspn_tpu.ops.common import masked_sqdist
from gspn_tpu.ops.grouping import group_point


def three_nn(
    xyz1: jax.Array, xyz2: jax.Array, valid2: jax.Array | None = None
):
    """3 nearest sources for each target. xyz1 (B,N,3) targets, xyz2 (B,M,3)
    sources -> dist (B,N,3) squared ascending, idx (B,N,3) i32."""
    d2 = masked_sqdist(xyz1, xyz2, valid2)  # (B, N, M)
    neg, idx = jax.lax.top_k(-d2, 3)
    return -neg, idx.astype(jnp.int32)


def three_interpolate_weights(dist: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Inverse-distance weights exactly as the reference FP module computes
    them from three_nn's squared distances."""
    d = jnp.maximum(dist, eps)
    recip = 1.0 / d
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def three_interpolate(
    points: jax.Array, idx: jax.Array, weight: jax.Array
) -> jax.Array:
    """``(B, M, C), (B, N, 3) i32, (B, N, 3) -> (B, N, C)`` weighted gather.

    Differentiable w.r.t. points (scatter-add) and weight.
    """
    gathered = group_point(points, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=-2)
