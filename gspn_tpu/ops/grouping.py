"""Index-gather ops: gather_point, group_point, knn_point.

Reference parity (reconstructed, SURVEY.md §2.1):

- ``gather_point(inp, idx)``: ``(B, N, C), (B, M) i32 -> (B, M, C)`` with a
  scatter-add gradient (``tf_ops/sampling/tf_sampling.cpp::GatherPoint``).
- ``group_point(points, idx)``: ``(B, N, C), (B, M, K) i32 -> (B, M, K, C)``
  with a scatter-add gradient (``tf_ops/grouping/tf_grouping.cpp``).
- ``knn_point(k, xyz1, xyz2)``: brute-force squared distances + top-k
  (``tf_ops/grouping/tf_grouping.py::knn_point`` — pure TF in the
  reference, pure XLA here).

On TPU, gathers along the point axis lower to native HLO gather and the
scatter-add gradients fall out of autodiff — no custom kernels needed (this
is the idiomatic native equivalent; the reference only hand-wrote CUDA
because TF1 custom ops required it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gspn_tpu.ops.common import masked_sqdist


def gather_point(inp: jax.Array, idx: jax.Array) -> jax.Array:
    """``(B, N, C), (B, M) i32 -> (B, M, C)``. Differentiable w.r.t. inp."""
    return jnp.take_along_axis(inp, idx[..., None].astype(jnp.int32), axis=-2)


def group_point(points: jax.Array, idx: jax.Array) -> jax.Array:
    """``(B, N, C), (B, M, K) i32 -> (B, M, K, C)``. Differentiable."""
    b, n, c = points.shape
    m, k = idx.shape[-2:]
    flat = jnp.take_along_axis(
        points, idx.reshape(b, m * k, 1).astype(jnp.int32), axis=-2
    )
    return flat.reshape(b, m, k, c)


def knn_point(
    k: int,
    xyz1: jax.Array,
    xyz2: jax.Array,
    valid1: jax.Array | None = None,
):
    """k nearest neighbors of each query in ``xyz2`` among dataset ``xyz1``.

    Args:
      k: number of neighbors (static).
      xyz1: ``(B, N, C)`` dataset points.
      xyz2: ``(B, M, C)`` queries.
      valid1: optional ``(B, N)`` mask; padded points sort last.

    Returns:
      ``dist (B, M, k)`` squared distances ascending, ``idx (B, M, k) i32``.
      Ties break to the lower index (matching ``tf.nn.top_k`` on negated
      distances in the reference).
    """
    d2 = masked_sqdist(xyz2, xyz1, valid1)  # (B, M, N)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx.astype(jnp.int32)
