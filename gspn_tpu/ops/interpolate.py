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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gspn_tpu.ops.common import masked_sqdist, resolve_impl, round_up
from gspn_tpu.ops.grouping import group_point


def _three_nn_kernel(tgt_ref, src_ref, dist_ref, idx_ref, *, m: int):
    """Grid (B, N//TN). Targets on sublanes, sources on lanes.

    tgt:  (1, TN, 128) cols 0..2 target coords.
    src:  (1, 8, Mpad) rows x, y, z; row 3 = validity.
    dist: (1, TN, 128) out — cols 0..2 squared distances ascending.
    idx:  (1, TN, 128) i32 out — cols 0..2 source indices.

    The (TN, M) distance tile lives only in VMEM (never HBM, unlike the
    XLA top_k path), and the top-3 is three masked min-extraction passes
    with lowest-index tie-breaks, matching ``lax.top_k`` semantics.
    """
    mpad = src_ref.shape[2]
    tn = tgt_ref.shape[1]
    sx = src_ref[0, 0:1, :]
    sy = src_ref[0, 1:2, :]
    sz = src_ref[0, 2:3, :]
    svalid = src_ref[0, 3:4, :] > 0.0
    tx = tgt_ref[0, :, 0:1]
    ty = tgt_ref[0, :, 1:2]
    tz = tgt_ref[0, :, 2:3]
    dx = tx - sx
    dy = ty - sy
    dz = tz - sz
    d2 = dx * dx + dy * dy + dz * dz  # (TN, Mpad)
    d2 = jnp.where(svalid, d2, 1e10)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tn, mpad), 1)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (tn, 128), 1)

    dists = jnp.zeros((tn, 128), jnp.float32)
    idxs = jnp.zeros((tn, 128), jnp.int32)
    for k in range(3):
        dmin = jnp.min(d2, axis=1, keepdims=True)  # (TN, 1)
        imin = jnp.min(
            jnp.where(d2 == dmin, iota, m), axis=1, keepdims=True
        )
        imin = jnp.minimum(imin, m - 1).astype(jnp.int32)
        dists = jnp.where(kiota == k, dmin, dists)
        idxs = jnp.where(kiota == k, imin, idxs)
        d2 = jnp.where(iota == imin, 1e10, d2)
    dist_ref[0, :, :] = dists
    idx_ref[0, :, :] = idxs


def _three_nn_pallas(xyz1, xyz2, valid2, interpret):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    mpad = round_up(m, 128)
    tn = min(128, round_up(n, 8))
    npad = round_up(n, tn)

    tgt = jnp.zeros((b, npad, 128), jnp.float32)
    tgt = tgt.at[:, :n, 0:3].set(xyz1.astype(jnp.float32))
    src = jnp.zeros((b, 8, mpad), jnp.float32)
    src = src.at[:, 0:3, :m].set(jnp.swapaxes(xyz2.astype(jnp.float32), 1, 2))
    if valid2 is None:
        src = src.at[:, 3, :m].set(1.0)
    else:
        src = src.at[:, 3, :m].set(valid2.astype(jnp.float32))

    dist, idx = pl.pallas_call(
        functools.partial(_three_nn_kernel, m=m),
        grid=(b, npad // tn),
        in_specs=[
            pl.BlockSpec(
                (1, tn, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, mpad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tn, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tn, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, npad, 128), jnp.int32),
        ],
        interpret=interpret,
    )(tgt, src)
    return dist[:, :n, 0:3], idx[:, :n, 0:3]


def three_nn(
    xyz1: jax.Array,
    xyz2: jax.Array,
    valid2: jax.Array | None = None,
    *,
    impl: str = "auto",
    interpret: bool | None = None,
):
    """3 nearest sources for each target. xyz1 (B,N,3) targets, xyz2 (B,M,3)
    sources -> dist (B,N,3) squared ascending, idx (B,N,3) i32.

    The Pallas path keeps the (N, M) distance tile in VMEM only; the XLA
    path (``top_k`` over the materialized matrix) is the cross-check and
    the fallback for very large M (> 16384 sources per scene)."""
    choice = resolve_impl(impl)
    if choice == "pallas" and xyz2.shape[1] <= 16384:
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return _three_nn_pallas(xyz1, xyz2, valid2, interpret)
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
