"""On-device 3D axis-aligned-box NMS.

The reference runs NMS host-side in NumPy between proposal generation and
RoIAlign (SURVEY.md §2.2 "Proposal NMS"), forcing a GPU->host->GPU round
trip per scene. Here suppression is a fixed-trip-count ``fori_loop`` over
score-sorted boxes inside the same XLA program — no host sync, which is one
of the north-star fusion requirements (BASELINE.json).

Boxes are ``(R, 6)``: ``[xmin, ymin, zmin, xmax, ymax, zmax]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gspn_tpu.ops.common import resolve_impl, round_up


def box_volume(boxes: jax.Array) -> jax.Array:
    ext = jnp.maximum(boxes[..., 3:6] - boxes[..., 0:3], 0.0)
    return ext[..., 0] * ext[..., 1] * ext[..., 2]


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU between ``a (..., Ra, 6)`` and ``b (..., Rb, 6)`` -> (..., Ra, Rb)."""
    lo = jnp.maximum(a[..., :, None, 0:3], b[..., None, :, 0:3])
    hi = jnp.minimum(a[..., :, None, 3:6], b[..., None, :, 3:6])
    ext = jnp.maximum(hi - lo, 0.0)
    inter = ext[..., 0] * ext[..., 1] * ext[..., 2]
    union = box_volume(a)[..., :, None] + box_volume(b)[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def _nms_suppress_xla(iou, alive, iou_thresh):
    """Greedy suppression over a score-sorted IoU matrix via Jacobi
    fixpoint iteration. iou (R, R), alive (R,) bool -> keep (R,) bool
    (sorted order).

    The greedy solution is the unique fixpoint of
    ``keep(i) = alive(i) and not any(j < i, keep(j), iou(j,i) > th)``;
    iterating that map stabilizes entries of suppression-chain depth d
    after d rounds, so the while_loop converges in (max chain depth + 1)
    fully-vectorized (R, R) steps — typically ~3-5 — instead of R
    sequential scalar rounds (a ~30x wall-clock win at R=64 on v5e, where
    per-step dispatch dominates tiny ops)."""
    r = iou.shape[0]
    earlier = jnp.arange(r)[:, None] < jnp.arange(r)[None, :]  # j < i at [j, i]
    sup = jnp.logical_and(iou > iou_thresh, earlier)  # j suppresses i

    def step(keep):
        return jnp.logical_and(
            alive, jnp.logical_not(jnp.any(sup & keep[:, None], axis=0))
        )

    # 8 Jacobi steps per while iteration: the convergence test compares
    # the last two CONSECUTIVE states (an exact fixpoint check — the map
    # is idempotent at the fixpoint), so correctness is unchanged while
    # the per-iteration scalar-reduce + branch sync is paid 8x less often
    unroll = 8

    def cond(carry):
        keep, prev, it = carry
        return jnp.logical_and(jnp.any(keep != prev), it <= r)

    def body(carry):
        keep, _, it = carry
        for _ in range(unroll - 1):
            keep = step(keep)
        return step(keep), keep, it + unroll

    keep0 = alive
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.logical_not(keep0), jnp.int32(0))
    )
    return keep


def _nms_kernel(iou_ref, alive_ref, keep_ref, *, r: int, thresh: float):
    """Grid (B,). The whole greedy loop runs inside VMEM — the XLA loop
    version pays per-iteration dispatch for R tiny ops; this doesn't.

    iou:   (1, Rpad, Rpad) score-sorted IoU matrix.
    alive: (1, 8, Rpad) row 0 = 1.0 for valid candidates (sorted order).
    keep:  (1, 8, Rpad) i32 out, row 0.
    """
    rpad = iou_ref.shape[2]
    riota = jax.lax.broadcasted_iota(jnp.int32, (1, rpad), 1)
    # int32 masks throughout: Mosaic rejects boolean-vector loop carries
    alive0 = jnp.where(
        jnp.logical_and(alive_ref[0, 0:1, :] > 0.0, riota < r), 1, 0
    )

    def body(i, carry):
        alive, keep = carry
        a_i = jnp.sum(jnp.where(riota == i, alive, 0))  # 0/1 scalar
        keep = jnp.where(riota == i, a_i, keep)
        row = iou_ref[0, pl.ds(i, 1), :]  # (1, Rpad)
        suppress = jnp.where(
            jnp.logical_and(row > thresh, riota > i), a_i, 0
        )
        alive = alive * (1 - suppress)
        return alive, keep

    _, keep = jax.lax.fori_loop(
        0, r, body, (alive0, jnp.zeros((1, rpad), jnp.int32))
    )
    keep_ref[0, 0:1, :] = keep


def _nms_suppress_pallas(iou, alive, iou_thresh, interpret):
    b, r, _ = iou.shape
    rpad = round_up(r, 128)
    ioup = jnp.zeros((b, rpad, rpad), jnp.float32)
    ioup = ioup.at[:, :r, :r].set(iou.astype(jnp.float32))
    alivep = jnp.zeros((b, 8, rpad), jnp.float32)
    alivep = alivep.at[:, 0, :r].set(alive.astype(jnp.float32))
    keep = pl.pallas_call(
        functools.partial(_nms_kernel, r=r, thresh=float(iou_thresh)),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rpad, rpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, rpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, rpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 8, rpad), jnp.int32),
        interpret=interpret,
    )(ioup, alivep)
    return keep[:, 0, :r] > 0


def nms_3d(
    boxes: jax.Array,
    scores: jax.Array,
    iou_thresh: float,
    valid: jax.Array | None = None,
    *,
    impl: str = "auto",
    interpret: bool | None = None,
):
    """Greedy score-descending NMS over axis-aligned 3D boxes.

    Args:
      boxes: ``(R, 6)``.
      scores: ``(R,)``; higher = better.
      iou_thresh: boxes with IoU > thresh against a kept box are suppressed.
      valid: optional ``(R,)`` bool; invalid boxes are never kept.

    Returns:
      ``keep (R,) bool`` in the ORIGINAL box order.
    """
    keep = nms_3d_batched(
        boxes[None], scores[None],
        iou_thresh,
        None if valid is None else valid[None],
        impl=impl,
        interpret=interpret,
    )
    return keep[0]


def nms_3d_batched(
    boxes,
    scores,
    iou_thresh,
    valid=None,
    *,
    impl: str = "auto",
    interpret: bool | None = None,
):
    """Batched greedy NMS: (B, R, 6), (B, R) -> keep (B, R) bool in the
    ORIGINAL box order."""
    b, r = scores.shape
    neg = jnp.full_like(scores, -jnp.inf)
    s = scores if valid is None else jnp.where(valid, scores, neg)
    # XLA's stable argsort: ties keep input order. (A rank-comparison +
    # one-hot-permutation-matmul alternative was measured on v5e and is
    # ~2 ms SLOWER standalone at R=64 — the sort is not the cost here,
    # the per-call dispatch floor is; see STATUS round-3 sweep notes.)
    order = jnp.argsort(-s, axis=-1)
    bs = jnp.take_along_axis(boxes, order[..., None], axis=1)
    alive = (
        jnp.ones((b, r), bool)
        if valid is None
        else jnp.take_along_axis(valid, order, axis=1)
    )
    iou = box_iou(bs, bs)  # (B, R, R), computed once

    # auto -> xla: the Jacobi-fixpoint suppression converges in ~chain-depth
    # vectorized steps and beats the Pallas sequential-row kernel at
    # proposal counts (see scripts/microbench.py); "pallas" still selects
    # the kernel explicitly (kept for cross-checking).
    choice = "xla" if impl == "auto" else resolve_impl(impl)
    if choice == "pallas":
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        keep_sorted = _nms_suppress_pallas(iou, alive, iou_thresh, interpret)
    else:
        keep_sorted = jax.vmap(
            lambda m, a: _nms_suppress_xla(m, a, iou_thresh)
        )(iou, alive)
    keep = jnp.zeros((b, r), bool)
    keep = jax.vmap(lambda k, o, ks: k.at[o].set(ks))(keep, order, keep_sorted)
    return keep
