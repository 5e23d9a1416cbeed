"""On-device 3D axis-aligned-box NMS.

The reference runs NMS host-side in NumPy between proposal generation and
RoIAlign (SURVEY.md §2.2 "Proposal NMS"), forcing a GPU->host->GPU round
trip per scene. Here suppression is a fixed-trip-count ``fori_loop`` over
score-sorted boxes inside the same XLA program — no host sync, which is one
of the north-star fusion requirements (BASELINE.json).

Boxes are ``(R, 6)``: ``[xmin, ymin, zmin, xmax, ymax, zmax]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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


def nms_3d(
    boxes: jax.Array,
    scores: jax.Array,
    iou_thresh: float,
    valid: jax.Array | None = None,
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
    r = boxes.shape[0]
    neg = jnp.full_like(scores, -jnp.inf)
    s = scores if valid is None else jnp.where(valid, scores, neg)
    order = jnp.argsort(-s)  # stable: ties keep input order
    bs = boxes[order]
    alive = jnp.ones((r,), bool) if valid is None else valid[order]
    iou = box_iou(bs, bs)  # (R, R), computed once
    later = jnp.arange(r)[None, :] > jnp.arange(r)[:, None]

    def body(i, carry):
        alive, keep = carry
        is_kept = alive[i]
        keep = keep.at[i].set(is_kept)
        suppress = jnp.logical_and(iou[i] > iou_thresh, later[i])
        alive = jnp.logical_and(alive, jnp.logical_not(jnp.logical_and(is_kept, suppress)))
        return alive, keep

    _, keep_sorted = jax.lax.fori_loop(
        0, r, body, (alive, jnp.zeros((r,), bool))
    )
    keep = jnp.zeros((r,), bool).at[order].set(keep_sorted)
    return keep


def nms_3d_batched(boxes, scores, iou_thresh, valid=None):
    """vmap of :func:`nms_3d` over a leading batch dim."""
    if valid is None:
        return jax.vmap(lambda b, s: nms_3d(b, s, iou_thresh))(boxes, scores)
    return jax.vmap(lambda b, s, v: nms_3d(b, s, iou_thresh, v))(
        boxes, scores, valid
    )
