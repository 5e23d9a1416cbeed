"""On-device seed -> GT-instance pairing.

The reference assembles per-seed GT instance point sets host-side in its
``get_batch`` (SURVEY.md §3.1). Here the pairing is a jittable gather so it
can live inside the training step (north-star: preprocessing fused into the
XLA program). All outputs are fixed-shape + masked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_seed_instances(
    xyz: jax.Array,  # (B, N, 3)
    inst_label: jax.Array,  # (B, N) i32, 0 = background
    seed_idx: jax.Array,  # (B, S) i32
    gt_size: int,  # G: fixed points per GT instance
):
    """For each seed, the first G scene points of the seed's instance.

    Returns:
      gt_points  (B, S, G, 3) — zeros where invalid
      gt_valid   (B, S, G) bool
      gt_center  (B, S, 3) — masked mean of the full instance (not just G)
      seed_is_fg (B, S) bool — seed lies on an instance (label > 0)
    """
    n = xyz.shape[1]
    seed_inst = jnp.take_along_axis(inst_label, seed_idx, axis=1)  # (B, S)
    member = inst_label[:, None, :] == seed_inst[:, :, None]  # (B, S, N)
    is_fg = seed_inst > 0
    member = jnp.logical_and(member, is_fg[:, :, None])

    pos = jnp.where(member, jnp.arange(n, dtype=jnp.int32), n)
    neg_top, _ = jax.lax.top_k(-pos, gt_size)  # G smallest positions
    idx = jnp.where(-neg_top >= n, 0, -neg_top)  # (B, S, G)
    cnt = jnp.sum(member, axis=-1)  # (B, S) full instance size
    gt_valid = jnp.arange(gt_size, dtype=jnp.int32) < jnp.minimum(cnt, gt_size)[..., None]

    b, s, g = idx.shape
    flat = jnp.take_along_axis(xyz, idx.reshape(b, s * g, 1), axis=1)
    gt_points = flat.reshape(b, s, g, 3) * gt_valid[..., None]

    w = member.astype(xyz.dtype)
    tot = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    gt_center = (
        jnp.einsum("bsn,bnc->bsc", w, xyz, precision=jax.lax.Precision.HIGHEST)
        / tot
    )
    return gt_points, gt_valid, gt_center, is_fg
