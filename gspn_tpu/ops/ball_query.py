"""Ball query (fixed-radius neighborhood search).

Behavioral contract (reference: ``tf_ops/grouping/tf_grouping_g.cu``,
``query_ball_point_gpu`` — reconstructed, see SURVEY.md §2.1):

``query_ball_point(radius, nsample, xyz1, xyz2)`` with dataset points
``xyz1 (B, N, 3)`` and query centers ``xyz2 (B, M, 3)`` returns
``idx (B, M, nsample) i32`` and ``pts_cnt (B, M) i32``. For each query the
dataset is scanned **in input order**; indices with squared distance
strictly below ``radius**2`` are collected until ``nsample`` are found.
On the first hit all ``nsample`` slots are pre-filled with that index
(replicate-first padding — load-bearing for the downstream max-pool).
``pts_cnt`` is the number of hits, capped at ``nsample``. If a query has no
hits, its row is all zeros with count 0. No gradient.

Because the scan is in input order, the collected indices are exactly the
``nsample`` smallest hit indices in ascending order — which is how both the
XLA path (masked ``top_k``) and the Pallas kernel (iterative masked min over
a VMEM-resident position matrix) compute them, with no sequential scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gspn_tpu.ops.common import pairwise_sqdist, resolve_impl, round_up


def _finalize(idx_asc: jax.Array, cnt: jax.Array, nsample: int):
    """Apply replicate-first padding + zero rows for empty queries."""
    first = idx_asc[..., 0:1]
    k_iota = jnp.arange(nsample, dtype=jnp.int32)
    idx = jnp.where(k_iota < cnt[..., None], idx_asc, first)
    idx = jnp.where(cnt[..., None] > 0, idx, 0)
    return idx.astype(jnp.int32), cnt.astype(jnp.int32)


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------


def _check_select(select):
    """Shared validation for the select= knob (also used by ball_group /
    box_group): an unknown string must fail loudly."""
    if select is not None and select not in ("first", "strided"):
        raise ValueError(f"select must be first|strided, got {select!r}")


def _strided_target_mask(hit, nsample):
    """Refine a (B, M, N) hit mask to the ``select="strided"`` subset:
    when a query has ``total > nsample`` candidates, keep candidate rank
    ``floor(j * total / nsample)`` for j = 0..nsample-1 (a systematic
    sample of the ascending candidate list — spatially unbiased when the
    point layout is spatially coherent, where first-K collapses to the
    ball's z-lowest corner; STATUS.md round-4 mechanism note). When
    ``total <= nsample`` the mask is unchanged (== first-K)."""
    hit_i = hit.astype(jnp.int32)
    total = jnp.sum(hit_i, axis=-1, keepdims=True)  # (B, M, 1)
    rank = jnp.cumsum(hit_i, axis=-1) - hit_i  # exclusive, (B, M, N)
    # rank r is a target iff exists j < nsample: floor(j*total/ns) == r
    # <=> j = ceil(r*ns/total) satisfies j*total < r*ns + ns and j < ns
    j = (rank * nsample + total - 1) // jnp.maximum(total, 1)
    target = jnp.logical_and(
        j * total < rank * nsample + nsample, j < nsample
    )
    return jnp.logical_and(hit, jnp.logical_or(total <= nsample, target))


def _ball_query_xla(radius, nsample, xyz1, xyz2, valid1, select="first"):
    n = xyz1.shape[-2]
    d2 = pairwise_sqdist(xyz2, xyz1)  # (B, M, N)
    hit = d2 < radius * radius
    if valid1 is not None:
        hit = jnp.logical_and(hit, valid1[..., None, :])
    cnt = jnp.minimum(jnp.sum(hit, axis=-1), nsample).astype(jnp.int32)
    if select == "strided":
        hit = _strided_target_mask(hit, nsample)
    pos = jnp.where(hit, jnp.arange(n, dtype=jnp.int32), n)
    # nsample smallest positions in ascending order == first-come scan order
    neg_top, _ = jax.lax.top_k(-pos, nsample)
    idx_asc = -neg_top
    idx_asc = jnp.where(idx_asc >= n, 0, idx_asc)  # unfilled slots, masked later
    return _finalize(idx_asc, cnt, nsample)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Pallas kernel — multi-radius form; the single-radius public op is the
# one-scale special case (concentric scales share one distance computation)
# ---------------------------------------------------------------------------


def _lane_prefix_sum_exclusive(hit_i, iota, width: int):
    """Exclusive lane-axis prefix sum via Hillis-Steele roll-doubling
    (Mosaic has no cumsum lowering); wrapped lanes masked by ``iota``."""
    from jax.experimental.pallas import tpu as _pltpu

    s = hit_i
    d = 1
    while d < width:
        r = _pltpu.roll(s, d, axis=1)
        s = s + jnp.where(iota >= d, r, 0)
        d *= 2
    return s - hit_i


def _ball_query_multi_kernel(
    xyz1_ref, xyz2_ref, valid_ref, *out_refs, nsamples, r2s, n,
    select="first",
):
    """Like _ball_query_kernel but extracts every radius's neighborhood
    from ONE (TM, Npad) distance tile — GSPN's concentric context crops
    (SURVEY.md §3.1) pay for the pairwise distances once instead of once
    per scale. Outputs alternate (idx_s, cnt_s) per scale."""
    npad = xyz1_ref.shape[2]
    tm = xyz2_ref.shape[1]
    x1 = xyz1_ref[0, 0:1, :]
    y1 = xyz1_ref[0, 1:2, :]
    z1 = xyz1_ref[0, 2:3, :]
    qx = xyz2_ref[0, :, 0:1]
    qy = xyz2_ref[0, :, 1:2]
    qz = xyz2_ref[0, :, 2:3]
    dx = qx - x1
    dy = qy - y1
    dz = qz - z1
    d2 = dx * dx + dy * dy + dz * dz  # (TM, Npad) — shared across scales
    vmask = valid_ref[0, 0:1, :] > 0.0
    iota = jax.lax.broadcasted_iota(jnp.int32, (tm, npad), 1)

    for s, (nsample, r2) in enumerate(zip(nsamples, r2s, strict=True)):
        idx_ref, cnt_ref = out_refs[2 * s], out_refs[2 * s + 1]
        kpad = idx_ref.shape[2]
        kiota = jax.lax.broadcasted_iota(jnp.int32, (tm, kpad), 1)
        hit = jnp.logical_and(d2 < r2, vmask)
        cnt = jnp.minimum(
            jnp.sum(hit.astype(jnp.int32), axis=1, keepdims=True), nsample
        )
        cnt_ref[0, :, 0:1] = cnt
        if select == "strided":
            # systematic sample of the candidate list (see
            # _strided_target_mask): the whole hit mask is in-register
            # here, so one lane prefix sum refines it directly
            hit_i = hit.astype(jnp.int32)
            total = jnp.sum(hit_i, axis=1, keepdims=True)
            rank = _lane_prefix_sum_exclusive(hit_i, iota, npad)
            j = (rank * nsample + total - 1) // jnp.maximum(total, 1)
            target = jnp.logical_and(
                j * total < rank * nsample + nsample, j < nsample
            )
            hit = jnp.logical_and(
                hit, jnp.logical_or(total <= nsample, target)
            )
        pos0 = jnp.where(hit, iota, n)

        def body(k, carry):
            pos, acc = carry
            m = jnp.min(pos, axis=1, keepdims=True)
            mval = jnp.where(m >= n, 0, m)
            acc = jnp.where(kiota == k, mval, acc)
            pos = jnp.where(pos == m, n, pos)
            return pos, acc

        acc0 = jnp.zeros((tm, kpad), jnp.int32)
        _, acc = jax.lax.fori_loop(0, jnp.max(cnt), body, (pos0, acc0))
        idx_ref[0, :, :] = acc


def query_ball_point_multi(
    radii,
    nsamples,
    xyz1,
    xyz2,
    valid1=None,
    *,
    impl: str = "auto",
    interpret: bool | None = None,
    select: str | None = None,
):
    """Concentric multi-radius ball query: one pairwise-distance pass,
    one (idx, cnt) pair per scale. Semantics of each scale are identical
    to :func:`query_ball_point`.

    Returns a list of (idx (B,M,K_s) i32, cnt (B,M) i32) per scale.
    """
    _check_select(select)
    select = select or "first"
    choice = resolve_impl(impl)
    if choice != "pallas":
        return [
            _ball_query_xla(r, k, xyz1, xyz2, valid1, select=select)
            for r, k in zip(radii, nsamples, strict=True)
        ]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    npad = round_up(n, 128)
    tm = min(128, round_up(m, 8))
    mpad = round_up(m, tm)

    x1t = jnp.zeros((b, 8, npad), jnp.float32)
    x1t = x1t.at[:, 0:3, :n].set(jnp.swapaxes(xyz1.astype(jnp.float32), 1, 2))
    vrow = jnp.zeros((b, 8, npad), jnp.float32)
    if valid1 is None:
        vrow = vrow.at[:, 0, :n].set(1.0)
    else:
        vrow = vrow.at[:, 0, :n].set(valid1.astype(jnp.float32))
    q = jnp.full((b, mpad, 128), 1e9, jnp.float32)
    q = q.at[:, :m, 0:3].set(xyz2.astype(jnp.float32))

    kpads = [round_up(k, 128) for k in nsamples]
    out_specs = []
    out_shapes = []
    for kpad in kpads:
        out_specs += [
            pl.BlockSpec((1, tm, kpad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((b, mpad, kpad), jnp.int32),
            jax.ShapeDtypeStruct((b, mpad, 128), jnp.int32),
        ]

    outs = pl.pallas_call(
        functools.partial(
            _ball_query_multi_kernel,
            nsamples=tuple(nsamples),
            r2s=tuple(float(r) ** 2 for r in radii),
            n=n,
            select=select,
        ),
        grid=(b, mpad // tm),
        in_specs=[
            pl.BlockSpec((1, 8, npad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, npad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x1t, q, vrow)

    results = []
    for s, (k, kpad) in enumerate(zip(nsamples, kpads, strict=True)):
        idx_asc = outs[2 * s][:, :m, :k]
        cnt = outs[2 * s + 1][:, :m, 0]
        results.append(_finalize(idx_asc, cnt, k))
    return results


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def query_ball_point(
    radius: float,
    nsample: int,
    xyz1: jax.Array,
    xyz2: jax.Array,
    valid1: jax.Array | None = None,
    *,
    impl: str = "auto",
    interpret: bool | None = None,
    select: str | None = None,
):
    """Fixed-radius neighborhood indices with replicate-first padding.

    Args:
      radius: ball radius (strict ``<`` comparison on squared distance).
      nsample: max neighbors per query (static).
      xyz1: ``(B, N, 3)`` dataset points.
      xyz2: ``(B, M, 3)`` query centers.
      valid1: optional ``(B, N)`` bool mask for padded dataset points.
      select: which ``nsample`` of a larger candidate set fill the slots —
        "first" (default; the reference's first-K-in-input-order scan) or
        "strided" (systematic sample of the full ascending candidate
        list, ``hits[floor(j * total / nsample)]`` — the subsample-robust
        mode for spatially-coherent point layouts where first-K collapses
        to the ball's z-lowest corner). Identical when count <= nsample;
        padding/count semantics are preserved either way.

    Returns:
      ``idx (B, M, nsample) int32``, ``pts_cnt (B, M) int32``.
    """
    if xyz1.ndim != 3 or xyz2.ndim != 3:
        raise ValueError("xyz1/xyz2 must be (B, N, 3)/(B, M, 3)")
    _check_select(select)
    choice = resolve_impl(impl)
    if choice == "pallas":
        return query_ball_point_multi(
            (radius,), (nsample,), xyz1, xyz2, valid1,
            impl="pallas", interpret=interpret, select=select,
        )[0]
    return _ball_query_xla(
        radius, nsample, xyz1, xyz2, valid1, select=select or "first"
    )
