"""Fused ball query + group + center-subtract (multi-scale).

The reference composes three CUDA kernels per SA stage — ball query
(``tf_grouping_g.cu::query_ball_point_gpu``, a serial scan with early
break per query), ``group_point`` gathers, and a host-side center
subtract folded into the graph (SURVEY.md §2.1/§3.4). This kernel fuses
the whole ``sample_and_group`` neighborhood stage for every concentric
scale at once, with three structural wins over both the reference and
the round-1 kernels:

1. **Chunked scan with early exit, windowed extraction.** Dataset points
   are scanned in NC-lane chunks; per chunk, each query extracts its
   in-radius hits in ascending index order (identical to the serial
   first-come scan). The chunk loop is a ``while_loop`` that stops as
   soon as every query of every scale has ``nsample`` hits — the
   vectorized analog of the CUDA kernel's per-thread ``break``, which the
   round-1 full-width kernel could not do. Extraction is two-level
   (round 3): the per-hit min/select/sum passes — the kernel's dominant
   VPU cost, ~10 lane-reduce passes per extracted hit — run over static
   NW-lane *windows* of the chunk rather than the full NC lanes, cutting
   per-hit VPU work by NC/NW (the round-2 full-chunk extraction measured
   VPU-throughput-bound, not control-bound: taller query tiles and
   higher unroll both LOSE — see scripts/sweep_ballgroup.py).
2. **Fused gather.** Member coordinates are extracted from the same
   one-hot select that extracts the index, so the downstream
   ``group_point`` HBM gather for xyz disappears; outputs are local
   (center-subtracted) coordinate planes ready for the MLP.
3. **Concentric scales share one distance pass** (as in round 1's
   ``query_ball_point_multi``).

Semantics are oracle-exact to ``query_ball_point`` + ``group_point`` +
center subtract, including replicate-first padding, count capping, and
the empty-row convention (idx 0 => point 0's coordinates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gspn_tpu.ops.ball_query import (
    _ball_query_xla,
    _check_select,
    _lane_prefix_sum_exclusive,
)
from gspn_tpu.ops.common import resolve_impl, round_up
from gspn_tpu.ops.grouping import group_point

# Defaults from the on-chip sweep (scripts/sweep_ballgroup.py, v5e):
# big chunks + 1024-lane windows beat the round-2 (512, full-chunk
# extraction) layout by ~14% at the sa1 shape; taller query tiles,
# higher unroll, and narrow windows all measured WORSE (see module
# docstring for why).
_NC = 4096  # dataset points per chunk (early-exit granularity)
_NW = 1024  # window lanes: extraction + distance pass width
_UNROLL = 4  # extraction steps per loop iteration (over-steps are no-ops)
_TM = 128  # query rows per grid program (see _fused_pallas)
_SORT_Q = True  # Morton-sort queries before the kernel (see _fused_pallas;
#                 measured: sa1 5.62 -> 4.99 ms standalone on v5e)
def _check_extract(extract):
    """Shared validation for the extract= knob (also used by box_group):
    an unknown string must fail loudly, not silently run the serial
    schedule — A/B sweeps decide defaults from these arms."""
    if extract is not None and extract not in ("serial", "rank"):
        raise ValueError(
            f"extract must be serial|rank, got {extract!r}"
        )


_EXTRACT = "serial"  # "serial" | "rank" — see _fused_kernel. Both are
#                     oracle-exact first-K; "rank" replaces the serial
#                     min->select->invalidate latency chain with
#                     per-window precomputed arrival ranks + independent
#                     (pipelined) masked-sum extraction steps. Default set
#                     by the on-chip interleaved A/B
#                     (scripts/sweep_extract.py).


def _fused_kernel(
    rel_ref,  # (B*NT, 1 + nchunks) i32 SMEM, whole array: per (batch,
    #           query-tile) row = [nrel, ascending relevant chunk ids...]
    xyz_ref,  # (1, 8, Npad): rows 0..2 = x,y,z; row 3 = validity
    q_ref,  # (1, TM, 128): lanes 0..2 = query coords, lane 3 = validity
    *out_refs,  # per scale: idx (1,TM,Kpad) i32, cnt (1,TM,128) i32,
    #             [gx, gy, gz (1,TM,Kpad) f32 when with_coords]
    nsamples,
    r2s,
    n: int,
    nc: int,
    nw: int,
    ntiles: int,
    with_coords: bool,
    unroll: int,
    extract: str = "serial",
):
    npad = xyz_ref.shape[2]
    tm = q_ref.shape[1]
    nscales = len(nsamples)
    per = 5 if with_coords else 2

    qx = q_ref[0, :, 0:1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]
    qvalid = q_ref[0, :, 3:4] > 0.0  # (TM, 1)

    kpads = [out_refs[per * s].shape[2] for s in range(nscales)]
    kiotas = [
        jax.lax.broadcasted_iota(jnp.int32, (tm, kp), 1) for kp in kpads
    ]
    wiota = jax.lax.broadcasted_iota(jnp.int32, (tm, nw), 1)

    # ---- loop state: per scale (cnt, idx acc, [x, y, z accs])
    def init_scale(s):
        kp = kpads[s]
        # padded query rows start "done" so they never block early exit
        cnt = jnp.where(qvalid, 0, nsamples[s]).astype(jnp.int32)
        acc_i = jnp.zeros((tm, kp), jnp.int32)
        if with_coords:
            zero = jnp.zeros((tm, kp), jnp.float32)
            return (cnt, acc_i, zero, zero, zero)
        return (cnt, acc_i)

    def all_done(state):
        done = jnp.bool_(True)
        for s in range(nscales):
            done = jnp.logical_and(done, jnp.min(state[s][0]) >= nsamples[s])
        return done

    row = pl.program_id(0) * ntiles + pl.program_id(1)
    nrel = rel_ref[row, 0]

    def cond(carry):
        i, state = carry
        return jnp.logical_and(i < nrel, jnp.logical_not(all_done(state)))

    def body(carry):
        i, state = carry
        off = rel_ref[row, 1 + i] * nc
        # Window-major: sub-tiles are loaded FROM THE REFS at aligned
        # offsets (Mosaic rejects broadcasting lane-offset slices of
        # register values — "Invalid input layout"). Windows are processed
        # sequentially in ascending index order (exactly the serial scan);
        # the distance pass is shared across scales per window, and the
        # per-hit min/select/sum chains — the kernel's measured bound —
        # run at NW lanes. Parallel-segment extraction was measured and
        # REJECTED: real scenes cluster points by instance in index order,
        # so hits concentrate in one segment and the parallel variant
        # multiplies work by the segment count without cutting steps.
        st = state
        for w in range(nc // nw):
            base = off + w * nw
            x_w = xyz_ref[0, 0:1, pl.ds(base, nw)]  # (1, NW)
            y_w = xyz_ref[0, 1:2, pl.ds(base, nw)]
            z_w = xyz_ref[0, 2:3, pl.ds(base, nw)]
            vm_w = xyz_ref[0, 3:4, pl.ds(base, nw)] > 0.0
            dx = qx - x_w
            dy = qy - y_w
            dz = qz - z_w
            d2 = dx * dx + dy * dy + dz * dz  # (TM, NW)

            new_st = []
            for s in range(nscales):
                k = nsamples[s]
                st_s = st[s]
                cnt = st_s[0]
                # validity plane is zero beyond n: vm_w masks padding
                hit_w = jnp.logical_and(d2 < r2s[s], vm_w)
                pos0 = jnp.where(hit_w, wiota, nw)
                hits = jnp.sum(hit_w.astype(jnp.int32), axis=1, keepdims=True)
                need = jnp.maximum(jnp.minimum(hits, k - cnt), 0)
                tmax = jnp.max(need)

                if extract == "rank":
                    # ---- rank-order extraction (r4): arrival ranks are
                    # precomputed ONCE per window (exclusive prefix sum of
                    # the hit mask), so step u selects the rank-u hit with
                    # a pure elementwise compare — no min-reduce, no
                    # invalidation, and every step's masked-sum reduces
                    # are INDEPENDENT of the previous step (the serial
                    # mode's min->select->invalidate latency chain is the
                    # kernel's measured bound, STATUS r3). Identical
                    # first-K semantics: rank order IS arrival order.
                    hit_i = hit_w.astype(jnp.int32)
                    ranks = _lane_prefix_sum_exclusive(hit_i, wiota, nw)
                    cnt0 = cnt
                    zf = jnp.zeros((tm, nw), jnp.float32)
                    zi = jnp.zeros((tm, nw), jnp.int32)

                    def rank_step(u, st_, k=k, s=s, base=base,
                                  x_w=x_w, y_w=y_w, z_w=z_w,
                                  hit_w=hit_w, ranks=ranks, cnt0=cnt0,
                                  need=need, zf=zf, zi=zi):
                        if with_coords:
                            acc_i, ax, ay, az = st_
                        else:
                            (acc_i,) = st_
                        sel = jnp.logical_and(hit_w, ranks == u)
                        ok = u < need  # (TM, 1)
                        li = jnp.sum(
                            jnp.where(sel, wiota, zi), axis=1, keepdims=True
                        )
                        wk = jnp.logical_and(kiotas[s] == cnt0 + u, ok)
                        acc_i = jnp.where(wk, base + li, acc_i)
                        if with_coords:
                            cxv = jnp.sum(
                                jnp.where(sel, x_w, zf), axis=1, keepdims=True
                            )
                            cyv = jnp.sum(
                                jnp.where(sel, y_w, zf), axis=1, keepdims=True
                            )
                            czv = jnp.sum(
                                jnp.where(sel, z_w, zf), axis=1, keepdims=True
                            )
                            ax = jnp.where(wk, cxv, ax)
                            ay = jnp.where(wk, cyv, ay)
                            az = jnp.where(wk, czv, az)
                            return acc_i, ax, ay, az
                        return (acc_i,)

                    def rank_inner(i, st_, rank_step=rank_step):
                        # unrolled; over-steps no-op via the u < need guard
                        for j in range(unroll):
                            st_ = rank_step(i * unroll + j, st_)
                        return st_

                    stf = jax.lax.fori_loop(
                        0, (tmax + unroll - 1) // unroll, rank_inner,
                        tuple(st_s[1:]),
                    )
                    new_st.append((cnt + need,) + tuple(stf))
                    continue

                def inner_step(st_, k=k, s=s, base=base, x_w=x_w, y_w=y_w, z_w=z_w):
                    if with_coords:
                        pos, cnt, acc_i, ax, ay, az = st_
                    else:
                        pos, cnt, acc_i = st_
                    m = jnp.min(pos, axis=1, keepdims=True)  # (TM, 1)
                    ok = jnp.logical_and(m < nw, cnt < k)  # (TM, 1)
                    sel = pos == m  # one-hot over NW (or none if m == nw)
                    gidx = (base + jnp.where(m >= nw, 0, m)).astype(jnp.int32)
                    wk = jnp.logical_and(kiotas[s] == cnt, ok)
                    acc_i = jnp.where(wk, gidx, acc_i)
                    if with_coords:
                        zf = jnp.zeros((tm, nw), jnp.float32)
                        cxv = jnp.sum(jnp.where(sel, x_w, zf), axis=1, keepdims=True)
                        cyv = jnp.sum(jnp.where(sel, y_w, zf), axis=1, keepdims=True)
                        czv = jnp.sum(jnp.where(sel, z_w, zf), axis=1, keepdims=True)
                        ax = jnp.where(wk, cxv, ax)
                        ay = jnp.where(wk, cyv, ay)
                        az = jnp.where(wk, czv, az)
                    cnt = cnt + jnp.where(ok, 1, 0)
                    pos = jnp.where(jnp.logical_and(sel, ok), nw, pos)
                    if with_coords:
                        return pos, cnt, acc_i, ax, ay, az
                    return pos, cnt, acc_i

                def inner(t, st_, inner_step=inner_step):
                    # manual unroll: extra steps no-op via the ok-guards,
                    # so rounding tmax up is safe; amortizes loop control
                    for _ in range(unroll):
                        st_ = inner_step(st_)
                    return st_

                st0 = (pos0,) + tuple(st_s)
                stf = jax.lax.fori_loop(
                    0, (tmax + unroll - 1) // unroll, inner, st0
                )
                new_st.append(tuple(stf[1:]))
            st = tuple(new_st)
        return i + 1, st

    state0 = tuple(init_scale(s) for s in range(nscales))
    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state0))

    # point 0's coordinates: the empty-row convention (idx 0 gathers them)
    if with_coords:
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == 0
        zf0 = jnp.zeros((1, 128), jnp.float32)
        x0 = jnp.sum(jnp.where(lane0, xyz_ref[0, 0:1, 0:128], zf0))
        y0 = jnp.sum(jnp.where(lane0, xyz_ref[0, 1:2, 0:128], zf0))
        z0 = jnp.sum(jnp.where(lane0, xyz_ref[0, 2:3, 0:128], zf0))

    for s in range(nscales):
        k, kp = nsamples[s], kpads[s]
        kiota = kiotas[s]
        st = state[s]
        cnt = jnp.where(qvalid, st[0], 0)  # padded queries report 0
        acc_i = st[1]
        # replicate-first padding + zero empty rows
        lane0k = kiota == 0
        zi = jnp.zeros((tm, kp), jnp.int32)
        first_i = jnp.sum(jnp.where(lane0k, acc_i, zi), axis=1, keepdims=True)
        filled = kiota < cnt
        acc_i = jnp.where(filled, acc_i, first_i)
        acc_i = jnp.where(cnt > 0, acc_i, 0)
        out_refs[per * s][0, :, :] = acc_i
        cnt_out = jnp.broadcast_to(cnt, (tm, 128)).astype(jnp.int32)
        out_refs[per * s + 1][0, :, :] = cnt_out
        if with_coords:
            zfk = jnp.zeros((tm, kp), jnp.float32)
            for d, (acc, qd, p0) in enumerate(
                zip(st[2:5], (qx, qy, qz), (x0, y0, z0), strict=True)
            ):
                first_c = jnp.sum(
                    jnp.where(lane0k, acc, zfk), axis=1, keepdims=True
                )
                acc = jnp.where(filled, acc, first_c)
                acc = jnp.where(cnt > 0, acc, p0)  # empty row: point 0
                out_refs[per * s + 2 + d][0, :, :] = acc - qd  # local frame
    # (padded grid rows beyond M are sliced away by the caller)


def _fused_kernel_strided(
    rel_ref,  # (B*NT, 1 + nchunks) i32 SMEM (see _fused_kernel)
    xyz_ref,  # (1, 8, Npad): rows 0..2 = x,y,z; row 3 = validity
    q_ref,  # (1, TM, 128): lanes 0..2 = query coords, lane 3 = validity
    *out_refs,
    nsamples,
    r2s,
    n: int,
    nc: int,
    nw: int,
    ntiles: int,
    with_coords: bool,
    unroll: int,
    pred: str = "ball",
):
    """``select="strided"`` schedule: systematic sample of the FULL
    ascending candidate list (``hits[floor(j*total/K)]`` once a query has
    ``total > K`` candidates; identical to first-K otherwise). The
    subsample-robust grouping mode for spatially-coherent raw layouts,
    where first-K-in-index-order collapses a ball's sample to its
    z-order-lowest corner (STATUS.md round-4 mechanism study).

    Selection positions depend on ``total``, so the scan is TWO-phase
    (both AABB-pruned to relevant chunks, neither early-exits):
      1. count: distance passes only -> per-scale totals. Cheap — no
         per-hit extraction work.
      2. extract: per window, arrival ranks via one roll-doubling prefix
         sum; the slots whose global target rank falls in this window
         (a dynamic ``[jlo, jhi)`` range, K steps TOTAL across all
         windows — same step count as the serial first-K chain) are
         filled with INDEPENDENT masked-sum selects (no dependent
         min->invalidate chain, like the r4 "rank" mode).

    ``pred="box"`` (used by ops/box_group.py): the hit predicate is
    per-query box containment (q lanes 0-2 lo corner, 3-5 hi corner,
    lane 6 validity) and grouped coordinates are centered on the BOX
    CENTER; single scale (``nsamples=(s,)``, ``r2s`` unused).
    """
    tm = q_ref.shape[1]
    nscales = len(nsamples)
    per = 5 if with_coords else 2

    if pred == "box":
        qlo = [q_ref[0, :, d : d + 1] for d in range(3)]  # (TM, 1) each
        qhi = [q_ref[0, :, 3 + d : 4 + d] for d in range(3)]
        qvalid = q_ref[0, :, 6:7] > 0.0  # (TM, 1)
        # output frame origin (box center); reuse the qx/qy/qz names
        qx = (qlo[0] + qhi[0]) * 0.5
        qy = (qlo[1] + qhi[1]) * 0.5
        qz = (qlo[2] + qhi[2]) * 0.5
    else:
        qx = q_ref[0, :, 0:1]
        qy = q_ref[0, :, 1:2]
        qz = q_ref[0, :, 2:3]
        qvalid = q_ref[0, :, 3:4] > 0.0  # (TM, 1)

    kpads = [out_refs[per * s].shape[2] for s in range(nscales)]
    kiotas = [
        jax.lax.broadcasted_iota(jnp.int32, (tm, kp), 1) for kp in kpads
    ]
    wiota = jax.lax.broadcasted_iota(jnp.int32, (tm, nw), 1)

    row = pl.program_id(0) * ntiles + pl.program_id(1)
    nrel = rel_ref[row, 0]

    def window_hits(off, w):
        base = off + w * nw
        x_w = xyz_ref[0, 0:1, pl.ds(base, nw)]  # (1, NW)
        y_w = xyz_ref[0, 1:2, pl.ds(base, nw)]
        z_w = xyz_ref[0, 2:3, pl.ds(base, nw)]
        vm_w = xyz_ref[0, 3:4, pl.ds(base, nw)] > 0.0
        if pred == "box":
            inb = vm_w
            for lo, hi, p_w in zip(qlo, qhi, (x_w, y_w, z_w), strict=True):
                inb = jnp.logical_and(
                    inb, jnp.logical_and(p_w >= lo, p_w <= hi)
                )

            def hit_for(s, inb=inb):
                return inb
        else:
            dx = qx - x_w
            dy = qy - y_w
            dz = qz - z_w
            d2 = dx * dx + dy * dy + dz * dz  # (TM, NW)

            def hit_for(s, d2=d2, vm_w=vm_w):
                return jnp.logical_and(d2 < r2s[s], vm_w)

        return base, x_w, y_w, z_w, hit_for

    # ---- phase 1: per-scale candidate totals (uncapped)
    def count_body(i, totals):
        off = rel_ref[row, 1 + i] * nc
        for w in range(nc // nw):
            _, _, _, _, hit_for = window_hits(off, w)
            # padded query rows contribute no hits (no extraction work)
            totals = tuple(
                totals[s]
                + jnp.sum(
                    jnp.logical_and(hit_for(s), qvalid).astype(jnp.int32),
                    axis=1,
                    keepdims=True,
                )
                for s in range(nscales)
            )
        return totals

    totals0 = tuple(jnp.zeros((tm, 1), jnp.int32) for _ in range(nscales))
    totals = jax.lax.fori_loop(0, nrel, count_body, totals0)

    # ---- phase 2: targeted extraction
    def init_scale(s):
        kp = kpads[s]
        cum = jnp.zeros((tm, 1), jnp.int32)
        acc_i = jnp.zeros((tm, kp), jnp.int32)
        if with_coords:
            zero = jnp.zeros((tm, kp), jnp.float32)
            return (cum, acc_i, zero, zero, zero)
        return (cum, acc_i)

    def body(i, state):
        off = rel_ref[row, 1 + i] * nc
        st = state
        for w in range(nc // nw):
            base, x_w, y_w, z_w, hit_for = window_hits(off, w)
            new_st = []
            for s in range(nscales):
                k = nsamples[s]
                total = totals[s]
                st_s = st[s]
                cum = st_s[0]
                hit_w = jnp.logical_and(hit_for(s), qvalid)
                hit_i = hit_w.astype(jnp.int32)
                hw = jnp.sum(hit_i, axis=1, keepdims=True)
                ranks = _lane_prefix_sum_exclusive(hit_i, wiota, nw)
                tot = jnp.maximum(total, 1)
                over = total > k
                # slot j's target rank t(j) = floor(j*total/k) if over
                # else j; slots landing in [cum, cum+hw):
                jlo = jnp.where(over, (cum * k + total - 1) // tot, cum)
                jhi = jnp.where(
                    over, ((cum + hw) * k + total - 1) // tot, cum + hw
                )
                jhi = jnp.minimum(jhi, k)
                tmax = jnp.max(jhi - jlo)
                zf = jnp.zeros((tm, nw), jnp.float32)
                zi = jnp.zeros((tm, nw), jnp.int32)

                def step(u, st_, k=k, s=s, base=base, x_w=x_w, y_w=y_w,
                         z_w=z_w, hit_w=hit_w, ranks=ranks, jlo=jlo,
                         jhi=jhi, cum=cum, total=total, tot=tot, over=over,
                         zf=zf, zi=zi):
                    if with_coords:
                        acc_i, ax, ay, az = st_
                    else:
                        (acc_i,) = st_
                    j = jlo + u  # (TM, 1)
                    ok = j < jhi
                    tgt = jnp.where(over, (j * total) // k, j)
                    sel = jnp.logical_and(hit_w, ranks == tgt - cum)
                    li = jnp.sum(
                        jnp.where(sel, wiota, zi), axis=1, keepdims=True
                    )
                    wk = jnp.logical_and(kiotas[s] == j, ok)
                    acc_i = jnp.where(wk, base + li, acc_i)
                    if with_coords:
                        cxv = jnp.sum(
                            jnp.where(sel, x_w, zf), axis=1, keepdims=True
                        )
                        cyv = jnp.sum(
                            jnp.where(sel, y_w, zf), axis=1, keepdims=True
                        )
                        czv = jnp.sum(
                            jnp.where(sel, z_w, zf), axis=1, keepdims=True
                        )
                        ax = jnp.where(wk, cxv, ax)
                        ay = jnp.where(wk, cyv, ay)
                        az = jnp.where(wk, czv, az)
                        return acc_i, ax, ay, az
                    return (acc_i,)

                def inner(i_, st_, step=step):
                    # unrolled; over-steps no-op via the j < jhi guard
                    for u in range(unroll):
                        st_ = step(i_ * unroll + u, st_)
                    return st_

                stf = jax.lax.fori_loop(
                    0, (tmax + unroll - 1) // unroll, inner,
                    tuple(st_s[1:]),
                )
                new_st.append((cum + hw,) + tuple(stf))
            st = tuple(new_st)
        return st

    state0 = tuple(init_scale(s) for s in range(nscales))
    state = jax.lax.fori_loop(0, nrel, body, state0)

    # point 0's coordinates: the empty-row convention (idx 0 gathers them)
    if with_coords:
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == 0
        zf0 = jnp.zeros((1, 128), jnp.float32)
        x0 = jnp.sum(jnp.where(lane0, xyz_ref[0, 0:1, 0:128], zf0))
        y0 = jnp.sum(jnp.where(lane0, xyz_ref[0, 1:2, 0:128], zf0))
        z0 = jnp.sum(jnp.where(lane0, xyz_ref[0, 2:3, 0:128], zf0))

    for s in range(nscales):
        k, kp = nsamples[s], kpads[s]
        kiota = kiotas[s]
        st = state[s]
        cnt = jnp.minimum(totals[s], k)
        cnt = jnp.where(qvalid, cnt, 0)  # padded queries report 0
        acc_i = st[1]
        # replicate-first padding + zero empty rows
        lane0k = kiota == 0
        zi = jnp.zeros((tm, kp), jnp.int32)
        first_i = jnp.sum(jnp.where(lane0k, acc_i, zi), axis=1, keepdims=True)
        filled = kiota < cnt
        acc_i = jnp.where(filled, acc_i, first_i)
        acc_i = jnp.where(cnt > 0, acc_i, 0)
        out_refs[per * s][0, :, :] = acc_i
        cnt_out = jnp.broadcast_to(cnt, (tm, 128)).astype(jnp.int32)
        out_refs[per * s + 1][0, :, :] = cnt_out
        if with_coords:
            zfk = jnp.zeros((tm, kp), jnp.float32)
            for d, (acc, qd, p0) in enumerate(
                zip(st[2:5], (qx, qy, qz), (x0, y0, z0), strict=True)
            ):
                first_c = jnp.sum(
                    jnp.where(lane0k, acc, zfk), axis=1, keepdims=True
                )
                acc = jnp.where(filled, acc, first_c)
                acc = jnp.where(cnt > 0, acc, p0)  # empty row: point 0
                out_refs[per * s + 2 + d][0, :, :] = acc - qd  # local frame


def _relevant_chunks(radii, xyz1, xyz2, valid1, nc, npad, tm, mpad):
    """Per (batch, query-tile): ascending ids of point chunks whose AABB is
    within max(radii) of the tile's AABB, plus counts. Chunks farther away
    cannot contain a hit for any query in the tile (exact pruning); on
    Morton-sorted scenes (ops.morton) most chunks prune away."""
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    nchunks = npad // nc
    ntiles = mpad // tm
    big = jnp.float32(1e30)
    x1 = xyz1.astype(jnp.float32)
    if valid1 is not None:
        v3 = valid1[..., None]
        x_lo = jnp.where(v3, x1, big)
        x_hi = jnp.where(v3, x1, -big)
    else:
        x_lo = x_hi = x1
    pad = ((0, 0), (0, npad - n), (0, 0))
    x_lo = jnp.pad(x_lo, pad, constant_values=1e30)
    x_hi = jnp.pad(x_hi, pad, constant_values=-1e30)
    clo = jnp.min(x_lo.reshape(b, nchunks, nc, 3), axis=2)  # (B, NCH, 3)
    chi = jnp.max(x_hi.reshape(b, nchunks, nc, 3), axis=2)

    q = xyz2.astype(jnp.float32)
    qpad = ((0, 0), (0, mpad - m), (0, 0))
    q_lo = jnp.pad(q, qpad, constant_values=1e30)
    q_hi = jnp.pad(q, qpad, constant_values=-1e30)
    tlo = jnp.min(q_lo.reshape(b, ntiles, tm, 3), axis=2)  # (B, NT, 3)
    thi = jnp.max(q_hi.reshape(b, ntiles, tm, 3), axis=2)

    gap = jnp.maximum(
        jnp.maximum(tlo[:, :, None, :] - chi[:, None, :, :], 0.0),
        jnp.maximum(clo[:, None, :, :] - thi[:, :, None, :], 0.0),
    )  # (B, NT, NCH, 3)
    # clamp the +-1e30 sentinel gaps so squaring cannot overflow to inf
    gap = jnp.minimum(gap, 1e15)
    d2 = jnp.sum(gap * gap, axis=-1)
    rmax = max(float(r) for r in radii)
    mask = d2 <= jnp.float32(rmax) ** 2
    ids = jnp.sort(
        jnp.where(mask, jnp.arange(nchunks, dtype=jnp.int32), nchunks),
        axis=-1,
    )
    nrel = jnp.sum(mask, axis=-1).astype(jnp.int32)  # (B, NT)
    packed = jnp.concatenate([nrel[..., None], ids], axis=-1)
    return packed.reshape(b * ntiles, 1 + nchunks)


def _fused_pallas(
    radii, nsamples, xyz1, xyz2, valid1, with_coords, interpret,
    extract=None, select="first",
):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    nw = min(_NW, round_up(n, 128))
    nc = round_up(min(_NC, round_up(n, 128)), nw)  # whole windows per chunk
    npad = round_up(n, nc)
    tm = min(_TM, round_up(m, 8))
    mpad = round_up(m, tm)

    # Morton-sort the QUERIES (not the scene — measured loser, see
    # docstring): a tile of spatially coherent queries hits few windows,
    # so the per-window worst-row step count Sum_w tmax_w collapses
    # toward K instead of (#clusters-in-tile x K). Per-query results are
    # order-independent, so outputs are un-permuted afterwards —
    # bit-exact either way.
    inv = None
    if _SORT_Q and m > tm:
        from gspn_tpu.ops.morton import spatial_order

        perm = spatial_order(xyz2)
        xyz2 = jnp.take_along_axis(xyz2, perm[..., None], axis=1)
        inv = jnp.argsort(perm, axis=-1)

    planes = jnp.zeros((b, 8, npad), jnp.float32)
    planes = planes.at[:, 0:3, :n].set(
        jnp.swapaxes(xyz1.astype(jnp.float32), 1, 2)
    )
    if valid1 is None:
        planes = planes.at[:, 3, :n].set(1.0)
    else:
        planes = planes.at[:, 3, :n].set(valid1.astype(jnp.float32))
    q = jnp.zeros((b, mpad, 128), jnp.float32)
    q = q.at[:, :m, 0:3].set(xyz2.astype(jnp.float32))
    q = q.at[:, :m, 3].set(1.0)
    rel = _relevant_chunks(radii, xyz1, xyz2, valid1, nc, npad, tm, mpad)

    per = 5 if with_coords else 2
    kpads = [round_up(k, 128) for k in nsamples]
    out_specs, out_shapes = [], []
    for kp in kpads:
        specs = [
            ((1, tm, kp), jnp.int32),
            ((1, tm, 128), jnp.int32),
        ]
        if with_coords:
            specs += [((1, tm, kp), jnp.float32)] * 3
        for shape, dt in specs:
            out_specs.append(
                pl.BlockSpec(shape, lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
            )
            out_shapes.append(
                jax.ShapeDtypeStruct((b, mpad, shape[2]), dt)
            )

    # live (tm, nc) f32 buffers in the extraction loop (pos/d2/hit/sel/...)
    # plus per-scale (tm, kpad) accumulators: raise the scoped-VMEM cap
    # above the 16 MB compiler default for tall tiles
    need = tm * nc * 4 * 10 + sum(
        tm * kp * 4 * (5 if with_coords else 2) for kp in kpads
    ) + 8 * npad * 4 + (4 << 20)
    params = (
        {"compiler_params": pltpu.CompilerParams(vmem_limit_bytes=need)}
        if need > 16 * 1024 * 1024
        else {}
    )
    common = dict(
        nsamples=tuple(int(k) for k in nsamples),
        r2s=tuple(float(r) ** 2 for r in radii),
        n=n,
        nc=nc,
        nw=nw,
        ntiles=mpad // tm,
        with_coords=with_coords,
        unroll=_UNROLL,
    )
    if select == "strided":
        kernel = functools.partial(_fused_kernel_strided, **common)
    else:
        kernel = functools.partial(
            _fused_kernel,
            extract=extract if extract is not None else _EXTRACT,
            **common,
        )
    outs = pl.pallas_call(
        kernel,
        grid=(b, mpad // tm),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole rel table
            pl.BlockSpec((1, 8, npad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        **params,
    )(rel, planes, q)

    results = []
    for s, (k, kp) in enumerate(zip(nsamples, kpads, strict=True)):
        idx = outs[per * s][:, :m, :k]
        cnt = outs[per * s + 1][:, :m, 0]
        if inv is not None:  # undo the query sort
            idx = jnp.take_along_axis(idx, inv[..., None], axis=1)
            cnt = jnp.take_along_axis(cnt, inv, axis=1)
        if with_coords:
            gx = outs[per * s + 2][:, :m, :k]
            gy = outs[per * s + 3][:, :m, :k]
            gz = outs[per * s + 4][:, :m, :k]
            grouped = jnp.stack([gx, gy, gz], axis=-1)  # (B, M, K, 3)
            if inv is not None:
                grouped = jnp.take_along_axis(
                    grouped, inv[..., None, None], axis=1
                )
            results.append((idx, cnt, grouped))
        else:
            results.append((idx, cnt))
    return results


def query_ball_group_multi(
    radii,
    nsamples,
    xyz1,
    xyz2,
    valid1=None,
    *,
    impl: str = "auto",
    interpret: bool | None = None,
    extract: str | None = None,
    select: str | None = None,
):
    """Fused multi-scale ball query + group + center subtract.

    Args:
      radii/nsamples: per-scale ball radii and group sizes (concentric
        scales share one distance computation).
      xyz1: (B, N, 3) dataset points.
      xyz2: (B, M, 3) query centers.
      valid1: optional (B, N) dataset validity mask.
      extract: extraction schedule, "serial" | "rank" (default: the
        module's swept ``_EXTRACT``); both are oracle-exact first-K.
      select: "first" (default; reference first-K-in-input-order) |
        "strided" (systematic sample of the full candidate list once
        count > K — the subsample-robust mode for spatially-coherent
        layouts; runs its own two-phase schedule, see
        ``_fused_kernel_strided``; ``extract`` is ignored).

    Returns per scale: ``(idx (B,M,K) i32, cnt (B,M) i32,
    grouped_local (B,M,K,3) f32)`` where ``grouped_local`` ==
    ``group_point(xyz1, idx) - xyz2[:, :, None, :]`` bit-for-bit.
    """
    _check_extract(extract)
    _check_select(select)
    select = select or "first"
    choice = resolve_impl(impl)
    if choice == "pallas" and xyz1.shape[1] <= 131072:
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return _fused_pallas(
            radii, nsamples, xyz1, xyz2, valid1, True, interpret,
            extract=extract, select=select,
        )
    results = []
    for r, k in zip(radii, nsamples, strict=True):
        idx, cnt = _ball_query_xla(r, k, xyz1, xyz2, valid1, select=select)
        grouped = group_point(xyz1, idx) - xyz2[:, :, None, :].astype(
            jnp.float32
        )
        results.append((idx, cnt, grouped))
    return results


def query_ball_multi_v2(
    radii,
    nsamples,
    xyz1,
    xyz2,
    valid1=None,
    *,
    impl: str = "auto",
    interpret: bool | None = None,
    extract: str | None = None,
    select: str | None = None,
):
    """Index-only variant on the chunked early-exit kernel (drop-in for
    ``query_ball_point_multi``; same return convention)."""
    _check_extract(extract)
    _check_select(select)
    select = select or "first"
    choice = resolve_impl(impl)
    if choice == "pallas" and xyz1.shape[1] <= 131072:
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return _fused_pallas(
            radii, nsamples, xyz1, xyz2, valid1, False, interpret,
            extract=extract, select=select,
        )
    return [
        _ball_query_xla(r, k, xyz1, xyz2, valid1, select=select)
        for r, k in zip(radii, nsamples, strict=True)
    ]
