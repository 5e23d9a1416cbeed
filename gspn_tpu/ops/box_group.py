"""Fused in-box query + group for Point RoIAlign.

The reference's Point RoIAlign samples, for every proposal box, the
first ``s`` scene points (input order) whose coordinates fall inside the
axis-aligned box (SURVEY.md §2.2 (c): crop-and-sample with a fixed
budget). The XLA formulation — a (B, R, N) containment mask plus
``top_k(-pos, s)`` — pays a full-width sort-like pass per RoI row; this
kernel reuses the chunked early-exit extraction machinery of
``ops/ball_group.py`` (windowed scan, per-hit min/select chain, measured
knobs _NC/_NW/_UNROLL) with two changes only:

1. the hit predicate is per-query box containment (lanes 0-2 of the
   query ref hold the box lo corner, lanes 3-5 the hi corner) instead of
   a shared-radius distance test;
2. the grouped output is centered on the BOX CENTER (the RoI canonical
   frame's origin) instead of the query point.

Semantics are oracle-exact to the mask+top_k path: first-``s`` hits in
ascending index order, replicate-first padding, cnt capped at ``s``,
empty rows report idx 0 / point 0's coordinates. The cycling wrap
(slot k -> hit[k mod cnt]) stays outside — it is a cheap (B, R, S)
lane gather the caller applies (models/rpointnet.py::point_roi_align).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gspn_tpu.ops import ball_group as _bg
from gspn_tpu.ops.common import resolve_impl, round_up


def _box_kernel(
    rel_ref,  # (B*NT, 1 + nchunks) i32 SMEM: [nrel, chunk ids...] per row
    xyz_ref,  # (1, 8, Npad): rows 0..2 = x,y,z; row 3 = validity
    q_ref,  # (1, TM, 128): lanes 0-2 box lo, 3-5 box hi, 6 row validity
    idx_ref,  # (1, TM, Kpad) i32
    cnt_ref,  # (1, TM, 128) i32
    *coord_refs,  # [gx, gy, gz (1, TM, Kpad) f32] when with_coords
    k: int,
    nc: int,
    nw: int,
    ntiles: int,
    with_coords: bool,
    unroll: int,
    extract: str = "serial",
):
    tm = q_ref.shape[1]
    kp = idx_ref.shape[2]

    qlo = [q_ref[0, :, d : d + 1] for d in range(3)]  # (TM, 1) each
    qhi = [q_ref[0, :, 3 + d : 4 + d] for d in range(3)]
    qvalid = q_ref[0, :, 6:7] > 0.0  # (TM, 1)

    kiota = jax.lax.broadcasted_iota(jnp.int32, (tm, kp), 1)
    wiota = jax.lax.broadcasted_iota(jnp.int32, (tm, nw), 1)

    # padded grid rows start "done" so they never block the early exit
    cnt0 = jnp.where(qvalid, 0, k).astype(jnp.int32)
    acc0 = jnp.zeros((tm, kp), jnp.int32)
    if with_coords:
        zero = jnp.zeros((tm, kp), jnp.float32)
        state0 = (cnt0, acc0, zero, zero, zero)
    else:
        state0 = (cnt0, acc0)

    row = pl.program_id(0) * ntiles + pl.program_id(1)
    nrel = rel_ref[row, 0]

    def cond(carry):
        i, state = carry
        return jnp.logical_and(i < nrel, jnp.min(state[0]) < k)

    def body(carry):
        i, st = carry
        off = rel_ref[row, 1 + i] * nc
        for w in range(nc // nw):
            base = off + w * nw
            x_w = xyz_ref[0, 0:1, pl.ds(base, nw)]  # (1, NW)
            y_w = xyz_ref[0, 1:2, pl.ds(base, nw)]
            z_w = xyz_ref[0, 2:3, pl.ds(base, nw)]
            vm_w = xyz_ref[0, 3:4, pl.ds(base, nw)] > 0.0
            hit_w = vm_w
            for d, p_w in zip(range(3), (x_w, y_w, z_w), strict=True):
                hit_w = jnp.logical_and(
                    hit_w,
                    jnp.logical_and(p_w >= qlo[d], p_w <= qhi[d]),
                )  # (TM, NW)

            cnt = st[0]
            pos0 = jnp.where(hit_w, wiota, nw)
            hits = jnp.sum(hit_w.astype(jnp.int32), axis=1, keepdims=True)
            need = jnp.maximum(jnp.minimum(hits, k - cnt), 0)
            tmax = jnp.max(need)

            if extract == "rank":
                # rank-order extraction (see ball_group._fused_kernel):
                # precomputed arrival ranks turn the per-hit dependent
                # min->select->invalidate chain into independent
                # (pipelined) masked-sum steps; same first-s semantics.
                hit_i = hit_w.astype(jnp.int32)
                ranks = _bg._lane_prefix_sum_exclusive(hit_i, wiota, nw)
                cnt_b = cnt
                zf = jnp.zeros((tm, nw), jnp.float32)
                zi = jnp.zeros((tm, nw), jnp.int32)

                def rank_step(u, st_, base=base, x_w=x_w, y_w=y_w,
                              z_w=z_w, hit_w=hit_w, ranks=ranks,
                              cnt_b=cnt_b, need=need, zf=zf, zi=zi):
                    if with_coords:
                        acc_i, ax, ay, az = st_
                    else:
                        (acc_i,) = st_
                    sel = jnp.logical_and(hit_w, ranks == u)
                    ok = u < need
                    li = jnp.sum(
                        jnp.where(sel, wiota, zi), axis=1, keepdims=True
                    )
                    wk = jnp.logical_and(kiota == cnt_b + u, ok)
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
                    for j in range(unroll):
                        st_ = rank_step(i * unroll + j, st_)
                    return st_

                stf = jax.lax.fori_loop(
                    0, (tmax + unroll - 1) // unroll, rank_inner,
                    tuple(st[1:]),
                )
                st = (cnt + need,) + tuple(stf)
                continue

            def inner_step(st_, base=base, x_w=x_w, y_w=y_w, z_w=z_w):
                if with_coords:
                    pos, cnt, acc_i, ax, ay, az = st_
                else:
                    pos, cnt, acc_i = st_
                m = jnp.min(pos, axis=1, keepdims=True)  # (TM, 1)
                ok = jnp.logical_and(m < nw, cnt < k)
                sel = pos == m
                gidx = (base + jnp.where(m >= nw, 0, m)).astype(jnp.int32)
                wk = jnp.logical_and(kiota == cnt, ok)
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

            def inner(t, st_):
                for _ in range(unroll):
                    st_ = inner_step(st_)
                return st_

            stf = jax.lax.fori_loop(
                0, (tmax + unroll - 1) // unroll, inner, (pos0,) + tuple(st)
            )
            st = tuple(stf[1:])
        return i + 1, st

    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state0))

    if with_coords:
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == 0
        zf0 = jnp.zeros((1, 128), jnp.float32)
        x0 = jnp.sum(jnp.where(lane0, xyz_ref[0, 0:1, 0:128], zf0))
        y0 = jnp.sum(jnp.where(lane0, xyz_ref[0, 1:2, 0:128], zf0))
        z0 = jnp.sum(jnp.where(lane0, xyz_ref[0, 2:3, 0:128], zf0))

    cnt = jnp.where(qvalid, state[0], 0)  # padded rows report 0
    acc_i = state[1]
    lane0k = kiota == 0
    zi = jnp.zeros((tm, kp), jnp.int32)
    first_i = jnp.sum(jnp.where(lane0k, acc_i, zi), axis=1, keepdims=True)
    filled = kiota < cnt
    acc_i = jnp.where(filled, acc_i, first_i)
    acc_i = jnp.where(cnt > 0, acc_i, 0)
    idx_ref[0, :, :] = acc_i
    cnt_ref[0, :, :] = jnp.broadcast_to(cnt, (tm, 128)).astype(jnp.int32)
    if with_coords:
        zfk = jnp.zeros((tm, kp), jnp.float32)
        for d, (acc, p0) in enumerate(
            zip(state[2:5], (x0, y0, z0), strict=True)
        ):
            center = (qlo[d] + qhi[d]) * 0.5  # (TM, 1) RoI frame origin
            first_c = jnp.sum(
                jnp.where(lane0k, acc, zfk), axis=1, keepdims=True
            )
            acc = jnp.where(filled, acc, first_c)
            acc = jnp.where(cnt > 0, acc, p0)  # empty row: point 0
            coord_refs[d][0, :, :] = acc - center


def _relevant_chunks_box(boxes, xyz1, valid1, nc, npad, tm, mpad):
    """Ascending ids of point chunks whose AABB overlaps the union AABB of
    the tile's boxes (exact pruning: disjoint AABBs cannot contain a hit),
    packed as [count, ids...] per (batch, tile) row."""
    b, n, _ = xyz1.shape
    r = boxes.shape[1]
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

    qpad = ((0, 0), (0, mpad - r), (0, 0))
    b_lo = jnp.pad(
        boxes[..., 0:3].astype(jnp.float32), qpad, constant_values=1e30
    )
    b_hi = jnp.pad(
        boxes[..., 3:6].astype(jnp.float32), qpad, constant_values=-1e30
    )
    tlo = jnp.min(b_lo.reshape(b, ntiles, tm, 3), axis=2)  # (B, NT, 3)
    thi = jnp.max(b_hi.reshape(b, ntiles, tm, 3), axis=2)

    gap = jnp.maximum(
        jnp.maximum(tlo[:, :, None, :] - chi[:, None, :, :], 0.0),
        jnp.maximum(clo[:, None, :, :] - thi[:, :, None, :], 0.0),
    )  # (B, NT, NCH, 3)
    mask = jnp.all(gap <= 0.0, axis=-1)
    ids = jnp.sort(
        jnp.where(mask, jnp.arange(nchunks, dtype=jnp.int32), nchunks),
        axis=-1,
    )
    nrel = jnp.sum(mask, axis=-1).astype(jnp.int32)
    packed = jnp.concatenate([nrel[..., None], ids], axis=-1)
    return packed.reshape(b * ntiles, 1 + nchunks)


def _box_pallas(boxes, s, xyz1, valid1, with_coords, interpret,
                extract=None, select="first"):
    b, n, _ = xyz1.shape
    r = boxes.shape[1]
    # read the shared knobs at CALL time so runtime retuning of
    # ball_group's globals (scripts/sweep_ballgroup.py pattern)
    # reaches this kernel too — an import-by-value would snapshot
    nw = min(_bg._NW, round_up(n, 128))
    nc = round_up(min(_bg._NC, round_up(n, 128)), nw)
    npad = round_up(n, nc)
    tm = min(128, round_up(r, 8))
    mpad = round_up(r, tm)
    kp = round_up(s, 128)

    planes = jnp.zeros((b, 8, npad), jnp.float32)
    planes = planes.at[:, 0:3, :n].set(
        jnp.swapaxes(xyz1.astype(jnp.float32), 1, 2)
    )
    if valid1 is None:
        planes = planes.at[:, 3, :n].set(1.0)
    else:
        planes = planes.at[:, 3, :n].set(valid1.astype(jnp.float32))
    q = jnp.zeros((b, mpad, 128), jnp.float32)
    q = q.at[:, :r, 0:6].set(boxes.astype(jnp.float32))
    q = q.at[:, :r, 6].set(1.0)
    rel = _relevant_chunks_box(boxes, xyz1, valid1, nc, npad, tm, mpad)

    out_specs = [
        pl.BlockSpec((1, tm, kp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((b, mpad, kp), jnp.int32),
        jax.ShapeDtypeStruct((b, mpad, 128), jnp.int32),
    ]
    if with_coords:
        for _ in range(3):
            out_specs.append(
                pl.BlockSpec(
                    (1, tm, kp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
                )
            )
            out_shapes.append(jax.ShapeDtypeStruct((b, mpad, kp), jnp.float32))

    need = (
        tm * nc * 4 * 10
        + tm * kp * 4 * (5 if with_coords else 2)
        + 8 * npad * 4
        + (4 << 20)
    )
    params = (
        {"compiler_params": pltpu.CompilerParams(vmem_limit_bytes=need)}
        if need > 16 * 1024 * 1024
        else {}
    )
    if select == "strided":
        # shared two-phase targeted-extraction kernel (box predicate;
        # single scale) — see ball_group._fused_kernel_strided
        kernel = functools.partial(
            _bg._fused_kernel_strided,
            nsamples=(int(s),),
            r2s=(0.0,),
            n=n,
            nc=nc,
            nw=nw,
            ntiles=mpad // tm,
            with_coords=with_coords,
            unroll=_bg._UNROLL,
            pred="box",
        )
    else:
        kernel = functools.partial(
            _box_kernel,
            k=int(s),
            nc=nc,
            nw=nw,
            ntiles=mpad // tm,
            with_coords=with_coords,
            unroll=_bg._UNROLL,
            extract=extract if extract is not None else _bg._EXTRACT,
        )
    outs = pl.pallas_call(
        kernel,
        grid=(b, mpad // tm),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, npad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        **params,
    )(rel, planes, q)

    idx = outs[0][:, :r, :s]
    cnt = outs[1][:, :r, 0]
    if with_coords:
        local = jnp.stack([o[:, :r, :s] for o in outs[2:5]], axis=-1)
        return idx, cnt, local
    return idx, cnt


def _box_query_xla(boxes, s, xyz1, valid1, select="first"):
    """Mask + top_k formulation (the pre-kernel path, kept as the XLA
    impl and the cross-check for the kernel)."""
    from gspn_tpu.ops.ball_query import _strided_target_mask

    n = xyz1.shape[1]
    lo = boxes[..., None, 0:3]
    hi = boxes[..., None, 3:6]
    p = xyz1[:, None, :, :]
    inside = jnp.all(jnp.logical_and(p >= lo, p <= hi), axis=-1)  # (B,R,N)
    if valid1 is not None:
        inside = jnp.logical_and(inside, valid1[:, None, :])
    if select == "strided":
        inside = _strided_target_mask(inside, s)
    pos = jnp.where(inside, jnp.arange(n, dtype=jnp.int32), n)
    neg_top, _ = jax.lax.top_k(-pos, s)
    first_s = jnp.where(-neg_top >= n, 0, -neg_top)  # ascending hits
    cnt = jnp.minimum(jnp.sum(inside, axis=-1), s).astype(jnp.int32)
    # replicate-first padding to match the kernel exactly
    filled = jnp.arange(s, dtype=jnp.int32) < cnt[..., None]
    first_s = jnp.where(filled, first_s, first_s[..., 0:1])
    first_s = jnp.where(cnt[..., None] > 0, first_s, 0)
    return first_s, cnt


def query_box_group(
    boxes,
    s: int,
    xyz1,
    valid1=None,
    *,
    with_coords: bool = True,
    impl: str = "auto",
    interpret: bool | None = None,
    extract: str | None = None,
    select: str | None = None,
):
    """First-``s`` in-box scene points per RoI, ascending index order.

    Args:
      boxes: (B, R, 6) axis-aligned [lo, hi] boxes (inclusive bounds).
      s: sample budget per box.
      xyz1: (B, N, 3) scene points.
      valid1: optional (B, N) validity mask.
      with_coords: also return box-center-local coordinates of the hits.
      extract: extraction schedule, "serial" | "rank" (default: shared
        ``ball_group._EXTRACT``); both oracle-exact first-s.
      select: "first" (default; reference first-s-in-input-order) |
        "strided" (systematic sample of the full in-box candidate list
        once count > s — subsample-robust for spatially-coherent
        layouts; ``extract`` is ignored).

    Returns ``(idx (B,R,S) i32, cnt (B,R) i32[, local (B,R,S,3) f32])``
    with replicate-first padding past ``cnt`` and the empty-row
    convention (idx 0 / point 0 centered on the box). ``local`` equals
    ``xyz1[idx] - (lo + hi) / 2`` bit-for-bit.
    """
    _bg._check_extract(extract)
    _bg._check_select(select)
    select = select or "first"
    choice = resolve_impl(impl)
    if choice == "pallas" and xyz1.shape[1] <= 131072:
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return _box_pallas(
            boxes, s, xyz1, valid1, with_coords, interpret,
            extract=extract, select=select,
        )
    idx, cnt = _box_query_xla(boxes, s, xyz1, valid1, select=select)
    if not with_coords:
        return idx, cnt
    b, r, _ = idx.shape
    pts = jnp.take_along_axis(
        xyz1.astype(jnp.float32), idx.reshape(b, r * s, 1), axis=1
    ).reshape(b, r, s, 3)
    center = (boxes[..., 0:3] + boxes[..., 3:6]) * 0.5
    local = pts - center[..., None, :].astype(jnp.float32)
    return idx, cnt, local
