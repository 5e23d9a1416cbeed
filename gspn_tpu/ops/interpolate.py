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


_TN = 128  # target rows per program (single-shot kernel); the kernel has
#            no data-dependent loops, so taller tiles only trade VMEM for
#            fewer program switches — swept on-chip (scripts/microbench)


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
        # eliminate with a sentinel ABOVE the invalid-source value so a
        # picked 1e10 entry cannot be re-picked (degenerate scenes with
        # < 3 valid sources must yield distinct indices, like top_k)
        d2 = jnp.where(iota == imin, 2e10, d2)
    dist_ref[0, :, :] = dists
    idx_ref[0, :, :] = idxs


def _three_nn_pallas(xyz1, xyz2, valid2, interpret):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    mpad = round_up(m, 128)
    tn = min(_TN, round_up(n, 8))
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


_MC = 2048  # sources scanned per chunk in the tiled-M kernel


def _three_nn_tiled_kernel(tgt_ref, src_ref, dist_ref, idx_ref, *, m: int, mc: int):
    """Tiled-M variant for large source sets (whole scenes, SURVEY.md §5
    long-context row): sources are scanned in MC-lane chunks with a
    running top-3 merged lexicographically by (distance, global index) —
    bit-identical results to the single-shot kernel / stable ``top_k``.

    Shapes as in ``_three_nn_kernel``; src may be any 128-multiple M.
    """
    mpad = src_ref.shape[2]
    tn = tgt_ref.shape[1]
    tx = tgt_ref[0, :, 0:1]
    ty = tgt_ref[0, :, 1:2]
    tz = tgt_ref[0, :, 2:3]
    liota = jax.lax.broadcasted_iota(jnp.int32, (tn, mc), 1)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (tn, 128), 1)
    big = jnp.float32(1e10)

    def body(c, carry):
        dbuf, ibuf = carry  # (TN, 128): lanes 0..2 running top3, 3..5 scratch
        off = c * mc
        sx = src_ref[0, 0:1, pl.ds(off, mc)]
        sy = src_ref[0, 1:2, pl.ds(off, mc)]
        sz = src_ref[0, 2:3, pl.ds(off, mc)]
        sv = src_ref[0, 3:4, pl.ds(off, mc)] > 0.0
        dx = tx - sx
        dy = ty - sy
        dz = tz - sz
        d2 = dx * dx + dy * dy + dz * dz
        d2 = jnp.where(
            jnp.logical_and(sv, (off + liota) < m), d2, big
        )
        # chunk top-3 into scratch lanes 3..5 (ascending, lowest-idx ties);
        # eliminate picked entries with a sentinel ABOVE the invalid value
        # so 1e10 entries are picked at most once each (distinct indices
        # even when a chunk has < 3 valid sources)
        for k in range(3):
            dmin = jnp.min(d2, axis=1, keepdims=True)
            lmin = jnp.min(
                jnp.where(d2 == dmin, liota, mc), axis=1, keepdims=True
            )
            gmin = (off + jnp.minimum(lmin, mc - 1)).astype(jnp.int32)
            dbuf = jnp.where(kiota == 3 + k, jnp.minimum(dmin, big), dbuf)
            ibuf = jnp.where(kiota == 3 + k, gmin, ibuf)
            d2 = jnp.where(liota == lmin, 2.0 * big, d2)
        # merge 6 candidates -> top3 (lex order by (d, global idx));
        # candidates are distinct sources, so masking by (d, i) is safe
        cand = kiota < 6
        dwork = jnp.where(cand, dbuf, big)
        iwork = jnp.where(cand, ibuf, mpad)
        dnew, inew = dbuf, ibuf
        for k in range(3):
            dmin = jnp.min(dwork, axis=1, keepdims=True)
            imin = jnp.min(
                jnp.where(dwork == dmin, iwork, mpad), axis=1, keepdims=True
            )
            dnew = jnp.where(kiota == k, dmin, dnew)
            inew = jnp.where(kiota == k, imin.astype(jnp.int32), inew)
            used = jnp.logical_and(dwork == dmin, iwork == imin)
            dwork = jnp.where(used, big, dwork)
            iwork = jnp.where(used, mpad, iwork)
        return dnew, inew

    # index sentinel mpad: at equal distance (1e10 invalid entries) the
    # lex merge must prefer genuine source indices over the init entries
    dbuf0 = jnp.full((tn, 128), big, jnp.float32)
    ibuf0 = jnp.full((tn, 128), mpad, jnp.int32)
    dbuf, ibuf = jax.lax.fori_loop(0, mpad // mc, body, (dbuf0, ibuf0))
    dist_ref[0, :, :] = dbuf
    idx_ref[0, :, :] = jnp.minimum(ibuf, m - 1)


def _three_nn_pallas_tiled(xyz1, xyz2, valid2, interpret):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    mc = min(_MC, round_up(m, 128))
    mpad = round_up(m, mc)
    tn = min(_TN, round_up(n, 8))
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
        functools.partial(_three_nn_tiled_kernel, m=m, mc=mc),
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


def _three_nn_xla_chunked(xyz1, xyz2, valid2, chunk: int = 4096):
    """lax.scan over source chunks with a running top-3 — never
    materializes the (N, M) matrix in HBM (the round-1 fallback did)."""
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    mpad = round_up(m, chunk)
    pad = mpad - m
    src = jnp.pad(xyz2.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    v = (
        jnp.ones((b, m), bool) if valid2 is None else valid2.astype(bool)
    )
    v = jnp.pad(v, ((0, 0), (0, pad)))
    src_c = src.reshape(b, mpad // chunk, chunk, 3).swapaxes(0, 1)
    v_c = v.reshape(b, mpad // chunk, chunk).swapaxes(0, 1)
    offs = jnp.arange(mpad // chunk, dtype=jnp.int32) * chunk

    def step(carry, xs):
        dbest, ibest = carry  # (B, N, 3) each, ascending
        s, sv, off = xs
        d2 = masked_sqdist(xyz1, s, sv)  # (B, N, chunk)
        dneg, li = jax.lax.top_k(-d2, 3)
        cand_d = jnp.concatenate([dbest, -dneg], axis=-1)  # (B, N, 6)
        cand_i = jnp.concatenate([ibest, li + off], axis=-1)
        # lex sort by (d, i): combine into a sortable key via argsort twice
        order = jnp.lexsort((cand_i, cand_d), axis=-1)[..., :3]
        return (
            jnp.take_along_axis(cand_d, order, axis=-1),
            jnp.take_along_axis(cand_i, order, axis=-1).astype(jnp.int32),
        ), None

    init = (
        jnp.full((b, n, 3), 1e10, jnp.float32),
        # index sentinel m: ties at the invalid-source distance (1e10)
        # must prefer genuine indices over the init entries, matching the
        # one-shot masked top_k exactly in < 3-valid-source scenes
        jnp.full((b, n, 3), m, jnp.int32),
    )
    (dist, idx), _ = jax.lax.scan(step, init, (src_c, v_c, offs))
    return dist, jnp.minimum(idx, m - 1)


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

    Pallas paths keep distance tiles in VMEM only: the single-shot kernel
    for M <= 2048 and a tiled-M running-top-3 kernel up to M = 131072
    (whole scenes). Beyond that (or with impl="xla" and large M) a
    lax.scan chunked top-3 avoids materializing (N, M) in HBM."""
    choice = resolve_impl(impl)
    m = xyz2.shape[1]
    if choice == "pallas" and m <= 131072:
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if m <= _MC:
            return _three_nn_pallas(xyz1, xyz2, valid2, interpret)
        return _three_nn_pallas_tiled(xyz1, xyz2, valid2, interpret)
    if m > 16384:
        return _three_nn_xla_chunked(xyz1, xyz2, valid2)
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

    Differentiable w.r.t. points (scatter-add) and weight. This is the
    reference-exact formulation (sum over the k=0..2 axis); see
    :func:`three_interpolate_mm` for the MXU fast path.
    """
    gathered = group_point(points, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=-2)


# ---------------------------------------------------------------------------
# MXU sparse-matmul interpolation (fast path)
# ---------------------------------------------------------------------------

_IMC = 1024  # sources per matmul chunk in the MXU interpolation kernel


def _interp_mm_kernel(idx_ref, w_ref, pts_ref, out_ref, *, mc: int):
    """Grid (B, N//TN). out = W @ points where W (TN, M) holds each target
    row's 3 inverse-distance weights at its source columns — the row
    gather rides the MXU instead of the (slow) XLA row-gather path.

    idx: (1, TN, 128) i32, lanes 0..2; w: (1, TN, 128) f32, lanes 0..2;
    pts: (1, Mpad, C); out: (1, TN, C).
    """
    mpad, c = pts_ref.shape[1], pts_ref.shape[2]
    tn = idx_ref.shape[1]
    acc = jnp.zeros((tn, c), jnp.float32)

    def body(ch, acc):
        off = ch * mc
        pts_c = pts_ref[0, pl.ds(off, mc), :]  # (MC, C)
        miota = jax.lax.broadcasted_iota(jnp.int32, (tn, mc), 1) + off
        w_tile = jnp.zeros((tn, mc), jnp.float32)
        for k in range(3):
            ik = idx_ref[0, :, k : k + 1]  # (TN, 1)
            wk = w_ref[0, :, k : k + 1]
            w_tile = w_tile + jnp.where(miota == ik, wk, 0.0)
        return acc + jnp.dot(
            w_tile,
            pts_c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    acc = jax.lax.fori_loop(0, mpad // mc, body, acc)
    out_ref[0, :, :] = acc


def _three_interpolate_mm_fwd(points, idx, weight, interpret):
    b, m, c = points.shape
    n = idx.shape[1]
    cpad = round_up(c, 128)
    mc = min(_IMC, round_up(m, 128))
    mpad = round_up(m, mc)
    tn = min(128, round_up(n, 8))
    npad = round_up(n, tn)

    pts = jnp.zeros((b, mpad, cpad), jnp.float32)
    pts = pts.at[:, :m, :c].set(points.astype(jnp.float32))
    idx_t = jnp.zeros((b, npad, 128), jnp.int32)
    idx_t = idx_t.at[:, :n, 0:3].set(idx.astype(jnp.int32))
    # padded target rows keep idx 0 / weight 0 -> contribute nothing
    w_t = jnp.zeros((b, npad, 128), jnp.float32)
    w_t = w_t.at[:, :n, 0:3].set(weight.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_interp_mm_kernel, mc=mc),
        grid=(b, npad // tn),
        in_specs=[
            pl.BlockSpec(
                (1, tn, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tn, 128), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, mpad, cpad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tn, cpad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, npad, cpad), jnp.float32),
        interpret=interpret,
    )(idx_t, w_t, pts)
    return out[:, :n, :c]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _three_interpolate_mm(points, idx, weight, interpret):
    return _three_interpolate_mm_fwd(points, idx, weight, interpret)


def _mm_fwd(points, idx, weight, interpret):
    return (
        _three_interpolate_mm_fwd(points, idx, weight, interpret),
        (points, idx, weight),
    )


def _mm_bwd(interpret, res, g):
    import numpy as np

    points, idx, weight = res
    b, n, _ = idx.shape
    m, c = points.shape[1], points.shape[2]
    # d/dpoints: scatter-add of weight * g at idx (what autodiff derives
    # for the exact path); d/dweight: <gathered points, g> per neighbor
    contrib = (weight[..., None] * g[..., None, :]).reshape(b, n * 3, c)
    dpoints = jnp.zeros((b, m, c), g.dtype)
    dpoints = dpoints.at[
        jnp.arange(b)[:, None], idx.reshape(b, n * 3)
    ].add(contrib)
    gathered = group_point(points, idx)  # (B, N, 3, C)
    dweight = jnp.sum(gathered * g[..., None, :], axis=-1)
    didx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return dpoints.astype(points.dtype), didx, dweight.astype(weight.dtype)


_three_interpolate_mm.defvjp(_mm_fwd, _mm_bwd)


def three_interpolate_mm(
    points: jax.Array,
    idx: jax.Array,
    weight: jax.Array,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """MXU fast path for :func:`three_interpolate`: the 3-neighbor gather
    + weighted sum runs as one sparse-W matmul per target tile, entirely
    on the MXU (the XLA row-gather it replaces is the slowest primitive
    class on this chip — see STATUS.md kernel notes).

    Numerics: equal to :func:`three_interpolate` up to fp32 summation
    order (the matmul accumulates the 3 terms in source order rather than
    neighbor-rank order) — within 1-2 ulp, not bit-identical. Gradient is
    the exact scatter-add/inner-product pair via custom_vjp.

    Source sets too large for the kernel's resident (Mpad, Cpad) VMEM
    block fall back to the exact gather path.
    """
    m, c = points.shape[1], points.shape[2]
    # Guard on the kernel's ACTUAL resident source block: m is padded to a
    # multiple of the chunk size mc (up to _IMC=1024), which can be ~2x
    # round_up(m, 128) for m just above a multiple of mc. The idx/weight/
    # output blocks are <=128-row tiles (~200 KB) — the 8 MB bound on the
    # source block leaves them ample headroom under the 16 MB scoped-VMEM
    # default.
    mc = min(_IMC, round_up(m, 128))
    if round_up(m, mc) * round_up(c, 128) * 4 > 8 * 1024 * 1024:
        return three_interpolate(points, idx, weight)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _three_interpolate_mm(points, idx, weight, interpret)
