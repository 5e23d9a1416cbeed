"""Farthest point sampling (FPS).

Behavioral contract (reference: ``tf_ops/sampling/tf_sampling_g.cu``,
``farthestpointsamplingKernel`` — reconstructed, see SURVEY.md §2.1):

``farthest_point_sample(npoint, xyz)``: ``(B, N, 3) f32 -> (B, npoint) i32``.
Greedy: seed with index 0; iteratively select the point maximizing its
minimum squared distance to the already-selected set, maintaining a running
per-point min-distance buffer. Deterministic given input order; ties break
to the lowest index. No gradient.

TPU design: the loop is inherently sequential in ``npoint``, so the Pallas
kernel keeps the whole per-point min-distance buffer resident in VMEM and
does one fused VPU pass (distance update + masked max-reduce) per selected
point, with multiple batch elements per grid program on the sublanes so the
sequential cost amortizes across the batch (~7x over the per-batch-element
variant on v5e). The XLA path expresses the same recurrence with
``lax.fori_loop`` + ``vmap`` and is the cross-check in tests.

Parity note: pallas and xla paths match the NumPy oracle exactly at test
sizes; at large N the two backends may reassociate the distance arithmetic
differently, and a one-ULP tie flip permutes the remaining selection order.
This is the "parity up to sampling seeds" regime of BASELINE.json — both
outputs are valid greedy FPS orderings of the same point set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gspn_tpu.ops.common import resolve_impl, round_up

_BIG = 1e10
_UNROLL = 4  # greedy steps per fori_loop iteration; measured best on v5e
#              (2.26 vs 2.38 ms at 1024/8192 — the loop is bound by its
#              dependent distance->argmax chain, so gains are small)


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------


def _fps_single_xla(xyz: jax.Array, npoint: int, valid: jax.Array | None):
    n = xyz.shape[0]
    if valid is None:
        mind0 = jnp.full((n,), _BIG, jnp.float32)
        first = jnp.int32(0)
    else:
        mind0 = jnp.where(valid, _BIG, -1.0).astype(jnp.float32)
        first = jnp.argmax(valid).astype(jnp.int32)

    def body(i, carry):
        mind, prev, out = carry
        p = xyz[prev]
        d = jnp.sum((xyz - p) ** 2, axis=-1)
        # invalid entries start at -1 and d >= 0: min keeps them excluded
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind).astype(jnp.int32)
        out = out.at[i].set(nxt)
        return mind, nxt, out

    out0 = jnp.zeros((npoint,), jnp.int32).at[0].set(first)
    if npoint == 1:
        return out0
    _, _, out = jax.lax.fori_loop(1, npoint, body, (mind0, first, out0))
    return out


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _fps_kernel(x_ref, y_ref, z_ref, v_ref, idx_ref, *, npoint: int, n: int):
    """ROWS batch elements per grid program, batch on sublanes.

    x/y/z/v: (ROWS, Npad) — coordinate planes + validity (1.0 = real).
    idx:     (ROWS, Kpad) int32 out.

    The per-point min-distance buffer lives in VMEM and is carried
    functionally through the fori_loop; every step is a fused (ROWS, N)
    VPU pass, so the inherently sequential greedy loop amortizes its cost
    across ROWS batch elements. Indices are deposited into the output with
    a one-hot lane select (no dynamic stores).
    """
    rows, npad = x_ref.shape
    kpad = idx_ref.shape[1]
    x = x_ref[:, :]
    y = y_ref[:, :]
    z = z_ref[:, :]
    vmask = v_ref[:, :] > 0.0
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, npad), 1)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (rows, kpad), 1)

    # first selected = lowest valid index per row (0 when unmasked)
    first = jnp.min(jnp.where(vmask, iota, n), axis=1, keepdims=True)
    first = jnp.where(first >= n, 0, first).astype(jnp.int32)  # all-pad rows
    mind0 = jnp.where(vmask, _BIG, -1.0)
    acc0 = jnp.where(kiota == 0, first, 0).astype(jnp.int32)

    def body(i, carry):
        mind, prev, acc = carry  # prev: (ROWS, 1)
        sel = iota == prev
        zero = jnp.zeros_like(x)
        # sum over a one-hot select is an exact per-row scalar read
        cx = jnp.sum(jnp.where(sel, x, zero), axis=1, keepdims=True)
        cy = jnp.sum(jnp.where(sel, y, zero), axis=1, keepdims=True)
        cz = jnp.sum(jnp.where(sel, z, zero), axis=1, keepdims=True)
        dx = x - cx
        dy = y - cy
        dz = z - cz
        d = dx * dx + dy * dy + dz * dz
        # invalid lanes hold -1 and d >= 0, so min keeps them excluded —
        # no per-step re-mask needed
        mind = jnp.minimum(mind, d)
        if npad > 128:
            # Mosaic argmax ties -> lowest index (verified on-chip),
            # matching the oracle; one reduction instead of three passes
            nxt = jnp.argmax(mind, axis=1, keepdims=True).astype(jnp.int32)
        else:
            # argmax fails to legalize on single-lane-tile shapes —
            # max + lowest-index-of-max (identical semantics)
            best = jnp.max(mind, axis=1, keepdims=True)
            nxt = jnp.min(
                jnp.where(mind == best, iota, n), axis=1, keepdims=True
            ).astype(jnp.int32)
            nxt = jnp.minimum(nxt, n - 1)
        acc = jnp.where(kiota == i, nxt, acc)
        return mind, nxt, acc

    carry = (mind0, first, acc0)
    steps = npoint - 1
    u = max(1, _UNROLL)
    if steps >= u > 1:
        def body_u(t, c):
            for j in range(u):
                c = body(1 + u * t + j, c)
            return c

        carry = jax.lax.fori_loop(0, steps // u, body_u, carry)
        for i in range(1 + (steps // u) * u, npoint):  # remainder steps
            carry = body(i, carry)
    elif steps > 0:
        carry = jax.lax.fori_loop(1, npoint, body, carry)
    idx_ref[:, :] = carry[2]


_MAX_ROWS = 32  # rows per grid program at large Npad (measured best)
_MAX_ROWS_NARROW = 32  # Npad <= 2048 (segmented FPS packs B*S chain rows).
#   Swept on-chip (scripts/sweep_fps_rows.py): ONE 64-row program LOSES
#   ~16% to two sequential 32-row programs at (64, 1024) — the per-
#   iteration dependent chain (distance -> cross-lane argmax) slows with
#   sublane-row count, unlike with lane count. Kept as a knob; 32 is the
#   measured optimum in both regimes.


def _fps_rows(b: int, npad: int) -> int:
    """Batch rows per grid program: amortize the sequential loop across
    sublanes, capped so the ~6 (ROWS, Npad) f32 live buffers fit in VMEM."""
    cap = _MAX_ROWS_NARROW if npad <= 2048 else _MAX_ROWS
    rows = round_up(min(b, cap), 8)
    while rows > 8 and rows * npad * 4 * 6 > 12 * 1024 * 1024:
        rows //= 2
    return rows


def _fps_pallas(xyz: jax.Array, npoint: int, valid: jax.Array | None, interpret: bool):
    b, n, _ = xyz.shape
    npad = round_up(n, 128)
    kpad = round_up(npoint, 128)
    rows = _fps_rows(b, npad)
    bpad = round_up(b, rows)

    planes = jnp.zeros((3, bpad, npad), jnp.float32)
    planes = planes.at[:, :b, :n].set(
        jnp.moveaxis(xyz.astype(jnp.float32), -1, 0)
    )
    v = jnp.zeros((bpad, npad), jnp.float32)
    if valid is None:
        v = v.at[:b, :n].set(1.0)
    else:
        v = v.at[:b, :n].set(valid.astype(jnp.float32))

    spec = pl.BlockSpec((rows, npad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # whole-scene rows (npad = 64k+) put ~13 MB of live (ROWS, Npad)
    # buffers on the kernel stack; raise the scoped-vmem cap above the
    # 16 MB compiler default (v5e VMEM is far larger) when needed
    # factor covers the x_UNROLL-unrolled body's concurrent temporaries
    # (measured: 12 was enough at unroll=1, the 64k-lane unroll=4 kernel
    # peaks ~30 MB ≈ 15x rows*npad*4)
    need = rows * npad * 4 * (12 + 2 * _UNROLL) + (4 << 20)
    if need > 120 * 1024 * 1024:
        # beyond physical VMEM (v5e: 128 MiB) the kernel cannot fit;
        # fail legibly instead of with an opaque Mosaic scoped-vmem error
        raise ValueError(
            f"fps pallas kernel needs ~{need >> 20} MiB VMEM at N={n} "
            f"(rows={rows}) which exceeds the chip; use impl='xla' or "
            "split the scene"
        )
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=need)
        if need > 16 * 1024 * 1024
        else None
    )
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint, n=n),
        grid=(bpad // rows,),
        in_specs=[spec, spec, spec, spec],
        out_specs=pl.BlockSpec(
            (rows, kpad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bpad, kpad), jnp.int32),
        interpret=interpret,
        **({"compiler_params": params} if params is not None else {}),
    )(planes[0], planes[1], planes[2], v)
    return out[:b, :npoint]


# ---------------------------------------------------------------------------
# Segmented (parallel-chain) approximation
# ---------------------------------------------------------------------------


def _fps_segmented(
    npoint: int,
    xyz: jax.Array,
    valid: jax.Array | None,
    segments: int,
    segment_mode: str,
    impl: str,
    interpret: bool | None,
):
    """S independent greedy chains over sub-samples of the scene.

    Exact FPS is a length-``npoint`` dependent chain (distance update ->
    cross-lane argmax -> gather), which on TPU is latency-bound on the
    chain, not on VPU width (see STATUS.md kernel-sweep findings). This
    variant runs ``segments`` exact greedy FPS chains in parallel — each
    over a disjoint subset of the scene — on separate sublane rows of the
    SAME kernel, cutting the sequential chain length ``S``-fold.
    SURVEY.md §7 ("hard parts" #1) explicitly sanctions bucketed/
    hierarchical FPS with documented seed-level parity deltas.

    segment_mode:
      - "contiguous" (default): segment s = points [s*N/S, (s+1)*N/S).
        On spatially sorted scenes (``ops.spatial_order`` Morton layout,
        the ``--morton`` data option) the segments tile the scene into
        disjoint regions, so the union of per-region FPS sets covers the
        scene almost as well as exact FPS (measured coverage-radius
        ratio ~1.1 at sa1 shapes vs ~1.6 for independent random subsets).
        On arbitrary layouts the segments are arbitrary subsets — still
        valid, quality equals "strided".
      - "strided": segment s = points {j*S + s}. Every segment spans the
        whole scene and padded points at the END of the scene spread
        evenly across segments — the mask-robust choice for unsorted
        data with heavy padding.
      - "spatial": Morton-sort INSIDE the op — compute per-point z-order
        codes (ops/morton.py), co-sort (codes, coords, index, validity)
        with one stable ``lax.sort``, run "contiguous" chains over the
        sorted view, and map the selected positions back through the
        permutation. The scene's raw layout is untouched, so downstream
        first-K ball grouping (layout-sensitive — STATUS.md round-4
        mechanism note) sees the original order; only FPS pays the sort.
        This gives the spatially-tiled segment quality of
        contiguous-on-Morton-data without the ``--morton`` data layout's
        measured AP collapse. Invalid points carry the sentinel code and
        sort last, so they fill the trailing segments; all-invalid
        segments fall back to the morton-lowest valid point.

    Properties (all tested, tests/test_fps_segmented.py):
      - output columns interleave the chains round-robin, so the greedy
        prefix-consistency that lets one pass serve both proposal seeds
        and the backbone's sa1 still holds for prefixes that are
        multiples of ``segments``;
      - invalid points are never selected as long as the scene has at
        least one valid point (all-invalid segments fall back to the
        scene's first valid index), matching exact FPS's guarantee.
    """
    b, n, _ = xyz.shape
    if n % segments or npoint % segments:
        raise ValueError(
            f"fps segments={segments} must divide both N={n} and "
            f"npoint={npoint}"
        )
    if segment_mode not in ("contiguous", "strided", "spatial"):
        raise ValueError(
            "segment_mode must be contiguous|strided|spatial, got "
            f"{segment_mode}"
        )
    if segment_mode == "spatial":
        sxyz, svalid, sidx = spatial_sorted_view(xyz, valid)
        pos = _fps_segmented(
            npoint, sxyz, svalid, segments, "contiguous", impl, interpret
        )
        return jnp.take_along_axis(sidx, pos, axis=1)
    m = npoint // segments
    ns = n // segments
    if segment_mode == "contiguous":
        xs = xyz.reshape(b * segments, ns, 3)
        vs = None if valid is None else valid.reshape(b * segments, ns)
    else:
        xs = (
            xyz.reshape(b, ns, segments, 3)
            .transpose(0, 2, 1, 3)
            .reshape(b * segments, ns, 3)
        )
        vs = (
            None
            if valid is None
            else valid.reshape(b, ns, segments)
            .transpose(0, 2, 1)
            .reshape(b * segments, ns)
        )
    idx = farthest_point_sample(
        m, xs, vs, impl=impl, interpret=interpret
    )  # (B*S, m) local indices into each segment
    offs = jnp.arange(segments, dtype=jnp.int32)
    if segment_mode == "contiguous":
        gidx = idx.reshape(b, segments, m) + (offs * ns)[None, :, None]
    else:
        gidx = idx.reshape(b, segments, m) * segments + offs[None, :, None]
    if valid is not None:
        seg_has = vs.reshape(b, segments, ns).any(axis=2)  # (B, S)
        iota = jnp.arange(n, dtype=jnp.int32)
        first_valid = jnp.min(
            jnp.where(valid, iota[None, :], n), axis=1
        )
        first_valid = jnp.minimum(first_valid, n - 1).astype(jnp.int32)
        gidx = jnp.where(
            seg_has[:, :, None], gidx, first_valid[:, None, None]
        )
    # round-robin interleave: column c holds chain c%S's pick c//S
    return gidx.transpose(0, 2, 1).reshape(b, npoint)


def spatial_sorted_view(xyz: jax.Array, valid: jax.Array | None):
    """The Morton-sorted view the ``segment_mode="spatial"`` FPS runs on:
    one stable ``lax.sort`` co-sorting (codes, x, y, z, index, validity).
    Returns ``(sxyz (B,N,3), svalid (B,N) bool|None, sidx (B,N) i32)``
    where ``sidx`` maps sorted positions back to raw-layout indices
    (``raw_idx = take_along_axis(sidx, pos, 1)``).

    Public so callers that run SEVERAL spatial-segmented FPS passes over
    the same scene (e.g. the pipeline's decoupled seeds/sa1 passes —
    models/pipeline.py) can pay for the sort once and run
    ``segment_mode="contiguous"`` chains over this view; the composition
    is bit-identical to per-pass ``segment_mode="spatial"`` calls.
    Invalid points carry the sentinel Morton code and sort last."""
    b, n, _ = xyz.shape
    from gspn_tpu.ops import morton as _morton

    codes = _morton.morton_codes(xyz, valid)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    operands = [
        codes,
        xyz[..., 0].astype(jnp.float32),
        xyz[..., 1].astype(jnp.float32),
        xyz[..., 2].astype(jnp.float32),
        iota,
    ]
    if valid is not None:
        operands.append(valid.astype(jnp.float32))
    srt = jax.lax.sort(
        tuple(operands), dimension=1, num_keys=1, is_stable=True
    )
    sxyz = jnp.stack(srt[1:4], axis=-1)
    sidx = srt[4]
    svalid = None if valid is None else srt[5] > 0.5
    return sxyz, svalid, sidx


def shared_eligible_fps_segments(
    segments: int, npoints: tuple[int, ...], n: int
) -> int:
    """Effective segment count for ONE FPS pass serving several
    prefix-consumers (prefix lengths ``npoints``, e.g. proposal seeds +
    backbone sa1). Round-robin interleaving makes a segmented pass
    prefix-consistent only at multiples of ``segments``, so the value must
    be eligible for EVERY consumer length — otherwise the whole shared
    pass falls back to exact (1), keeping all consumers on one consistent
    sampling path."""
    for p in npoints:
        if eligible_fps_segments(segments, p, n) != segments:
            return 1
    return segments


def eligible_fps_segments(segments: int, npoint: int, n: int) -> int:
    """The segment count actually used for a (npoint, n)-shaped FPS call
    when a consumer is configured with ``fps_segments=segments``: the
    configured value when it divides both sizes and each chain keeps at
    least 8 picks (shorter chains are already cheap and would only lose
    coverage), else 1 (exact). Static — shapes are static under jit."""
    if (
        segments > 1
        and npoint % segments == 0
        and n % segments == 0
        and npoint >= 8 * segments
    ):
        return segments
    return 1


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def farthest_point_sample(
    npoint: int,
    xyz: jax.Array,
    valid: jax.Array | None = None,
    *,
    impl: str = "auto",
    interpret: bool | None = None,
    segments: int = 1,
    segment_mode: str = "contiguous",
) -> jax.Array:
    """Greedy farthest point sampling.

    Args:
      npoint: number of points to select (static).
      xyz: ``(B, N, 3)`` float point coordinates.
      valid: optional ``(B, N)`` bool mask; padded (False) points are never
        selected and never influence distances. The reference has no mask —
        pass None for reference-parity semantics.
      impl: ``auto|pallas|xla``.
      segments: 1 (default) = the reference's exact greedy FPS. >1 = the
        segmented parallel-chain approximation (see ``_fps_segmented``):
        ``segments`` exact greedy chains over strided subsets run in
        parallel, cutting the sequential chain — and so the kernel's
        latency — ``segments``-fold; the selected SET differs from exact
        FPS (documented seed-level parity delta, SURVEY.md §7 hard-part
        #1). Must divide both ``npoint`` and ``N``.
      segment_mode: how points map to segments when ``segments > 1`` —
        "contiguous" (default; spatial partition on Morton-sorted scenes),
        "strided" (mask-robust on unsorted scenes), or "spatial"
        (Morton-sort inside the op: spatially-tiled segments on ANY
        layout, leaving the scene order untouched for downstream
        first-K grouping). See ``_fps_segmented``.

    Returns:
      ``(B, npoint) int32`` indices into N. With ``segments == 1``,
      ``out[:, 0]`` is the first valid index (0 when unmasked), matching
      the reference's fixed seed; segmented modes seed each chain at its
      segment's first point instead ("spatial": the Morton-lowest valid
      point), so column 0 is chain 0's seed, not index 0.
    """
    if xyz.ndim != 3 or xyz.shape[-1] != 3:
        raise ValueError(f"xyz must be (B, N, 3), got {xyz.shape}")
    if segments < 1:
        raise ValueError(f"segments must be >= 1, got {segments}")
    if segments > 1:
        return _fps_segmented(
            npoint, xyz, valid, segments, segment_mode, impl, interpret
        )
    choice = resolve_impl(impl)
    if choice == "pallas":
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return _fps_pallas(xyz, npoint, valid, interpret)
    fn = functools.partial(_fps_single_xla, npoint=npoint)
    if valid is None:
        return jax.vmap(lambda p: fn(p, valid=None))(xyz)
    return jax.vmap(lambda p, v: fn(p, valid=v))(xyz, valid)
