"""RoI-mask projection: nearest-sampled-point logit for every scene point.

Used by full-scene inference to paint each RoI's per-sample mask logits
onto all scene points (the reference does this host-side per scene;
SURVEY.md §3.3 boundary #3). The naive XLA form materializes a
``(B, R, N, S)`` distance tensor in HBM; this Pallas kernel streams scene
tiles through VMEM against the (tiny) per-RoI sample set instead, so HBM
traffic is O(B·R·N).

Semantics: for scene point p and RoI r, output logit = mask logit of the
sample nearest to p (ties -> the largest logit among tied samples).
Box-membership and thresholding stay outside (cheap fused XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gspn_tpu.ops.common import resolve_impl, round_up

_NEG = -1e10


def _nearest_logit_xla(xyz, sampled, logits):
    d = xyz[:, None, :, None, :] - sampled[:, :, None, :, :]  # (B,R,N,S,3)
    d2 = jnp.sum(d * d, axis=-1)
    nearest = jnp.argmin(d2, axis=-1)  # (B, R, N)
    return jnp.take_along_axis(logits, nearest, axis=-1)


# Tile knobs from the on-chip sweep (v5e, R=64 S=64 N=8192 shape):
# 64 RoIs x 2048 points per program cuts program-switch overhead ~20%
# vs the round-2 (8, 1024) tiling (3.0 vs 3.7 ms standalone).
_ROI_BLOCK = 64  # RoIs per grid program (output sublane tiling needs >= 8)
_TN = 2048  # scene points per grid program


def _nearest_logit_tile(scene_ref, samp_ref):
    """The (RB, TN) nearest-sample-logit tile for one program's blocks.

    scene: (1, 8, TN) rows x, y, z along lanes.
    samp:  (1, RB, Spad, 128) — cols 0..2 sample coords, col 3 logit,
           col 4 sample validity.
    """
    tn = scene_ref.shape[2]
    sx = samp_ref[0, :, :, 0:1]  # (RB, S, 1)
    sy = samp_ref[0, :, :, 1:2]
    sz = samp_ref[0, :, :, 2:3]
    slog = samp_ref[0, :, :, 3:4]
    svalid = samp_ref[0, :, :, 4:5] > 0.0
    px = scene_ref[0, 0:1, :].reshape(1, 1, tn)
    py = scene_ref[0, 1:2, :].reshape(1, 1, tn)
    pz = scene_ref[0, 2:3, :].reshape(1, 1, tn)
    dx = sx - px
    dy = sy - py
    dz = sz - pz
    d2 = dx * dx + dy * dy + dz * dz  # (RB, S, TN)
    d2 = jnp.where(svalid, d2, 3e10)
    dmin = jnp.min(d2, axis=1, keepdims=True)  # (RB, 1, TN)
    cand = jnp.where(jnp.logical_and(d2 == dmin, svalid), slog, _NEG)
    return jnp.max(cand, axis=1)


def _mask_project_kernel(scene_ref, samp_ref, out_ref):
    """Grid (B, R//RB, N//TN), RB = _ROI_BLOCK RoIs per program."""
    out_ref[0, :, :] = _nearest_logit_tile(scene_ref, samp_ref)


def _mask_project_boxed_kernel(rel_ref, scene_ref, samp_ref, out_ref):
    """Box-pruned variant: ``rel_ref (B, R//RB, N//TN)`` i32 (SMEM scalar
    prefetch) says whether ANY RoI box in this program's block intersects
    this scene tile's AABB; irrelevant programs write the ``_NEG`` fill
    (downstream box-membership masks those points regardless)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    rel = rel_ref[i, j, k]

    @pl.when(rel > 0)
    def _():
        out_ref[0, :, :] = _nearest_logit_tile(scene_ref, samp_ref)

    @pl.when(rel == 0)
    def _():
        out_ref[0, :, :] = jnp.full(out_ref.shape[1:], _NEG, jnp.float32)


def _pack_operands(xyz, sampled, logits, svalid, tn, rb):
    """Shared scene/sample packing for the dense and boxed kernels."""
    b, n, _ = xyz.shape
    r, s = logits.shape[1:3]
    npad = round_up(n, 128)
    tn = min(tn, npad)
    npad = round_up(npad, tn)
    spad = round_up(s, 8)
    rb = min(rb, round_up(r, 8))
    rpad = round_up(r, rb)

    scene = jnp.zeros((b, 8, npad), jnp.float32)
    scene = scene.at[:, 0:3, :n].set(jnp.swapaxes(xyz.astype(jnp.float32), 1, 2))
    samp = jnp.zeros((b, rpad, spad, 128), jnp.float32)
    samp = samp.at[:, :r, :s, 0:3].set(sampled.astype(jnp.float32))
    samp = samp.at[:, :r, :s, 3].set(logits.astype(jnp.float32))
    samp = samp.at[:, :r, :s, 4].set(svalid.astype(jnp.float32))
    return scene, samp, npad, tn, spad, rb, rpad


def _vmem_params(rb, spad, tn):
    # live buffers scale with rb*spad*tn (the (RB, S, TN) distance tensor
    # and its selects): raise the scoped-VMEM cap for large tiles
    need = rb * spad * tn * 4 * 5 + rb * spad * 128 * 4 + (4 << 20)
    return (
        {"compiler_params": pltpu.CompilerParams(vmem_limit_bytes=need)}
        if need > 16 * 1024 * 1024
        else {}
    )


def _mask_project_pallas(xyz, sampled, logits, svalid, interpret):
    b, n, _ = xyz.shape
    r = logits.shape[1]
    scene, samp, npad, tn, spad, rb, rpad = _pack_operands(
        xyz, sampled, logits, svalid, _TN, _ROI_BLOCK
    )
    out = pl.pallas_call(
        _mask_project_kernel,
        grid=(b, rpad // rb, npad // tn),
        in_specs=[
            pl.BlockSpec(
                (1, 8, tn), lambda i, j, k: (i, 0, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, rb, spad, 128),
                lambda i, j, k: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rb, tn), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, rpad, npad), jnp.float32),
        interpret=interpret,
        **_vmem_params(rb, spad, tn),
    )(scene, samp)
    return out[:, :r, :n]


def _tile_relevance(xyz, point_valid, boxes, tn, npad, rb, rpad):
    """(B, R//RB, N//TN) i32: does any RoI box in block j intersect scene
    tile k's AABB (over VALID points only)? Cheap dense XLA — R x ntiles
    is tiny next to the (R, S, N) projection it gates."""
    b, n, _ = xyz.shape
    r = boxes.shape[1]
    ntiles = npad // tn
    big = jnp.asarray(jnp.inf, jnp.float32)
    xyzp = jnp.zeros((b, npad, 3), jnp.float32).at[:, :n].set(
        xyz.astype(jnp.float32)
    )
    validp = jnp.zeros((b, npad), bool).at[:, :n].set(point_valid)
    pts = xyzp.reshape(b, ntiles, tn, 3)
    vm = validp.reshape(b, ntiles, tn, 1)
    tmin = jnp.min(jnp.where(vm, pts, big), axis=2)  # (B, ntiles, 3)
    tmax = jnp.max(jnp.where(vm, pts, -big), axis=2)
    bmin = boxes[..., 0:3].astype(jnp.float32)
    bmax = boxes[..., 3:6].astype(jnp.float32)
    inter = jnp.all(
        jnp.logical_and(
            bmin[:, :, None, :] <= tmax[:, None, :, :],
            bmax[:, :, None, :] >= tmin[:, None, :, :],
        ),
        axis=-1,
    )  # (B, R, ntiles); empty tiles have tmin=+inf > tmax=-inf => False
    interp = jnp.zeros((b, rpad, ntiles), bool).at[:, :r].set(inter)
    rel = jnp.any(interp.reshape(b, rpad // rb, rb, ntiles), axis=2)
    return rel.astype(jnp.int32)


def _mask_project_boxed_pallas(
    xyz, sampled, logits, svalid, boxes, pvalid, interpret, rb0, tn0
):
    b, n, _ = xyz.shape
    r = logits.shape[1]
    scene, samp, npad, tn, spad, rb, rpad = _pack_operands(
        xyz, sampled, logits, svalid, tn0, rb0
    )
    rel = _tile_relevance(xyz, pvalid, boxes, tn, npad, rb, rpad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, rpad // rb, npad // tn),
        in_specs=[
            pl.BlockSpec(
                (1, 8, tn),
                lambda i, j, k, rel_ref: (i, 0, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rb, spad, 128),
                lambda i, j, k, rel_ref: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rb, tn),
            lambda i, j, k, rel_ref: (i, j, k),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _mask_project_boxed_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rpad, npad), jnp.float32),
        interpret=interpret,
        **_vmem_params(rb, spad, tn),
    )(rel, scene, samp)
    return out[:, :r, :n]


def nearest_sample_logit(
    xyz: jax.Array,  # (B, N, 3) scene points
    sampled: jax.Array,  # (B, R, S, 3) per-RoI sample coords
    logits: jax.Array,  # (B, R, S) per-sample mask logits
    sample_valid: jax.Array | None = None,  # (B, R, S)
    *,
    impl: str = "auto",
    interpret: bool | None = None,
) -> jax.Array:
    """(B, R, N) f32: each scene point's nearest-sample mask logit."""
    if sample_valid is None:
        sample_valid = jnp.ones(logits.shape, bool)
    choice = resolve_impl(impl)
    if choice == "pallas":
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return _mask_project_pallas(xyz, sampled, logits, sample_valid, interpret)
    big = jnp.asarray(3e10, jnp.float32)
    d = xyz[:, None, :, None, :] - sampled[:, :, None, :, :]
    d2 = jnp.sum(d * d, axis=-1)
    d2 = jnp.where(sample_valid[:, :, None, :], d2, big)
    dmin = jnp.min(d2, axis=-1, keepdims=True)
    cand = jnp.where(
        jnp.logical_and(d2 == dmin, sample_valid[:, :, None, :]),
        logits[:, :, None, :],
        _NEG,
    )
    return jnp.max(cand, axis=-1)


# Boxed-variant tile knobs. Smaller RoI blocks than the dense kernel's
# 64 so the per-(block, tile) AABB gate has something to prune: at
# RB=64 the block's box union covers most of the scene and every tile
# stays relevant. Sweepable via the roi_block/tile_n args.
_ROI_BLOCK_BOXED = 8
_TN_BOXED = 2048


def nearest_sample_logit_boxed(
    xyz: jax.Array,  # (B, N, 3) scene points — spatially coherent order!
    sampled: jax.Array,  # (B, R, S, 3) per-RoI sample coords
    logits: jax.Array,  # (B, R, S) per-sample mask logits
    boxes: jax.Array,  # (B, R, 6) per-RoI AABB (min xyz, max xyz)
    sample_valid: jax.Array | None = None,  # (B, R, S)
    point_valid: jax.Array | None = None,  # (B, N)
    *,
    impl: str = "auto",
    interpret: bool | None = None,
    roi_block: int | None = None,
    tile_n: int | None = None,
) -> jax.Array:
    """Box-pruned mask projection (B, R, N) f32.

    Contract: for every VALID scene point p INSIDE RoI r's box
    (``boxes[r, 0:3] <= xyz[p] <= boxes[r, 3:6]`` elementwise), the output
    is bit-identical to :func:`nearest_sample_logit`; everywhere else it
    may be the ``_NEG`` fill. The fused pipeline ANDs projected logits
    with box membership + point validity (models/pipeline.py
    ``project_roi_masks``; the reference applies the same in-box gate
    host-side, SURVEY.md §3.3 boundary #3), so the pruned op is
    mask-exact there.

    Pruning skips (RoI-block, scene-tile) programs whose tile AABB does
    not intersect any box in the block — effective only when scene tiles
    are spatially compact, i.e. on a Morton-sorted view
    (``ops.spatial_sorted_view``). On raw shuffled layouts every tile
    spans the whole scene and nothing prunes (correct, just dense-speed).
    """
    if sample_valid is None:
        sample_valid = jnp.ones(logits.shape, bool)
    if point_valid is None:
        point_valid = jnp.ones(xyz.shape[:2], bool)
    choice = resolve_impl(impl)
    if choice == "pallas":
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return _mask_project_boxed_pallas(
            xyz,
            sampled,
            logits,
            sample_valid,
            boxes,
            point_valid,
            interpret,
            roi_block or _ROI_BLOCK_BOXED,
            tile_n or _TN_BOXED,
        )
    # XLA path: dense projection trivially satisfies the in-box contract.
    return nearest_sample_logit(
        xyz, sampled, logits, sample_valid, impl="xla"
    )
