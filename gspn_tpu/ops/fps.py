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
point, one grid program per batch element. The XLA path expresses the same
recurrence with ``lax.fori_loop`` + ``vmap`` and is used on CPU and as the
cross-check in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gspn_tpu.ops.common import resolve_impl, round_up

_BIG = 1e10


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
        mind = jnp.minimum(mind, d)
        if valid is not None:
            mind = jnp.where(valid, mind, -1.0)
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


def _fps_kernel(xyzt_ref, valid_ref, idx_ref, *, npoint: int):
    """One batch element per grid program.

    xyzt:  (1, 8, Npad) — rows 0..2 of dim 1 are x, y, z along lanes.
    valid: (1, 8, Npad) — row 0 is 1.0 for real points.
    idx:   (1, 8, Kpad) int32 out — row 0 holds the selected indices.

    The min-distance buffer and the output row are carried functionally
    through the fori_loop (VMEM-resident vectors); each selected index is
    deposited into the output row with a one-hot lane select, avoiding
    per-iteration dynamic stores.
    """
    n = xyzt_ref.shape[2]
    kpad = idx_ref.shape[2]
    x = xyzt_ref[0, 0:1, :]
    y = xyzt_ref[0, 1:2, :]
    z = xyzt_ref[0, 2:3, :]
    vmask = valid_ref[0, 0:1, :] > 0.0
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (1, kpad), 1)

    # first selected = lowest valid index (0 when nothing is padded)
    first = jnp.min(jnp.where(vmask, iota, n)).astype(jnp.int32)
    mind0 = jnp.where(vmask, _BIG, -1.0)
    acc0 = jnp.where(kiota == 0, first, 0).astype(jnp.int32)

    def body(i, carry):
        mind, prev, acc = carry
        sel = iota == prev
        zero = jnp.zeros_like(x)
        # sum over a one-hot select is an exact scalar read (coord appears once)
        cx = jnp.sum(jnp.where(sel, x, zero))
        cy = jnp.sum(jnp.where(sel, y, zero))
        cz = jnp.sum(jnp.where(sel, z, zero))
        dx = x - cx
        dy = y - cy
        dz = z - cz
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind, d)
        mind = jnp.where(vmask, mind, -1.0)
        best = jnp.max(mind)
        nxt = jnp.min(jnp.where(mind == best, iota, n)).astype(jnp.int32)
        acc = jnp.where(kiota == i, nxt, acc)
        return mind, nxt, acc

    if npoint > 1:
        _, _, acc = jax.lax.fori_loop(1, npoint, body, (mind0, first, acc0))
    else:
        acc = acc0
    idx_ref[0, 0:1, :] = acc


def _fps_pallas(xyz: jax.Array, npoint: int, valid: jax.Array | None, interpret: bool):
    b, n, _ = xyz.shape
    npad = round_up(n, 128)
    kpad = round_up(npoint, 128)

    xyzt = jnp.zeros((b, 8, npad), jnp.float32)
    xyzt = xyzt.at[:, 0:3, :n].set(jnp.swapaxes(xyz.astype(jnp.float32), 1, 2))
    vrow = jnp.zeros((b, 8, npad), jnp.float32)
    if valid is None:
        vrow = vrow.at[:, 0, :n].set(1.0)
    else:
        vrow = vrow.at[:, 0, :n].set(valid.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8, npad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, npad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, kpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 8, kpad), jnp.int32),
        interpret=interpret,
    )(xyzt, vrow)
    return out[:, 0, :npoint]


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
) -> jax.Array:
    """Greedy farthest point sampling.

    Args:
      npoint: number of points to select (static).
      xyz: ``(B, N, 3)`` float point coordinates.
      valid: optional ``(B, N)`` bool mask; padded (False) points are never
        selected and never influence distances. The reference has no mask —
        pass None for reference-parity semantics.
      impl: ``auto|pallas|xla``.

    Returns:
      ``(B, npoint) int32`` indices into N. ``out[:, 0]`` is the first valid
      index (0 when unmasked), matching the reference's fixed seed.
    """
    if xyz.ndim != 3 or xyz.shape[-1] != 3:
        raise ValueError(f"xyz must be (B, N, 3), got {xyz.shape}")
    choice = resolve_impl(impl)
    if choice == "pallas":
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return _fps_pallas(xyz, npoint, valid, interpret)
    fn = functools.partial(_fps_single_xla, npoint=npoint)
    if valid is None:
        return jax.vmap(lambda p: fn(p, valid=None))(xyz)
    return jax.vmap(lambda p, v: fn(p, valid=v))(xyz, valid)
