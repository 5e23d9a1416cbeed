"""Point-level spatial sharding of the PointNet++ backbone — the
whole-scene long-context analog of sequence/context parallelism
(SURVEY.md §2.3, the "shard N points across chips" stretch goal).

TPU-first design decision vs the CUDA-style halo exchange the survey
sketches: raw coordinates are tiny (N x 3 f32 = 12 MB even at a million
points), so they are REPLICATED — one all-broadcast of xyz costs far less
over ICI than radius-dependent dynamic halo sets cost in shape dynamism
(XLA needs static shapes; a worst-case halo bound degenerates to
replication anyway). What actually scales with N — the per-point WORK and
the per-point FEATURE MAPS (N x C activations, the real HBM load) — is
sharded:

- sa1 (the dominant M x N neighborhood scan): the FPS centroid QUERIES
  shard across the mesh; each device scans the replicated coordinates for
  its query slice only, runs the shared MLP + max-pool on its groups, and
  the small pooled output (P x C) is ``all_gather``-ed over ICI.
- FPS itself is sequential and global; it runs replicated (identical on
  every shard — deterministic), as the survey's fallback permits.
- sa2..sa4 operate on <=1024 centroids — replicated (cheaper than
  communicating).
- FP levels with large target counts (the other N-proportional stage:
  three_nn + interpolate + unit MLP over all N points) shard their
  TARGETS; sources (the small centroid level) stay full. Intermediate
  sharded FP outputs that feed the next FP level as sources are
  ``all_gather``-ed (small); the final per-point feature map STAYS
  sharded on the point axis — it is the large tensor.

Outputs are bit-comparable to the single-device backbone: indices/counts
are exact; feature values agree to float tolerance (per-shard slices
change MLP batch shapes, so XLA may reassociate matmul reductions —
see tests/test_points_sharded.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gspn_tpu import ops
from gspn_tpu.models.rpointnet import RPointNetConfig
from gspn_tpu.nn.pointnet2 import PointNetFPModule, PointNetSAModule


def _sa_module(cfg: RPointNetConfig, i: int) -> PointNetSAModule:
    spec = cfg.sa_layers[i]
    return PointNetSAModule(
        npoint=spec.npoint,
        radius=spec.radius,
        nsample=spec.nsample,
        mlp=spec.mlp,
        use_bn=cfg.use_bn,
        bn_axis=cfg.bn_axis,
        ops_impl=cfg.ops_impl,
        dtype=cfg.dtype,
    )


def _fp_module(cfg: RPointNetConfig, i: int) -> PointNetFPModule:
    return PointNetFPModule(
        cfg.fp_mlps[i], use_bn=cfg.use_bn, bn_axis=cfg.bn_axis,
        ops_impl=cfg.ops_impl, dtype=cfg.dtype,
    )


def _sub_vars(bb_vars, name):
    out = {"params": bb_vars["params"][name]}
    if "batch_stats" in bb_vars and name in bb_vars["batch_stats"]:
        out["batch_stats"] = bb_vars["batch_stats"][name]
    return out


def sharded_backbone_body(
    cfg: RPointNetConfig,
    axis: str,
    nshards: int,
    bb_vars,
    xyz,
    valid,
    sa1_fps_idx=None,
    features=None,
    train: bool = False,
):
    """The per-shard backbone computation (call INSIDE a ``shard_map``
    over ``axis``): returns this shard's slice of the (B, N, C) feature
    map, sharded on the point axis — or, with ``train=True``, the tuple
    ``(feature_slice, new_batch_stats)`` where the stats were computed
    over the full (cross-shard) reduction set via the BN ``psum`` hook
    and are therefore identical on every shard.

    ``sa1_fps_idx``: optional precomputed replicated (B, P1) FPS indices
    (e.g. the shared seeds+sa1 pass of the fused pipeline); computed here
    when absent. Composable: the point-sharded whole-scene inference
    (:func:`make_point_sharded_inference`) reuses this body between its
    seed-sharded GSPN and RoI stages."""
    bn_axes = (
        cfg.bn_axis if isinstance(cfg.bn_axis, tuple) else (cfg.bn_axis,)
    )
    if train and cfg.use_bn and axis not in bn_axes:
        raise ValueError(
            "sharded training with BN needs cross-shard statistics: pass "
            f"cfg with bn_axis including {axis!r} (got {cfg.bn_axis!r})"
        )
    i = jax.lax.axis_index(axis)
    nsa = len(cfg.sa_layers)
    p1 = cfg.sa_layers[0].npoint
    if p1 % nshards:
        raise ValueError(f"sa1 npoint={p1} not divisible by {nshards} shards")
    per_q = p1 // nshards
    n = xyz.shape[1]
    if n % nshards:
        raise ValueError(f"N={n} not divisible by {nshards} shards")
    per_n = n // nshards

    new_stats = {}

    def _apply(mod, name, *args):
        v = _sub_vars(bb_vars, name)
        if train:
            out, mut = mod.apply(v, *args, mutable=["batch_stats"])
            if "batch_stats" in v:
                new_stats[name] = mut["batch_stats"]
            return out
        return mod.apply(v, *args)

    # ---- sa1: replicated FPS, sharded queries
    fps_idx = (
        sa1_fps_idx
        if sa1_fps_idx is not None
        else ops.farthest_point_sample(
            p1, xyz, valid, impl=cfg.ops_impl,
            segments=ops.eligible_fps_segments(
                cfg.fps_segments, p1, xyz.shape[1]
            ),
            segment_mode=cfg.fps_segment_mode,
        )
    )
    my_fps = jax.lax.dynamic_slice_in_dim(fps_idx, i * per_q, per_q, axis=1)
    sa1 = _sa_module(cfg, 0)
    nx, nf, nv = _apply(sa1, "sa1", xyz, features, valid, train, my_fps)
    xs = [xyz]
    fs = [features]
    vs = [valid]
    # gather the small pooled level: (B, P1, C) + coords + validity
    xs.append(jax.lax.all_gather(nx, axis, axis=1, tiled=True))
    fs.append(jax.lax.all_gather(nf, axis, axis=1, tiled=True))
    vs.append(
        None
        if nv is None
        else jax.lax.all_gather(nv, axis, axis=1, tiled=True)
    )

    # ---- sa2..: small centroid sets, replicated
    for li in range(1, nsa):
        mod = _sa_module(cfg, li)
        nx, nf, nv = _apply(
            mod, f"sa{li + 1}", xs[-1], fs[-1], vs[-1], train
        )
        xs.append(nx)
        fs.append(nf)
        vs.append(nv)

    # ---- FP stack: shard large target levels
    feat = fs[-1]
    for fi in range(nsa):
        lvl = nsa - 1 - fi  # target level
        tgt_n = xs[lvl].shape[1]
        mod = _fp_module(cfg, fi)
        shard_this = tgt_n % nshards == 0 and tgt_n // nshards >= 8
        if shard_this:
            per_t = tgt_n // nshards
            sl = lambda a: (
                None
                if a is None
                else jax.lax.dynamic_slice_in_dim(a, i * per_t, per_t, axis=1)
            )
            feat = _apply(
                mod, f"fp{fi + 1}", sl(xs[lvl]), xs[lvl + 1], sl(fs[lvl]),
                feat, sl(vs[lvl]), vs[lvl + 1], train,
            )
            if fi < nsa - 1:  # feeds the next FP level as its source
                feat = jax.lax.all_gather(feat, axis, axis=1, tiled=True)
        else:
            feat = _apply(
                mod, f"fp{fi + 1}", xs[lvl], xs[lvl + 1], fs[lvl], feat,
                vs[lvl], vs[lvl + 1], train,
            )
            if fi == nsa - 1:
                # keep the contract: final map leaves sharded
                feat = jax.lax.dynamic_slice_in_dim(
                    feat, i * per_n, per_n, axis=1
                )
    if train:
        return feat, new_stats
    return feat


def make_sharded_backbone(
    cfg: RPointNetConfig, mesh: Mesh, axis: str = "space"
):
    """Returns ``fn(bb_vars, xyz, valid) -> (B, N, C) feature map`` with
    per-point work sharded over ``axis``; the output is sharded on the
    point axis (reassembled by shard_map's output spec when fetched).

    ``bb_vars``: the Backbone variable collections
    (``{"params": ..., "batch_stats": ...}``, keys ``sa1..`` / ``fp1..``).
    ``cfg.sa_layers[0].npoint`` and N must be divisible by the mesh size.
    """
    nshards = mesh.shape[axis]
    p1 = cfg.sa_layers[0].npoint
    if p1 % nshards:
        raise ValueError(f"sa1 npoint={p1} not divisible by {nshards} shards")

    def shard_fn(bb_vars, xyz, valid):
        return sharded_backbone_body(cfg, axis, nshards, bb_vars, xyz, valid)

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    return jax.jit(sharded)
