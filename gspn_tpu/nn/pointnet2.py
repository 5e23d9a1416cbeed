"""PointNet++ set-abstraction / feature-propagation modules.

Replaces the reference's ``utils/pointnet_util.py`` (``sample_and_group``,
``sample_and_group_all``, ``pointnet_sa_module``, ``pointnet_sa_module_msg``,
``pointnet_fp_module`` — reconstructed behavioral contracts, SURVEY.md §2.2).

Differences from the reference are TPU-idiomatic only:
- the shared per-point MLPs are Dense stacks (MXU matmuls), not 1x1 convs;
- every stage threads an optional validity mask so whole padded scenes fit
  in one static-shape XLA program (the reference pads host-side instead);
- grouping/interpolation use the ops library (Pallas / native HLO gather).
Group semantics (replicate-first ball-query padding feeding the max-pool)
are preserved exactly.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from gspn_tpu import ops
from gspn_tpu.nn.layers import PointMLP, masked_max, masked_mean


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz,
    points=None,
    valid=None,
    use_knn: bool = False,
    use_xyz: bool = True,
    impl: str = "auto",
    fps_idx=None,
    fps_segments: int = 1,
    fps_segment_mode: str = "contiguous",
    select: str = "first",
):
    """FPS -> gather -> ball query (or kNN) -> group -> center local coords.

    ``fps_idx`` (B, npoint): precomputed FPS indices to reuse (greedy FPS
    is prefix-consistent, so one fps(max_n) call can serve several
    consumers via slicing — see ``models/pipeline.py``).

    ``fps_segments``: >1 enables the segmented parallel-chain FPS
    approximation where eligible (``ops.eligible_fps_segments`` — the
    configured value must divide npoint and N with >= 8 picks per chain,
    else the layer stays exact). Documented seed-level parity delta,
    SURVEY.md §7 hard-part #1.

    Returns (new_xyz (B,P,3), new_points (B,P,K,C'), idx (B,P,K),
    grouped_xyz (B,P,K,3) local frame, pts_cnt (B,P)).
    """
    if fps_idx is None:
        fps_idx = ops.farthest_point_sample(
            npoint, xyz, valid, impl=impl,
            segments=ops.eligible_fps_segments(
                fps_segments, npoint, xyz.shape[1]
            ),
            segment_mode=fps_segment_mode,
        )
    new_xyz = ops.gather_point(xyz, fps_idx)
    if use_knn:
        _, idx = ops.knn_point(nsample, xyz, new_xyz, valid)
        pts_cnt = jnp.full(idx.shape[:2], nsample, jnp.int32)
        grouped_xyz = ops.group_point(xyz, idx) - new_xyz[:, :, None, :]
    else:
        # fused kernel: query + xyz gather + center subtract in one pass
        ((idx, pts_cnt, grouped_xyz),) = ops.query_ball_group_multi(
            (radius,), (nsample,), xyz, new_xyz, valid, impl=impl,
            select=select,
        )
    if points is not None:
        grouped_points = ops.group_point(points, idx)
        if use_xyz:
            new_points = jnp.concatenate([grouped_xyz, grouped_points], axis=-1)
        else:
            new_points = grouped_points
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz, pts_cnt


def sample_and_group_all(xyz, points=None, use_xyz: bool = True):
    """Single group containing every point (global pooling stage).

    new_xyz is the origin, matching the reference."""
    b, n, _ = xyz.shape
    new_xyz = jnp.zeros((b, 1, 3), xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]  # (B, 1, N, 3)
    if points is not None:
        gp = points[:, None, :, :]
        new_points = jnp.concatenate([grouped_xyz, gp], -1) if use_xyz else gp
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, None, grouped_xyz


class PointNetSAModule(nn.Module):
    """Set abstraction (SSG or group-all), ``pointnet_sa_module`` parity.

    pooling in {"max", "avg", "weighted_avg", "max_and_avg"} as in the
    reference; "max" is what every published config uses.
    """

    npoint: int = 0  # ignored when group_all
    radius: float = 0.0
    nsample: int = 0
    mlp: Sequence[int] = ()
    mlp2: Sequence[int] = ()  # optional post-pool MLP (reference arg)
    group_all: bool = False
    pooling: str = "max"
    use_knn: bool = False
    use_xyz: bool = True
    use_bn: bool = True
    bn_axis: str | tuple[str, ...] | None = None  # cross-shard BN stats (nn/layers.py)
    ops_impl: str = "auto"
    fps_segments: int = 1  # >1: segmented FPS approximation where eligible
    fps_segment_mode: str = "contiguous"  # contiguous|strided|spatial
    # neighborhood K-selection: "first" (reference first-K-in-input-order)
    # | "strided" (subsample-robust systematic sample; ops/ball_query.py)
    select: str = "first"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, xyz, points=None, valid=None, train: bool = False, fps_idx=None
    ):
        """Returns (new_xyz (B,P,3), new_points (B,P,C_out), new_valid).

        ``fps_idx``: optional precomputed (B, npoint) FPS indices (see
        ``sample_and_group``)."""
        if self.group_all:
            new_xyz, new_points, _, grouped_xyz = sample_and_group_all(
                xyz, points, self.use_xyz
            )
            group_mask = (
                valid[:, None, :] if valid is not None else None
            )  # (B, 1, N)
            new_valid = None
        else:
            new_xyz, new_points, _, grouped_xyz, pts_cnt = sample_and_group(
                self.npoint,
                self.radius,
                self.nsample,
                xyz,
                points,
                valid,
                self.use_knn,
                self.use_xyz,
                self.ops_impl,
                fps_idx,
                self.fps_segments,
                self.fps_segment_mode,
                self.select,
            )
            # Parity note: groups are self-padded by replicate-first, so no
            # group mask is needed for "max" (the reference relies on this).
            # Empty groups (cnt==0, only possible for masked-out centers)
            # are zeroed via new_valid.
            group_mask = None
            new_valid = pts_cnt > 0 if valid is not None else None

        new_points = new_points.astype(self.dtype)
        new_points = PointMLP(
            self.mlp, use_bn=self.use_bn, bn_axis=self.bn_axis,
            dtype=self.dtype, name="mlp",
        )(new_points, mask=group_mask, train=train)

        k_axis = 2  # (B, P, K, C)
        if self.pooling == "max":
            if group_mask is not None:
                pooled = masked_max(new_points, group_mask, axis=k_axis)
            else:
                pooled = jnp.max(new_points, axis=k_axis)
        elif self.pooling == "avg":
            if group_mask is not None:
                pooled = masked_mean(new_points, group_mask, axis=k_axis)
            else:
                pooled = jnp.mean(new_points, axis=k_axis)
        elif self.pooling == "weighted_avg":
            # reference: softmax over -dist weights inside each group
            d = jnp.linalg.norm(grouped_xyz.astype(self.dtype), axis=-1, keepdims=True)
            w = nn.softmax(-d, axis=k_axis)
            pooled = jnp.sum(new_points * w, axis=k_axis)
        elif self.pooling == "max_and_avg":
            mx = jnp.max(new_points, axis=k_axis)
            av = jnp.mean(new_points, axis=k_axis)
            pooled = jnp.concatenate([mx, av], axis=-1)
        else:
            raise ValueError(f"unknown pooling {self.pooling}")

        if self.mlp2:
            pooled = PointMLP(
                self.mlp2, use_bn=self.use_bn, bn_axis=self.bn_axis,
                dtype=self.dtype, name="mlp2",
            )(pooled, mask=new_valid, train=train)
        if new_valid is not None:
            pooled = jnp.where(new_valid[..., None], pooled, 0.0)
        return new_xyz, pooled, new_valid


class PointNetSAModuleMSG(nn.Module):
    """Multi-scale grouping SA module, ``pointnet_sa_module_msg`` parity:
    one FPS, per-scale ball query + MLP + max, channel concat."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    use_xyz: bool = True
    use_bn: bool = True
    bn_axis: str | tuple[str, ...] | None = None  # cross-shard BN stats (nn/layers.py)
    ops_impl: str = "auto"
    fps_segments: int = 1  # >1: segmented FPS approximation where eligible
    fps_segment_mode: str = "contiguous"  # contiguous|strided|spatial
    select: str = "first"  # neighborhood K-selection (see PointNetSAModule)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, points=None, valid=None, train: bool = False):
        fps_idx = ops.farthest_point_sample(
            self.npoint, xyz, valid, impl=self.ops_impl,
            segments=ops.eligible_fps_segments(
                self.fps_segments, self.npoint, xyz.shape[1]
            ),
            segment_mode=self.fps_segment_mode,
        )
        new_xyz = ops.gather_point(xyz, fps_idx)
        outs = []
        any_cnt = None
        # one fused distance pass serves every concentric scale
        per_scale = ops.query_ball_group_multi(
            self.radius_list, self.nsample_list, xyz, new_xyz, valid,
            impl=self.ops_impl, select=self.select,
        )
        for s, ((idx, cnt, grouped_xyz), mlp) in enumerate(
            zip(per_scale, self.mlp_list, strict=True)
        ):
            any_cnt = cnt if any_cnt is None else jnp.maximum(any_cnt, cnt)
            if points is not None:
                gp = ops.group_point(points, idx)
                feats = (
                    jnp.concatenate([grouped_xyz, gp], -1) if self.use_xyz else gp
                )
            else:
                feats = grouped_xyz
            feats = PointMLP(
                mlp, use_bn=self.use_bn, bn_axis=self.bn_axis,
                dtype=self.dtype, name=f"mlp_s{s}",
            )(feats.astype(self.dtype), train=train)
            outs.append(jnp.max(feats, axis=2))
        out = jnp.concatenate(outs, axis=-1)
        new_valid = any_cnt > 0 if valid is not None else None
        if new_valid is not None:
            out = jnp.where(new_valid[..., None], out, 0.0)
        return new_xyz, out, new_valid


class PointNetFPModule(nn.Module):
    """Feature propagation, ``pointnet_fp_module`` parity: three_nn ->
    inverse-distance interpolate -> skip concat -> unit MLP.

    ``interp`` picks the interpolation implementation explicitly:
      - "exact": the reference-exact gather + k-ordered weighted sum;
      - "mm": the MXU sparse-matmul kernel (``ops.three_interpolate_mm``)
        — equal to exact up to fp32 summation order (~1 ulp), NOT
        bit-identical; the deviation is intentional and tested
        (tests/test_nn.py, tests/test_ops.py, tpu_smoke on-chip);
      - "auto" (default): "mm" when ``ops_impl`` resolves to pallas (the
        TPU production path), "exact" elsewhere.
    """

    mlp: Sequence[int]
    use_bn: bool = True
    bn_axis: str | tuple[str, ...] | None = None  # cross-shard BN stats (nn/layers.py)
    ops_impl: str = "auto"
    interp: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz1,
        xyz2,
        points1,
        points2,
        valid1=None,
        valid2=None,
        train: bool = False,
    ):
        """xyz1 (B,N,3) targets w/ skip feats points1 (B,N,C1) or None;
        xyz2 (B,M,3) sources w/ feats points2 (B,M,C2) -> (B,N,mlp[-1])."""
        dist, idx = ops.three_nn(xyz1, xyz2, valid2, impl=self.ops_impl)
        weight = ops.three_interpolate_weights(dist)
        from gspn_tpu.ops.common import resolve_impl

        if self.interp not in ("auto", "exact", "mm"):
            raise ValueError(
                f"interp must be auto|exact|mm, got {self.interp!r}"
            )
        use_mm = self.interp == "mm" or (
            self.interp == "auto" and resolve_impl(self.ops_impl) == "pallas"
        )
        if use_mm:
            interp = ops.three_interpolate_mm(points2, idx, weight)
        else:
            interp = ops.three_interpolate(points2, idx, weight)
        if points1 is not None:
            feats = jnp.concatenate([interp, points1], axis=-1)
        else:
            feats = interp
        out = PointMLP(
            self.mlp, use_bn=self.use_bn, bn_axis=self.bn_axis,
            dtype=self.dtype, name="mlp",
        )(feats.astype(self.dtype), mask=valid1, train=train)
        if valid1 is not None:
            out = jnp.where(valid1[..., None], out, 0.0)
        return out
