"""R-PointNet — instance segmentation over GSPN proposals, TPU-native.

Re-implements the reference's second-stage model (``models/
model_rpointnet.py``-equivalent; reconstructed from the paper + SURVEY.md
§2.2 [K-PAPER]):

(a) backbone: PointNet++ SA x4 + FP x4 over the scene -> per-point features;
(b) proposals -> axis-aligned RoI boxes from generated-shape extents;
(c) Point RoIAlign: a fixed number of scene points sampled inside each RoI,
    coordinates canonicalized to the RoI frame, backbone features gathered
    (the reference interpolates via three_nn because its sample points may
    not be dataset points; ours are, so the gather IS the interpolation and
    runs as one fused HLO);
(d) heads: per-RoI PointNet -> classification over semantic classes (+
    background), per-point MLP -> binary instance mask inside the RoI, and
    a box-refinement regressor.

Training matches RoIs to GT instances by 3D IoU (fg > fg_thresh, bg <
bg_thresh) with softmax CE (cls), per-point BCE on foreground RoIs (mask),
and huber (box) — all masked, all on-device. NMS is on-device too
(``ops.nms_3d_batched``), so full-scene inference is one XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from gspn_tpu import ops
from gspn_tpu.models.gspn import huber
from gspn_tpu.nn.layers import FCLayers, PointMLP
from gspn_tpu.nn.pointnet2 import PointNetFPModule, PointNetSAModule


@dataclasses.dataclass(frozen=True)
class SALayerSpec:
    npoint: int
    radius: float
    nsample: int
    mlp: tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class RPointNetConfig:
    # backbone (ScanNet-scale defaults; reference uses SA x4 + FP x4)
    sa_layers: tuple[SALayerSpec, ...] = (
        SALayerSpec(1024, 0.1, 32, (32, 32, 64)),
        SALayerSpec(256, 0.2, 32, (64, 64, 128)),
        SALayerSpec(64, 0.4, 32, (128, 128, 256)),
        SALayerSpec(16, 0.8, 32, (256, 256, 512)),
    )
    fp_mlps: tuple[tuple[int, ...], ...] = (
        (256, 256),
        (256, 256),
        (256, 128),
        (128, 128, 128),
    )
    feature_dim: int = 0  # extra per-point input features
    # RoI align + heads
    roi_samples: int = 64
    # RoI sampling mode:
    #   "inbox": gather in-box *dataset* points; the feature gather IS the
    #            interpolation (TPU-first default, one fused HLO).
    #   "grid":  reference-faithful (SURVEY.md §2.2 (c)): fixed free points
    #            on a canonical grid inside the box, backbone features
    #            interpolated at them via three_nn/three_interpolate.
    roi_sample: str = "inbox"
    # "inbox" only: sample in-box points uniformly at random (the
    # reference's randomized sampling; needs an 'roi' rng at train time)
    # instead of first-S-in-input-order.
    roi_randomize: bool = False
    roi_mlp: tuple[int, ...] = (128, 256)
    cls_fc: tuple[int, ...] = (256, 128)
    box_fc: tuple[int, ...] = (256, 128)
    mask_mlp: tuple[int, ...] = (128, 128)
    num_classes: int = 18  # semantic classes (ScanNet benchmark = 18)
    head_dropout: float = 0.0  # dropout in cls/box FC heads (reference:
    #                            tf_util.dropout; needs a 'dropout' rng)
    # matching / NMS
    fg_iou: float = 0.5
    bg_iou: float = 0.25
    nms_iou: float = 0.25
    box_margin: float = 0.1
    use_bn: bool = True
    # mesh-axis name for cross-shard BN train statistics (set by the
    # point-sharded trainer, parallel/train_points.py; None = local)
    bn_axis: str | tuple[str, ...] | None = None
    remat: bool = False  # rematerialize SA/FP activations (trade FLOPs for
    #                      HBM — lets much larger scenes fit in training)
    ops_impl: str = "auto"
    # >1: segmented parallel-chain FPS approximation in SA layers where
    # eligible (ops.eligible_fps_segments) — cuts the sequential greedy
    # chain S-fold at a documented seed-level parity delta. Pair with the
    # Morton data layout (--morton) for near-exact coverage.
    fps_segments: int = 1
    # how fps_segments partitions the scene: contiguous|strided|spatial
    # ("spatial" Morton-sorts inside the op; see ops/fps.py)
    fps_segment_mode: str = "contiguous"
    # SA-neighborhood + RoI in-box K-selection: "first" (reference) |
    # "strided" (subsample-robust; see GSPNConfig.group_select)
    group_select: str = "first"
    dtype: Any = jnp.float32


class Backbone(nn.Module):
    """PointNet++ SA x k + FP x k -> per-point feature map (B, N, C)."""

    config: RPointNetConfig

    @nn.compact
    def __call__(
        self,
        xyz,
        features=None,
        valid=None,
        train: bool = False,
        sa1_fps_idx=None,
    ):
        cfg = self.config
        # static_argnums index includes self (0); `train` is positional
        SA = (
            nn.remat(PointNetSAModule, static_argnums=(4,))
            if cfg.remat
            else PointNetSAModule
        )
        FP = (
            nn.remat(PointNetFPModule, static_argnums=(7,))
            if cfg.remat
            else PointNetFPModule
        )
        xs, fs, vs = [xyz], [features], [valid]
        for i, spec in enumerate(cfg.sa_layers):
            nx, nf, nv = SA(
                npoint=spec.npoint,
                radius=spec.radius,
                nsample=spec.nsample,
                mlp=spec.mlp,
                use_bn=cfg.use_bn,
                bn_axis=cfg.bn_axis,
                ops_impl=cfg.ops_impl,
                fps_segments=cfg.fps_segments,
                fps_segment_mode=cfg.fps_segment_mode,
                select=cfg.group_select,
                dtype=cfg.dtype,
                name=f"sa{i + 1}",
            )(xs[-1], fs[-1], vs[-1], train, sa1_fps_idx if i == 0 else None)
            xs.append(nx)
            fs.append(nf)
            vs.append(nv)
        feat = fs[-1]
        for i, mlp in enumerate(cfg.fp_mlps):
            lvl = len(cfg.sa_layers) - 1 - i  # target level
            feat = FP(
                mlp, use_bn=cfg.use_bn, bn_axis=cfg.bn_axis,
                ops_impl=cfg.ops_impl, dtype=cfg.dtype, name=f"fp{i + 1}",
            )(
                xs[lvl],
                xs[lvl + 1],
                fs[lvl],
                feat,
                vs[lvl],
                vs[lvl + 1],
                train,
            )
        return feat  # (B, N, fp_mlps[-1][-1])


# ---------------------------------------------------------------------------
# Point RoIAlign
# ---------------------------------------------------------------------------


def point_roi_align(xyz, boxes, s: int, valid=None, rng=None, impl="auto",
                    select="first"):
    """Sample ``s`` scene points inside each box (cycling with replacement
    when the box holds fewer), canonicalize to the RoI frame.

    With ``rng=None``, takes the first ``s`` in input order (deterministic);
    with an rng, a uniform random in-box subset without replacement (the
    reference's randomized RoI sampling) via Gumbel top-k.

    The deterministic path runs on the fused in-box extraction kernel
    (``ops.box_group``) when ``impl`` resolves to pallas — bit-identical
    to the mask+top_k formulation (tested in tests/test_roi_modes.py) but
    without the per-row full-width top_k pass.

    xyz (B, N, 3), boxes (B, R, 6) -> (idx (B, R, S) i32,
    canon (B, R, S, 3), roi_valid (B, R) bool, in_cnt (B, R) i32).
    """
    n = xyz.shape[1]
    extent = jnp.maximum(boxes[..., 3:6] - boxes[..., 0:3], 1e-6)
    if rng is None:
        from gspn_tpu.ops.box_group import query_box_group

        first_s, cnt, local = query_box_group(
            boxes, s, xyz, valid, impl=impl, select=select
        )
        # cycle with replacement: slot k -> hit[k mod cnt]; cnt is capped
        # at s, which leaves the wrap unchanged (k < s <= uncapped cnt
        # implies k mod cnt == k in both conventions)
        k = jnp.arange(s, dtype=jnp.int32)
        wrap = jnp.mod(
            jnp.broadcast_to(k, first_s.shape), jnp.maximum(cnt, 1)[..., None]
        )
        idx = jnp.take_along_axis(first_s, wrap, axis=-1)
        roi_valid = cnt > 0
        idx = jnp.where(roi_valid[..., None], idx, 0)
        canon = jnp.take_along_axis(local, wrap[..., None], axis=-2) / (
            extent[..., None, :]
        )
        return idx, canon, roi_valid, cnt

    lo = boxes[..., None, 0:3]  # (B, R, 1, 3)
    hi = boxes[..., None, 3:6]
    p = xyz[:, None, :, :]  # (B, 1, N, 3)
    inside = jnp.all(jnp.logical_and(p >= lo, p <= hi), axis=-1)  # (B, R, N)
    if valid is not None:
        inside = jnp.logical_and(inside, valid[:, None, :])
    # uniform subset w/o replacement: top-s of iid gumbel noise
    g = jax.random.gumbel(rng, inside.shape, jnp.float32)
    _, first_s = jax.lax.top_k(jnp.where(inside, g, -jnp.inf), s)
    first_s = first_s.astype(jnp.int32)
    cnt = jnp.sum(inside, axis=-1).astype(jnp.int32)
    # cycle with replacement: slot k -> first_s[k mod cnt]
    k = jnp.arange(s, dtype=jnp.int32)
    wrap = jnp.mod(
        jnp.broadcast_to(k, first_s.shape), jnp.maximum(cnt, 1)[..., None]
    )
    idx = jnp.take_along_axis(first_s, wrap, axis=-1)
    roi_valid = cnt > 0
    idx = jnp.where(roi_valid[..., None], idx, 0)

    b, r, _ = idx.shape
    pts = jnp.take_along_axis(xyz, idx.reshape(b, r * s, 1), axis=1)
    pts = pts.reshape(b, r, s, 3)
    center = (boxes[..., 0:3] + boxes[..., 3:6]) * 0.5
    canon = (pts - center[..., None, :]) / extent[..., None, :]
    return idx, canon, roi_valid, jnp.minimum(cnt, s)


def gather_roi_features(features, idx):
    """(B, N, C), (B, R, S) -> (B, R, S, C)."""
    b, r, s = idx.shape
    c = features.shape[-1]
    flat = jnp.take_along_axis(features, idx.reshape(b, r * s, 1), axis=1)
    return flat.reshape(b, r, s, c)


def _grid_factors(s: int) -> tuple[int, int, int]:
    """Near-cubic (gx, gy, gz) with gx*gy*gz == s (64 -> 4x4x4)."""
    best = (1, 1, s)
    for gx in range(1, int(round(s ** (1 / 3))) + 2):
        if s % gx:
            continue
        rem = s // gx
        for gy in range(gx, int(rem ** 0.5) + 2):
            if rem % gy:
                continue
            gz = rem // gy
            if max(gx, gy, gz) - min(gx, gy, gz) <= max(*best) - min(*best):
                best = (gx, gy, gz)
    return best


def roi_grid_points(boxes, s: int):
    """Reference-faithful RoI sample points (SURVEY.md §2.2 (c)): ``s``
    free points on a canonical cell-center grid inside each box.

    boxes (B, R, 6) -> (world (B, R, S, 3), canon (B, R, S, 3)); canon is
    constant across RoIs (cell centers in [-0.5, 0.5]^3).
    """
    gx, gy, gz = _grid_factors(s)
    ax = [(jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5 for g in (gx, gy, gz)]
    canon = jnp.stack(jnp.meshgrid(*ax, indexing="ij"), axis=-1).reshape(s, 3)
    center = (boxes[..., 0:3] + boxes[..., 3:6]) * 0.5
    extent = jnp.maximum(boxes[..., 3:6] - boxes[..., 0:3], 1e-6)
    world = center[..., None, :] + canon * extent[..., None, :]
    canon_b = jnp.broadcast_to(canon, world.shape)
    return world, canon_b


def interpolate_roi_features(xyz, features, world, valid=None, impl="auto"):
    """Backbone features at free RoI sample points via three_nn +
    inverse-distance three_interpolate (the reference's Point RoIAlign
    feature path). xyz (B,N,3), features (B,N,C), world (B,R,S,3) ->
    (feats (B,R,S,C), nn_idx (B,R,S) nearest dataset point per sample)."""
    from gspn_tpu import ops

    b, r, s, _ = world.shape
    targets = world.reshape(b, r * s, 3)
    dist, idx3 = ops.three_nn(targets, xyz, valid, impl=impl)
    w = ops.three_interpolate_weights(dist)
    feats = ops.three_interpolate(features, idx3, w)
    return (
        feats.reshape(b, r, s, features.shape[-1]),
        idx3[..., 0].reshape(b, r, s).astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class RoIOutputs:
    cls_logits: jax.Array  # (B, R, num_classes + 1); class 0 = background
    box_deltas: jax.Array  # (B, R, 6): center offset (×extent) + log-scale
    mask_logits: jax.Array  # (B, R, S)
    roi_idx: jax.Array  # (B, R, S) scene-point index per sample ("inbox":
    #                     the sampled point; "grid": its nearest neighbor —
    #                     used for mask training targets)
    roi_xyz: jax.Array  # (B, R, S, 3) world coords of the sample points
    roi_valid: jax.Array  # (B, R) bool


class RoIHeads(nn.Module):
    config: RPointNetConfig

    @nn.compact
    def __call__(self, canon, roi_feats, roi_valid, train: bool = False):
        """canon (B,R,S,3), roi_feats (B,R,S,C) -> RoI head outputs
        (roi_idx filled by caller)."""
        cfg = self.config
        x = jnp.concatenate([canon.astype(cfg.dtype), roi_feats], axis=-1)
        pt = PointMLP(
            cfg.roi_mlp, use_bn=cfg.use_bn, bn_axis=cfg.bn_axis,
            dtype=cfg.dtype, name="roi_mlp",
        )(x, train=train)  # (B, R, S, C')
        pooled = jnp.max(pt, axis=-2)  # (B, R, C')
        cls_logits = FCLayers(
            cfg.cls_fc, cfg.num_classes + 1, dropout=cfg.head_dropout,
            dtype=cfg.dtype, name="cls",
        )(pooled, train)
        box_deltas = FCLayers(
            cfg.box_fc, 6, dropout=cfg.head_dropout, dtype=cfg.dtype,
            name="box",
        )(pooled, train)
        per_pt = jnp.concatenate(
            [pt, jnp.broadcast_to(pooled[..., None, :], pt.shape[:-1] + (pooled.shape[-1],))],
            axis=-1,
        )
        mask_logits = PointMLP(
            cfg.mask_mlp,
            use_bn=cfg.use_bn,
            bn_axis=cfg.bn_axis,
            last_activation=True,
            dtype=cfg.dtype,
            name="mask_mlp",
        )(per_pt, train=train)
        mask_logits = nn.Dense(
            1, dtype=cfg.dtype, param_dtype=jnp.float32, name="mask_out"
        )(mask_logits)[..., 0]
        return (
            cls_logits.astype(jnp.float32),
            box_deltas.astype(jnp.float32),
            mask_logits.astype(jnp.float32),
        )


class RPointNet(nn.Module):
    """Backbone + Point RoIAlign + heads. Proposal boxes come from GSPN
    (or GT-perturbed boxes during isolated stage-2 training)."""

    config: RPointNetConfig

    @nn.compact
    def __call__(
        self,
        xyz,
        boxes,
        features=None,
        valid=None,
        train: bool = False,
        sa1_fps_idx=None,  # precomputed FPS prefix for the first SA layer
    ) -> RoIOutputs:
        cfg = self.config
        feat = Backbone(cfg, name="backbone")(
            xyz, features, valid, train, sa1_fps_idx
        )
        if cfg.roi_sample == "grid":
            # reference-faithful: free grid points + three_nn interpolation
            world, canon = roi_grid_points(boxes, cfg.roi_samples)
            roi_feats, idx = interpolate_roi_features(
                xyz, feat, world, valid, impl=cfg.ops_impl
            )
            # validity still = "box contains scene points"
            inside = jnp.all(
                jnp.logical_and(
                    xyz[:, None, :, :] >= boxes[..., None, 0:3],
                    xyz[:, None, :, :] <= boxes[..., None, 3:6],
                ),
                axis=-1,
            )
            if valid is not None:
                inside = jnp.logical_and(inside, valid[:, None, :])
            roi_valid = jnp.any(inside, axis=-1)
            roi_xyz = world
        elif cfg.roi_sample == "inbox":
            rng = (
                self.make_rng("roi")
                if (cfg.roi_randomize and train)
                else None
            )
            idx, canon, roi_valid, _ = point_roi_align(
                xyz, boxes, cfg.roi_samples, valid, rng=rng,
                impl=cfg.ops_impl, select=cfg.group_select,
            )
            roi_feats = gather_roi_features(feat, idx)
            b, r, s = idx.shape
            roi_xyz = jnp.take_along_axis(
                xyz, idx.reshape(b, r * s, 1), axis=1
            ).reshape(b, r, s, 3)
        else:
            raise ValueError(
                f"roi_sample must be inbox|grid, got {cfg.roi_sample!r}"
            )
        cls_logits, box_deltas, mask_logits = RoIHeads(cfg, name="heads")(
            canon, roi_feats, roi_valid, train
        )
        neg = jnp.asarray(-1e4, jnp.float32)
        cls_logits = jnp.where(roi_valid[..., None], cls_logits, 0.0)
        mask_logits = jnp.where(roi_valid[..., None], mask_logits, neg)
        return RoIOutputs(
            cls_logits=cls_logits,
            box_deltas=box_deltas,
            mask_logits=mask_logits,
            roi_idx=idx,
            roi_xyz=roi_xyz,
            roi_valid=roi_valid,
        )


# ---------------------------------------------------------------------------
# Box utilities + GT construction + matching/losses
# ---------------------------------------------------------------------------


def apply_box_deltas(boxes, deltas):
    """Refine boxes: deltas = (dxyz in extent units, dlog-extent)."""
    center = (boxes[..., 0:3] + boxes[..., 3:6]) * 0.5
    extent = jnp.maximum(boxes[..., 3:6] - boxes[..., 0:3], 1e-6)
    new_center = center + deltas[..., 0:3] * extent
    new_extent = extent * jnp.exp(jnp.clip(deltas[..., 3:6], -4.0, 4.0))
    return jnp.concatenate(
        [new_center - new_extent / 2, new_center + new_extent / 2], axis=-1
    )


def box_deltas_between(src, dst):
    """Inverse of apply_box_deltas: the regression target taking src->dst."""
    sc = (src[..., 0:3] + src[..., 3:6]) * 0.5
    se = jnp.maximum(src[..., 3:6] - src[..., 0:3], 1e-6)
    dc = (dst[..., 0:3] + dst[..., 3:6]) * 0.5
    de = jnp.maximum(dst[..., 3:6] - dst[..., 0:3], 1e-6)
    return jnp.concatenate([(dc - sc) / se, jnp.log(de / se)], axis=-1)


def instance_gt_boxes(xyz, inst_label, sem_label, max_instances: int):
    """Per-instance GT boxes/classes from per-point labels, on-device.

    Returns boxes (B, I, 6), cls (B, I) i32 (0 where absent),
    present (B, I) bool. Instance i occupies label value i+1.
    """
    b, n, _ = xyz.shape
    ids = jnp.arange(1, max_instances + 1, dtype=jnp.int32)
    member = inst_label[:, None, :] == ids[None, :, None]  # (B, I, N)
    present = jnp.any(member, axis=-1)
    big = jnp.asarray(1e9, xyz.dtype)
    px = xyz[:, None, :, :]
    lo = jnp.min(jnp.where(member[..., None], px, big), axis=2)
    hi = jnp.max(jnp.where(member[..., None], px, -big), axis=2)
    boxes = jnp.where(
        present[..., None],
        jnp.concatenate([lo, hi], -1),
        jnp.zeros((b, max_instances, 6), xyz.dtype),
    )
    # instance class = max semantic label over members (labels are uniform
    # within an instance by construction)
    cls = jnp.max(
        jnp.where(member, sem_label[:, None, :], 0), axis=-1
    ).astype(jnp.int32)
    return boxes, cls, present


@flax.struct.dataclass
class RoIMatch:
    matched_inst: jax.Array  # (B, R) i32 index into I (argmax IoU)
    matched_iou: jax.Array  # (B, R)
    is_fg: jax.Array  # (B, R) bool
    is_bg: jax.Array  # (B, R) bool
    cls_target: jax.Array  # (B, R) i32, 0 = background
    box_target: jax.Array  # (B, R, 6) deltas (valid on fg)


def match_rois(rois, roi_valid, gt_boxes, gt_cls, gt_present, fg_iou, bg_iou):
    """IoU matching of proposal boxes to GT instance boxes."""
    iou = ops.box_iou(rois, gt_boxes)  # (B, R, I)
    iou = jnp.where(gt_present[:, None, :], iou, -1.0)
    matched = jnp.argmax(iou, axis=-1).astype(jnp.int32)
    best = jnp.max(iou, axis=-1)
    is_fg = jnp.logical_and(best >= fg_iou, roi_valid)
    is_bg = jnp.logical_and(best < bg_iou, roi_valid)
    cls_t = jnp.where(
        is_fg, jnp.take_along_axis(gt_cls, matched, axis=1), 0
    ).astype(jnp.int32)
    mb = jnp.take_along_axis(
        gt_boxes, matched[..., None], axis=1
    )  # (B, R, 6)
    box_t = box_deltas_between(rois, mb)
    return RoIMatch(
        matched_inst=matched,
        matched_iou=best,
        is_fg=is_fg,
        is_bg=is_bg,
        cls_target=cls_t,
        box_target=box_t,
    )


def rpointnet_loss(
    out: RoIOutputs,
    match: RoIMatch,
    inst_label,  # (B, N) i32
    cls_weight: float = 1.0,
    box_weight: float = 1.0,
    mask_weight: float = 1.0,
    axis_name: str | tuple[str, ...] | None = None,
):
    """cls CE over fg+bg, box huber over fg, per-point mask BCE over fg.

    ``axis_name``: mesh axis the RoIs are sharded over (inside
    ``shard_map``) — numerators and fg/bg counts are ``psum``-ed so every
    shard computes the identical global loss (parallel/train_points.py).
    """
    train_mask = jnp.logical_or(match.is_fg, match.is_bg).astype(jnp.float32)
    fg = match.is_fg.astype(jnp.float32)

    logp = jax.nn.log_softmax(out.cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, match.cls_target[..., None], axis=-1)[..., 0]

    box_err = jnp.sum(huber(out.box_deltas - match.box_target), axis=-1)

    # mask targets: sampled point's instance == matched instance (id = i+1)
    r = out.roi_idx.shape[1]
    pt_inst = jnp.take_along_axis(
        jnp.broadcast_to(
            inst_label[:, None, :], (inst_label.shape[0], r, inst_label.shape[1])
        ),
        out.roi_idx,
        axis=-1,
    )  # (B, R, S)
    target = (pt_inst == (match.matched_inst[..., None] + 1)).astype(jnp.float32)
    logit = out.mask_logits
    bce = (
        jnp.maximum(logit, 0.0) - logit * target + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    )

    sums = (
        jnp.sum(train_mask),
        jnp.sum(fg),
        jnp.sum(match.is_bg.astype(jnp.float32)),
        jnp.sum(ce * train_mask),
        jnp.sum(box_err * fg),
        jnp.sum(jnp.mean(bce, axis=-1) * fg),
    )
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
    ntr_raw, nfg_raw, nbg, cls_sum, box_sum, mask_sum = sums
    ntr = jnp.maximum(ntr_raw, 1.0)
    nfg = jnp.maximum(nfg_raw, 1.0)
    cls_term = cls_sum / ntr
    box_term = box_sum / nfg
    mask_term = mask_sum / nfg

    total = cls_weight * cls_term + box_weight * box_term + mask_weight * mask_term
    return total, {
        "loss": total,
        "cls": cls_term,
        "box": box_term,
        "mask": mask_term,
        "num_fg": nfg_raw,
        "num_bg": nbg,
    }
