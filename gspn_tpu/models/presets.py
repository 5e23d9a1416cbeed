"""Model/pipeline configuration presets.

``scannet_pipeline`` is the flagship full-scene instance-segmentation
setup (BASELINE.json configs 3/4); ``dtype=jnp.bfloat16`` switches every
MLP/head to bf16 compute (params stay f32) — the MXU-native precision.
Point-op kernels (FPS, ball query, chamfer, NMS) always run f32: their
outputs are indices and their semantics depend on exact comparisons.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from gspn_tpu.models.gspn import GSPNConfig
from gspn_tpu.models.pipeline import PipelineConfig
from gspn_tpu.models.rpointnet import RPointNetConfig


def _scale(t, m):
    return tuple(int(x * m) for x in t)


def scale_gspn_widths(cfg: GSPNConfig, mult: int) -> GSPNConfig:
    """Scale every GSPN MLP/FC width (and the conditioning dim) by
    ``mult``. Latent dim and context geometry are untouched. The bf16
    width study (STATUS.md) uses this; trainers expose it as
    ``--width-mult`` — stage-2 / eval restores must use the same
    multiplier as the checkpoint they load."""
    import dataclasses

    return dataclasses.replace(
        cfg,
        encoder_mlp=_scale(cfg.encoder_mlp, mult),
        center_mlp=_scale(cfg.center_mlp, mult),
        center_fc=_scale(cfg.center_fc, mult),
        generator_fc=_scale(cfg.generator_fc, mult),
        objectness_fc=_scale(cfg.objectness_fc, mult),
        cond_dim=int(cfg.cond_dim * mult),
    )


def scale_rpointnet_widths(cfg: RPointNetConfig, mult: int) -> RPointNetConfig:
    """Scale every backbone/head MLP width by ``mult`` (sampling
    geometry — npoint/radius/nsample/roi_samples — untouched)."""
    import dataclasses

    from gspn_tpu.models.rpointnet import SALayerSpec

    return dataclasses.replace(
        cfg,
        sa_layers=tuple(
            SALayerSpec(s.npoint, s.radius, s.nsample, _scale(s.mlp, mult))
            for s in cfg.sa_layers
        ),
        fp_mlps=tuple(_scale(m, mult) for m in cfg.fp_mlps),
        roi_mlp=_scale(cfg.roi_mlp, mult),
        cls_fc=_scale(cfg.cls_fc, mult),
        box_fc=_scale(cfg.box_fc, mult),
        mask_mlp=_scale(cfg.mask_mlp, mult),
    )


def scale_pipeline_widths(cfg: PipelineConfig, mult: int) -> PipelineConfig:
    import dataclasses

    return dataclasses.replace(
        cfg,
        gspn=scale_gspn_widths(cfg.gspn, mult),
        rpointnet=scale_rpointnet_widths(cfg.rpointnet, mult),
    )


def set_pipeline_dtype(cfg: PipelineConfig, dtype: Any) -> PipelineConfig:
    """Switch both stages' MLP/head compute dtype (params stay f32;
    point-op kernels always run f32 — see module docstring)."""
    import dataclasses

    return dataclasses.replace(
        cfg,
        gspn=dataclasses.replace(cfg.gspn, dtype=dtype),
        rpointnet=dataclasses.replace(cfg.rpointnet, dtype=dtype),
    )


def set_pipeline_fps_segments(
    cfg: PipelineConfig, segments: int, mode: str = "contiguous"
) -> PipelineConfig:
    """Enable the segmented parallel-chain FPS approximation in both
    stages (seed sampling + every eligible backbone SA layer). Cuts the
    sequential greedy chain ``segments``-fold — a documented seed-level
    parity delta (SURVEY.md §7 hard-part #1; ops/fps.py). ``mode``
    "spatial" Morton-sorts inside the FPS op, tiling the segments
    spatially on ANY data layout (the round-4 measured recommendation —
    "contiguous" only tiles spatially on Morton-sorted data, whose layout
    was falsified for first-K grouping). Exposed as ``--fps-segments`` /
    ``--fps-segment-mode`` in the trainers, run_eval, export_serving and
    bench."""
    import dataclasses

    return dataclasses.replace(
        cfg,
        gspn=dataclasses.replace(
            cfg.gspn, fps_segments=segments, fps_segment_mode=mode
        ),
        rpointnet=dataclasses.replace(
            cfg.rpointnet, fps_segments=segments, fps_segment_mode=mode
        ),
    )


def set_pipeline_group_select(cfg: PipelineConfig, select: str) -> PipelineConfig:
    """Switch BOTH stages' neighborhood K-selection: "first" (reference
    first-K-in-input-order) or "strided" (subsample-robust systematic
    sample — for spatially-coherent raw layouts, e.g. Morton-sorted or
    scan-ordered exports, where first-K collapses a ball's sample to its
    z-lowest corner; see ops/ball_query.py and the STATUS.md round-4
    mechanism study). Applies to GSPN context crops, backbone SA
    neighborhoods and RoI in-box sampling. Exposed as ``--group-select``
    in the trainers, run_eval and bench."""
    import dataclasses

    return dataclasses.replace(
        cfg,
        gspn=dataclasses.replace(cfg.gspn, group_select=select),
        rpointnet=dataclasses.replace(cfg.rpointnet, group_select=select),
    )


def scannet_pipeline(
    num_seeds: int = 64,
    num_classes: int = 18,
    feature_dim: int = 0,
    dtype: Any = jnp.float32,
    fps_segments: int = 8,
    fps_segment_mode: str = "spatial",
    sa1_fps_segments: int = 0,
    group_select: str = "first",
) -> PipelineConfig:
    """Flagship scene-level inference preset.

    Defaults to spatial segmented FPS (S=8, Morton sort inside the op —
    ops/fps.py): measured on the r4 40k checkpoints it is AP-BETTER than
    exact greedy FPS (AP 0.314 [0.278, 0.374] vs 0.248 [0.211, 0.300];
    AP@0.5 / AP@0.25 CIs disjoint — equal-count Morton tiles allocate
    seeds by point density, so 45% of seeds land on instances vs exact's
    19% and every instance gets a seed) while cutting whole-scene FPS
    latency ~1.6x (STATUS.md round-4 tables). Pass ``fps_segments=1``
    (or ``--fps-segments 1`` on the CLIs) for the reference's exact
    greedy sampling."""
    return PipelineConfig(
        gspn=GSPNConfig(
            context_radii=(0.25, 0.5, 1.0),
            context_nsample=(32, 64, 128),
            encoder_mlp=(64, 128, 256),
            num_gen_points=256,
            feature_dim=feature_dim,
            dtype=dtype,
            fps_segments=fps_segments,
            fps_segment_mode=fps_segment_mode,
            group_select=group_select,
        ),
        rpointnet=RPointNetConfig(
            num_classes=num_classes, feature_dim=feature_dim, dtype=dtype,
            fps_segments=fps_segments,
            fps_segment_mode=fps_segment_mode,
            group_select=group_select,
        ),
        num_seeds=num_seeds,
        # >0: decoupled backbone-sa1 FPS pass at this segment count (the
        # shared pass is seed-capped at S=8; sa1's 1024-pick chain is
        # eligible far higher — models/pipeline.py::_split_fps_indices)
        sa1_fps_segments=sa1_fps_segments,
    )
