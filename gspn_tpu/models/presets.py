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


def scannet_pipeline(
    num_seeds: int = 64,
    num_classes: int = 18,
    feature_dim: int = 0,
    dtype: Any = jnp.float32,
) -> PipelineConfig:
    return PipelineConfig(
        gspn=GSPNConfig(
            context_radii=(0.25, 0.5, 1.0),
            context_nsample=(32, 64, 128),
            encoder_mlp=(64, 128, 256),
            num_gen_points=256,
            feature_dim=feature_dim,
            dtype=dtype,
        ),
        rpointnet=RPointNetConfig(
            num_classes=num_classes, feature_dim=feature_dim, dtype=dtype
        ),
        num_seeds=num_seeds,
    )
