"""NN building blocks — PointNet++ modules and layer helpers (replaces the
reference's ``utils/pointnet_util.py`` + ``utils/tf_util.py``)."""

from gspn_tpu.nn.layers import (
    FCLayers,
    MaskedBatchNorm,
    PointMLP,
    masked_max,
    masked_mean,
)
from gspn_tpu.nn.pointnet2 import (
    PointNetFPModule,
    PointNetSAModule,
    PointNetSAModuleMSG,
    sample_and_group,
    sample_and_group_all,
)

__all__ = [
    "FCLayers",
    "MaskedBatchNorm",
    "PointMLP",
    "PointNetFPModule",
    "PointNetSAModule",
    "PointNetSAModuleMSG",
    "masked_max",
    "masked_mean",
    "sample_and_group",
    "sample_and_group_all",
]
