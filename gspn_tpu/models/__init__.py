"""Model zoo: GSPN CVAE proposal network and R-PointNet instance
segmentation (replaces the reference's ``models/``)."""

from gspn_tpu.models.gspn import (
    GSPN,
    GSPNConfig,
    GSPNOutputs,
    gspn_loss,
    proposal_boxes,
    shapenet_config,
)

__all__ = [
    "GSPN",
    "GSPNConfig",
    "GSPNOutputs",
    "gspn_loss",
    "proposal_boxes",
    "shapenet_config",
]
