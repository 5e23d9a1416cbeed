"""Training: jitted step functions, checkpointing, configs, drivers
(replaces the reference's root-level ``train_*.py`` TF1 session loops)."""

from gspn_tpu.train.checkpoint import CheckpointManager, load_stage1_params
from gspn_tpu.train.metrics import MetricsLogger, format_metrics
from gspn_tpu.train.steps import (
    TrainState,
    make_gspn_loss_fn,
    make_gspn_train_step,
    make_rpointnet_loss_fn,
    make_train_step,
)

__all__ = [
    "CheckpointManager",
    "MetricsLogger",
    "TrainState",
    "format_metrics",
    "load_stage1_params",
    "make_gspn_loss_fn",
    "make_gspn_train_step",
    "make_rpointnet_loss_fn",
    "make_train_step",
]
