"""Evaluation: ScanNet-protocol instance-segmentation AP."""

from gspn_tpu.eval.instance_eval import (
    SceneGT,
    ScenePredictions,
    evaluate_instances,
    gt_from_labels,
    predictions_from_device,
)

__all__ = [
    "SceneGT",
    "ScenePredictions",
    "evaluate_instances",
    "gt_from_labels",
    "predictions_from_device",
]
