"""Point-cloud op library — TPU-native replacements for the reference's
``tf_ops/`` custom CUDA/C++ TF ops (SURVEY.md §2.1).

Every op is jittable, static-shaped, batch-first, and takes optional
validity masks so padded points flow through the whole pipeline.
"""

from gspn_tpu.ops.ball_group import query_ball_group_multi
from gspn_tpu.ops.ball_query import query_ball_point, query_ball_point_multi
from gspn_tpu.ops.box_group import query_box_group
from gspn_tpu.ops.chamfer import chamfer_loss, nn_distance
from gspn_tpu.ops.common import pairwise_sqdist
from gspn_tpu.ops.fps import (
    eligible_fps_segments,
    farthest_point_sample,
    shared_eligible_fps_segments,
    spatial_sorted_view,
)
from gspn_tpu.ops.grouping import gather_point, group_point, knn_point
from gspn_tpu.ops.interpolate import (
    three_interpolate_mm,
    three_interpolate,
    three_interpolate_weights,
    three_nn,
)
from gspn_tpu.ops.mask_project import (
    nearest_sample_logit,
    nearest_sample_logit_boxed,
)
from gspn_tpu.ops.morton import apply_order, morton_codes, spatial_order
from gspn_tpu.ops.nms import box_iou, box_volume, nms_3d, nms_3d_batched
from gspn_tpu.ops.sampling import prob_sample, random_prob_sample

__all__ = [
    "box_iou",
    "box_volume",
    "chamfer_loss",
    "eligible_fps_segments",
    "farthest_point_sample",
    "shared_eligible_fps_segments",
    "spatial_sorted_view",
    "gather_point",
    "group_point",
    "knn_point",
    "three_interpolate_mm",
    "apply_order",
    "morton_codes",
    "spatial_order",
    "nearest_sample_logit",
    "nearest_sample_logit_boxed",
    "nms_3d",
    "nms_3d_batched",
    "nn_distance",
    "pairwise_sqdist",
    "prob_sample",
    "query_ball_group_multi",
    "query_ball_point",
    "query_ball_point_multi",
    "query_box_group",
    "random_prob_sample",
    "three_interpolate",
    "three_interpolate_weights",
    "three_nn",
]
