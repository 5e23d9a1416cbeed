"""Intra-scene spatial parallelism — the point-cloud analog of sequence/
context parallelism (SURVEY.md §2.3 stretch goal).

One scene's per-seed work (multi-scale context crops + CVAE decode) and
per-RoI work (RoIAlign + heads + mask projection) shard across the mesh;
scene coordinates/features are replicated (they are small — the quadratic
and per-proposal costs are what dominate at large seed/RoI counts). NMS
needs every proposal's box+score, so those are ``all_gather``-ed over ICI
(R×7 floats — trivial) and suppression runs replicated; everything else
stays on-shard. Outputs are sharded on the proposal axis and reassembled
by shard_map's output specs.

With pre-drawn latent noise, the sharded pipeline's masks, classes and
validity are bit-identical to the single-device pipeline; scores agree to
float tolerance (the per-shard seed slice changes the MLP batch shape, so
XLA may pick a different matmul reduction order). Tested across every
``mask_project`` x ``roi_sample`` config on the virtual CPU mesh
(tests/test_spatial.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gspn_tpu import ops
from gspn_tpu.models.gspn import GSPN, proposal_boxes
from gspn_tpu.models.pipeline import (
    InstancePredictions,
    PipelineConfig,
    project_roi_masks,
    shared_fps_indices,
)
from gspn_tpu.models.rpointnet import RPointNet, apply_box_deltas


def make_spatial_inference(cfg: PipelineConfig, mesh: Mesh, axis: str = "space"):
    """Returns ``infer(variables, xyz, features, valid, z_eps) ->
    InstancePredictions`` with per-seed/per-RoI work sharded over ``axis``.

    ``cfg.num_seeds`` must divide the mesh size. ``z_eps`` is
    ``(B, num_seeds, latent)`` noise (see ``GSPN.__call__``), replicated.
    """
    nshards = mesh.shape[axis]
    if cfg.num_seeds % nshards:
        raise ValueError(
            f"num_seeds={cfg.num_seeds} not divisible by mesh axis {nshards}"
        )
    per = cfg.num_seeds // nshards
    gspn = GSPN(cfg.gspn)
    rpn = RPointNet(cfg.rpointnet)

    def shard_fn(variables, xyz, features, valid, z_eps):
        i = jax.lax.axis_index(axis)
        # seeds: FPS is global+sequential -> computed replicated (cheap),
        # each shard takes its slice of seeds. Shared with the backbone's
        # first SA layer exactly as the single-device pipeline does
        # (bit-identity depends on it).
        seed_idx, sa1_idx = shared_fps_indices(cfg, xyz, valid)
        my_seeds = jax.lax.dynamic_slice_in_dim(seed_idx, i * per, per, axis=1)
        my_eps = jax.lax.dynamic_slice_in_dim(z_eps, i * per, per, axis=1)

        gout = gspn.apply(
            variables["gspn"],
            xyz,
            my_seeds,
            features=features,
            valid=valid,
            z_eps=my_eps,
            train=False,
        )
        boxes_l = proposal_boxes(
            gout.generated, cfg.rpointnet.box_margin, cfg.box_percentile
        )
        obj_l = jax.nn.sigmoid(gout.objectness)

        # NMS is global: gather every shard's boxes+scores (tiny) over ICI
        boxes = jax.lax.all_gather(boxes_l, axis, axis=1, tiled=True)
        obj = jax.lax.all_gather(obj_l, axis, axis=1, tiled=True)
        keep = ops.nms_3d_batched(boxes, obj, cfg.rpointnet.nms_iou)

        # per-RoI work on this shard's slice
        my_boxes = jax.lax.dynamic_slice_in_dim(boxes, i * per, per, axis=1)
        my_keep = jax.lax.dynamic_slice_in_dim(keep, i * per, per, axis=1)
        my_obj = jax.lax.dynamic_slice_in_dim(obj, i * per, per, axis=1)
        out = rpn.apply(
            variables["rpointnet"],
            xyz,
            my_boxes,
            features=features,
            valid=valid,
            train=False,
            sa1_fps_idx=sa1_idx,
        )
        cls_prob = jax.nn.softmax(out.cls_logits, axis=-1)
        fg_prob = cls_prob[..., 1:]
        cls = (jnp.argmax(fg_prob, axis=-1) + 1).astype(jnp.int32)
        score = my_obj * jnp.max(fg_prob, axis=-1)
        refined = apply_box_deltas(my_boxes, out.box_deltas)
        pvalid = jnp.logical_and(
            jnp.logical_and(my_keep, out.roi_valid),
            score > cfg.score_thresh,
        )
        masks = project_roi_masks(
            xyz, refined, out.roi_xyz, out.mask_logits, cfg.mask_thresh,
            valid, mode=cfg.mask_project,
        )
        masks = jnp.logical_and(masks, pvalid[..., None])
        return InstancePredictions(
            masks=masks,
            scores=jnp.where(pvalid, score, 0.0),
            classes=cls,
            boxes=refined,
            valid=pvalid,
        )

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=InstancePredictions(
            masks=P(None, axis, None),
            scores=P(None, axis),
            classes=P(None, axis),
            boxes=P(None, axis, None),
            valid=P(None, axis),
        ),
        check_vma=False,
    )
    return jax.jit(sharded)
