"""Whole-pipeline in-program apportioning (VERDICT r3 #7): cumulative
prefixes of the FUSED inference program — fps, GSPN context+CVAE, NMS,
backbone, RoIAlign, heads, refine+score, mask projection — each timed as
ONE jitted program, so each stage's in-program cost is the delta of two
fused programs (dispatch floors and program-boundary layouts cancel;
``profile_backbone.py`` applies the same method inside the backbone).

The final prefix is cross-checked bit-for-bit against
``make_inference_fn`` so the decomposition cannot drift from the real
datapath.

    python scripts/profile_fused.py [--iters 20] [--wholescene]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

WARMUP = 3


def build_prefixes(cfg):
    """List of (name, fn(variables, xyz, valid, rng)) cumulative stages
    mirroring models/pipeline.py::make_inference_fn stage-for-stage."""
    from gspn_tpu import ops
    from gspn_tpu.models.gspn import GSPN, proposal_boxes
    from gspn_tpu.models.pipeline import (
        make_inference_fn,
        project_roi_masks,
        shared_fps_indices,
    )
    from gspn_tpu.models.rpointnet import (
        Backbone,
        RoIHeads,
        apply_box_deltas,
        gather_roi_features,
        point_roi_align,
    )

    gspn = GSPN(cfg.gspn)
    rcfg = cfg.rpointnet
    assert rcfg.roi_sample == "inbox", "profiler decomposes the inbox path"

    def upto(stage):
        def fn(variables, xyz, valid, rng):
            seed_idx, sa1_idx = shared_fps_indices(cfg, xyz, valid)
            if stage == "fps":
                return seed_idx, sa1_idx
            gout = gspn.apply(
                variables["gspn"], xyz, seed_idx, valid=valid, z_rng=rng,
                train=False,
            )
            boxes = proposal_boxes(
                gout.generated, rcfg.box_margin, cfg.box_percentile
            )
            obj = jax.nn.sigmoid(gout.objectness)
            if stage == "gspn":
                return boxes, obj
            keep = ops.nms_3d_batched(boxes, obj, rcfg.nms_iou)
            if stage == "nms":
                return boxes, obj, keep
            rv = variables["rpointnet"]
            bb = {
                "params": rv["params"]["backbone"],
                "batch_stats": rv.get("batch_stats", {}).get("backbone", {}),
            }
            feat = Backbone(rcfg).apply(bb, xyz, None, valid, False, sa1_idx)
            if stage == "backbone":
                return boxes, obj, keep, feat
            idx, canon, roi_valid, _ = point_roi_align(
                xyz, boxes, rcfg.roi_samples, valid, impl=rcfg.ops_impl
            )
            roi_feats = gather_roi_features(feat, idx)
            b, r, s = idx.shape
            roi_xyz = jnp.take_along_axis(
                xyz, idx.reshape(b, r * s, 1), axis=1
            ).reshape(b, r, s, 3)
            if stage == "roialign":
                return boxes, obj, keep, canon, roi_feats, roi_valid
            hv = {
                "params": rv["params"]["heads"],
                "batch_stats": rv.get("batch_stats", {}).get("heads", {}),
            }
            cls_logits, box_deltas, mask_logits = RoIHeads(rcfg).apply(
                hv, canon, roi_feats, roi_valid, False
            )
            neg = jnp.asarray(-1e4, jnp.float32)
            cls_logits = jnp.where(roi_valid[..., None], cls_logits, 0.0)
            mask_logits = jnp.where(roi_valid[..., None], mask_logits, neg)
            if stage == "heads":
                return keep, obj, cls_logits, box_deltas, mask_logits
            cls_prob = jax.nn.softmax(cls_logits, axis=-1)
            fg_prob = cls_prob[..., 1:]
            cls = (jnp.argmax(fg_prob, axis=-1) + 1).astype(jnp.int32)
            score = obj * jnp.max(fg_prob, axis=-1)
            refined = apply_box_deltas(boxes, box_deltas)
            pvalid = jnp.logical_and(
                jnp.logical_and(keep, roi_valid), score > cfg.score_thresh
            )
            if stage == "refine":
                return refined, score, cls, pvalid, mask_logits, roi_xyz
            masks = project_roi_masks(
                xyz, refined, roi_xyz, mask_logits, cfg.mask_thresh, valid,
                mode=cfg.mask_project,
            )
            masks = jnp.logical_and(masks, pvalid[..., None])
            return masks, jnp.where(pvalid, score, 0.0), cls, refined, pvalid

        return fn

    stages = [
        "fps", "gspn", "nms", "backbone", "roialign", "heads", "refine",
        "mask_project",
    ]
    return [(s, upto(s)) for s in stages], make_inference_fn(cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--wholescene", action="store_true",
                    help="B=1, N=65536 masked instead of flagship 8x8192")
    ap.add_argument("--fps-segments", type=int, default=None,
                    help="default = the preset's choice (8 spatial), "
                         "1 = exact")
    ap.add_argument("--fps-segment-mode",
                    choices=["contiguous", "strided", "spatial"],
                    default="spatial")
    args = ap.parse_args()

    from gspn_tpu.data import synthetic
    from gspn_tpu.models.pipeline import init_pipeline_variables
    from gspn_tpu.utils.timing import time_fn
    from __graft_entry__ import _flagship_pipeline_config

    cfg = _flagship_pipeline_config()
    if args.fps_segments is not None:
        from gspn_tpu.models.presets import set_pipeline_fps_segments

        cfg = set_pipeline_fps_segments(
            cfg, args.fps_segments, args.fps_segment_mode
        )
    b, n = (1, 65536) if args.wholescene else (8, 8192)
    rng = np.random.default_rng(0)
    batch = synthetic.scene_batch(
        rng, b, n_points=n, max_instances=24 if args.wholescene else 8,
        extent=8.0 if args.wholescene else 2.0,
    )
    xyz = jnp.asarray(batch["xyz"])
    valid_np = np.asarray(batch["valid"]).copy()
    if args.wholescene:
        valid_np[:, -n // 10:] = False
    valid = jnp.asarray(valid_np)
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), n)
    key = jax.random.PRNGKey(1)

    prefixes, infer = build_prefixes(cfg)

    # decomposition fidelity: the last prefix IS the pipeline
    full = jax.jit(infer)(variables, xyz, None, valid, key)
    last = jax.jit(prefixes[-1][1])(variables, xyz, valid, key)
    np.testing.assert_array_equal(np.asarray(full.masks), np.asarray(last[0]))
    np.testing.assert_array_equal(np.asarray(full.valid), np.asarray(last[4]))

    rows = {}
    prev = 0.0
    for name, fn in prefixes:
        dt = time_fn(
            jax.jit(fn), variables, xyz, valid, key,
            iters=args.iters, warmup=WARMUP,
        ) * 1e3
        delta = dt - prev
        rows[name] = {"cum_ms": round(dt, 3), "delta_ms": round(delta, 3)}
        print(f"+{name:<14s} cum {dt:8.3f} ms   delta {delta:8.3f} ms",
              flush=True)
        prev = dt
    dt = time_fn(
        jax.jit(infer), variables, xyz, None, valid, key,
        iters=args.iters, warmup=WARMUP,
    ) * 1e3
    rows["make_inference_fn"] = {"cum_ms": round(dt, 3), "delta_ms": 0.0}
    print(f"{'make_inference_fn':<15s} cum {dt:8.3f} ms  (cross-check)")
    print(json.dumps({"b": b, "n": n, "rows": rows}))


if __name__ == "__main__":
    main()
