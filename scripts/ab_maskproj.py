"""Interleaved perf A/B: box-pruned mask projection (VERDICT r4 #5).

mask_project is the #2 non-backbone in-program delta (1.70 ms flagship /
1.49 ms whole-scene, profile_fused r4). The pruned path projects RoI mask
logits over the Morton-sorted scene view the spatial-FPS pass already
pays for, and skips (RoI-block, scene-tile) kernel programs whose tile
AABB misses every box in the block (ops.nearest_sample_logit_boxed) —
mask-exact, because project_roi_masks ANDs logits with box membership.

Arms (all spatial-seg8 FPS, r4 checkpoints so the box distribution is
real): prune=off (the r4 dense kernel), prune=auto at several
(roi_block, tile_n) knob points. Whole-pipeline fused timing, arms
interleaved batch-by-batch (STATUS "Measurement hygiene").

    python scripts/ab_maskproj.py [--gspn-ckpt ...] [--rpointnet-ckpt ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

ROUNDS, ITERS = 6, 8
KNOBS = ((8, 2048), (8, 1024), (16, 2048), (32, 2048))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gspn-ckpt", default="runs/r4_gspn/ckpt")
    ap.add_argument("--rpointnet-ckpt", default="runs/r4_rpn/ckpt")
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--shapes", choices=["full", "tiny"], default="full",
                    help="tiny = CPU-interpret end-to-end script check "
                         "(TINY preset, 256-point scenes, random init); "
                         "timings are meaningless off-chip")
    args = ap.parse_args()

    from gspn_tpu import ops
    from gspn_tpu.data import synthetic
    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
    )
    from gspn_tpu.ops import mask_project as mp
    from gspn_tpu.train.checkpoint import restore_variable_collections
    from gspn_tpu.utils.timing import time_fn
    from __graft_entry__ import _flagship_pipeline_config

    global ROUNDS, ITERS, KNOBS
    if args.shapes == "tiny":
        from tests.test_pipeline_eval import TINY

        # mirror tests/_spatial_tiny: num_seeds=16 and BOTH stages on a
        # matched spatial segmented pass — otherwise shared_fps_indices
        # yields no sorted view and every "pruned" arm silently traces
        # the DENSE path, self-checking nothing
        base = dataclasses.replace(
            TINY,
            num_seeds=16,
            gspn=dataclasses.replace(
                TINY.gspn, fps_segments=2, fps_segment_mode="spatial"
            ),
            rpointnet=dataclasses.replace(
                TINY.rpointnet, fps_segments=2, fps_segment_mode="spatial"
            ),
        )
        args.random_init = True
        ROUNDS, ITERS = 1, 1
        KNOBS = ((8, 128),)
        shapes = (("tiny B=2 N=256", 2, 256, True),)
    else:
        base = _flagship_pipeline_config()  # spatial-seg8
        shapes = (
            ("flagship B=8 N=8192", 8, 8192, False),
            ("whole-scene B=1 N=65536 (10% masked)", 1, 65536, True),
        )
    # pin both arms: the preset default is "off" (the measured winner),
    # so the pruned arms must opt in explicitly
    base = dataclasses.replace(base, mask_project_prune="auto")
    off = dataclasses.replace(base, mask_project_prune="off")

    key = jax.random.PRNGKey(1)
    for name, b, n, masked in shapes:
        rng = np.random.default_rng(0)
        batch = synthetic.scene_batch(
            rng, b, n_points=n, max_instances=8 if n <= 8192 else 24,
            extent=2.0 if n <= 8192 else 8.0,
        )
        valid = np.asarray(batch["valid"]).copy()
        if masked:
            valid[:, -n // 10:] = False
        xyz = jnp.asarray(batch["xyz"])
        validj = jnp.asarray(valid)
        variables = init_pipeline_variables(base, jax.random.PRNGKey(0), n)
        if not args.random_init:
            variables["gspn"] = restore_variable_collections(
                args.gspn_ckpt, variables["gspn"]
            )
            variables["rpointnet"] = restore_variable_collections(
                args.rpointnet_ckpt, variables["rpointnet"]
            )

        # diagnostic: program-relevance fraction at the default knobs,
        # computed from the arm's REAL refined boxes
        preds = jax.jit(make_inference_fn(off))(
            variables, xyz, None, validj, key
        )
        boxes = jax.device_get(preds.boxes)
        sxyz, svalid, _ = ops.spatial_sorted_view(xyz, validj)
        for rb, tn in KNOBS:
            npad = -(-n // tn) * tn
            rel = jax.device_get(
                mp._tile_relevance(
                    sxyz,
                    svalid if svalid is not None else jnp.ones((b, n), bool),
                    jnp.asarray(boxes),
                    tn, npad, rb, -(-boxes.shape[1] // rb) * rb,
                )
            )
            print(json.dumps({
                "table": "relevance", "config": name, "roi_block": rb,
                "tile_n": tn, "rel_frac": round(float(rel.mean()), 4),
            }), flush=True)

        # arms: trace each under its knob setting (constants bake in at
        # trace time), then interleave timed rounds
        arms = {}
        arms["off"] = jax.jit(make_inference_fn(off))
        time_fn(arms["off"], variables, xyz, None, validj, key,
                iters=1, warmup=1)
        rb0, tn0 = mp._ROI_BLOCK_BOXED, mp._TN_BOXED
        for rb, tn in KNOBS:
            mp._ROI_BLOCK_BOXED, mp._TN_BOXED = rb, tn
            f = jax.jit(make_inference_fn(base))
            time_fn(f, variables, xyz, None, validj, key, iters=1, warmup=1)
            arms[f"rb{rb}_tn{tn}"] = f
        mp._ROI_BLOCK_BOXED, mp._TN_BOXED = rb0, tn0

        ts = {tag: [] for tag in arms}
        for _ in range(ROUNDS):
            for tag, f in arms.items():
                ts[tag].append(
                    time_fn(f, variables, xyz, None, validj, key,
                            iters=ITERS, warmup=0))
        med = {tag: float(np.median(v)) for tag, v in ts.items()}
        print(json.dumps({
            "table": "whole-pipeline", "config": name,
            **{f"{tag}_ms": round(t * 1e3, 3) for tag, t in med.items()},
            **{f"{tag}_vs_off": round(med["off"] / t, 4)
               for tag, t in med.items() if tag != "off"},
        }), flush=True)


if __name__ == "__main__":
    main()
