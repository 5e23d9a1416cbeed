"""Export a trained two-stage pipeline to a serving artifact (.gspnx).

Builds the fused inference program (models/pipeline.py), restores stage
checkpoints the same way run_eval does, AOT-exports it for an explicit
serving shape via jax.export, and writes the single-file artifact
(gspn_tpu/serve/export.py). A serving host then needs only the artifact
+ the variables checkpoint — no model code:

    python scripts/export_serving.py --out model.gspnx \
        --gspn-ckpt runs/s1/ckpt --rpointnet-ckpt runs/s2/ckpt \
        --batch 8 --num-points 8192

    # later / elsewhere
    from gspn_tpu.serve import load_artifact
    exported, meta = load_artifact("model.gspnx")
    preds = exported.call(variables, xyz, valid, rng_key)

By default exports for the platform the script runs on (the chip when
run there); ``--platform`` allows cross-exporting (e.g. a tpu artifact
from a CPU box). ``--verify`` runs the artifact against the live
pipeline on random data and checks bit-identity before writing.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="export serving artifact")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--gspn-ckpt", type=str, default=None)
    p.add_argument("--rpointnet-ckpt", type=str, default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--num-points", type=int, default=8192)
    p.add_argument("--num-seeds", type=int, default=64)
    p.add_argument("--num-classes", type=int, default=18)
    p.add_argument("--feature-dim", type=int, default=0)
    p.add_argument("--preset", choices=["default", "tiny"], default="default")
    p.add_argument("--width-mult", type=int, default=1,
                   help="MLP width multiplier — must match the "
                        "checkpoints' training value")
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    p.add_argument("--fps-segments", type=int, default=None,
                   help="segmented parallel-chain FPS baked into the "
                        "artifact (ops/fps.py). Default: the preset's "
                        "choice (flagship: 8 spatial); pass 1 to bake "
                        "exact greedy FPS")
    p.add_argument("--fps-segment-mode",
                   choices=["contiguous", "strided", "spatial"],
                   default="spatial",
                   help="segment partition when --fps-segments > 1 "
                        "('spatial' = Morton-sort inside the FPS op)")
    p.add_argument("--score-thresh", type=float, default=0.05)
    p.add_argument("--platform", type=str, default=None,
                   help="export platform(s), comma-separated (e.g. tpu "
                        "or cpu,tpu for a dual-platform artifact; "
                        "default: current). Dual-platform exports need "
                        "op impls that legalize on BOTH (ops_impl=xla)")
    p.add_argument("--verify", action="store_true",
                   help="check artifact == live pipeline on random data")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import dataclasses

    from gspn_tpu.models.gspn import GSPNConfig
    from gspn_tpu.models.pipeline import (
        PipelineConfig,
        init_pipeline_variables,
        make_inference_fn,
    )
    from gspn_tpu.models.rpointnet import RPointNetConfig
    from gspn_tpu.serve import export_inference, load_artifact, save_artifact
    from gspn_tpu.train.checkpoint import restore_variable_collections

    if args.preset == "tiny":
        from gspn_tpu.train.train_gspn import TINY_GSPN
        from gspn_tpu.train.train_rpointnet import tiny_rpointnet

        cfg = PipelineConfig(
            gspn=TINY_GSPN, rpointnet=tiny_rpointnet(args.num_classes),
            num_seeds=args.num_seeds, score_thresh=args.score_thresh,
        )
    else:
        cfg = PipelineConfig(
            gspn=GSPNConfig(),
            rpointnet=RPointNetConfig(num_classes=args.num_classes),
            num_seeds=args.num_seeds, score_thresh=args.score_thresh,
        )
    if args.feature_dim:
        cfg = dataclasses.replace(
            cfg,
            gspn=dataclasses.replace(cfg.gspn, feature_dim=args.feature_dim),
            rpointnet=dataclasses.replace(
                cfg.rpointnet, feature_dim=args.feature_dim
            ),
        )
    if args.width_mult != 1:
        from gspn_tpu.models.presets import scale_pipeline_widths

        cfg = scale_pipeline_widths(cfg, args.width_mult)
    if args.dtype == "bf16":
        from gspn_tpu.models.presets import set_pipeline_dtype

        cfg = set_pipeline_dtype(cfg, jnp.bfloat16)
    if args.fps_segments is not None:
        from gspn_tpu.models.presets import set_pipeline_fps_segments

        cfg = set_pipeline_fps_segments(
            cfg, args.fps_segments, args.fps_segment_mode
        )

    variables = init_pipeline_variables(
        cfg, jax.random.PRNGKey(0), args.num_points,
        feature_dim=args.feature_dim,
    )
    from gspn_tpu.eval.run_eval import _check_ckpt_feature_dim

    for name, ckpt in (("gspn", args.gspn_ckpt),
                       ("rpointnet", args.rpointnet_ckpt)):
        if ckpt:
            _check_ckpt_feature_dim(
                ckpt, name, args.feature_dim,
                cfg=cfg.gspn if name == "gspn" else cfg.rpointnet,
            )
            variables[name] = restore_variable_collections(
                ckpt, variables[name]
            )
            print(f"restored {name} from {ckpt}")

    platforms = (
        tuple(p.strip() for p in args.platform.split(",") if p.strip())
        if args.platform else None
    )
    exported = export_inference(
        cfg, variables, args.num_points, batch_size=args.batch,
        feature_dim=args.feature_dim, platforms=platforms,
    )
    path = save_artifact(
        args.out, exported, cfg,
        extra_meta={
            "gspn_ckpt": args.gspn_ckpt,
            "rpointnet_ckpt": args.rpointnet_ckpt,
        },
    )
    print(f"wrote {path} ({path.stat().st_size/1e6:.2f} MB) "
          f"platforms={list(exported.platforms)}")

    if args.verify:
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(
            rng.standard_normal((args.batch, args.num_points, 3))
            .astype(np.float32)
        )
        valid = jnp.ones((args.batch, args.num_points), bool)
        key = jax.random.PRNGKey(1)
        feats = (
            jnp.asarray(rng.standard_normal(
                (args.batch, args.num_points, args.feature_dim)
            ).astype(np.float32))
            if args.feature_dim else None
        )
        live = jax.jit(make_inference_fn(cfg))(
            variables, xyz, feats, valid, key
        )
        loaded, _ = load_artifact(path)
        got = (
            loaded.call(variables, xyz, feats, valid, key)
            if args.feature_dim else loaded.call(variables, xyz, valid, key)
        )
        for f in ("masks", "scores", "classes", "boxes", "valid"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(live, f)),
                err_msg=f,
            )
        print("verify: artifact == live pipeline (bit-identical)")


if __name__ == "__main__":
    main()
