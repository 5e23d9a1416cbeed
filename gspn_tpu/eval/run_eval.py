"""Inference + evaluation driver — the reference's test/eval scripts
(SURVEY.md §3.3) as one CLI:

    python -m gspn_tpu.eval.run_eval --gspn-ckpt runs/gspn/ckpt \
        --rpointnet-ckpt runs/rpointnet/ckpt [--scannet-dir DIR] \
        [--dump-dir preds/] [--num-scenes 20]

Per scene batch: seeds -> GSPN decode (z ~ prior) -> on-device NMS ->
Point RoIAlign -> heads -> masks, all in one XLA program; then host-side
ScanNet-protocol AP against GT labels. With --dump-dir, per-scene
predictions are saved as .npz for offline/official evaluation.
"""

from __future__ import annotations

import argparse
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from gspn_tpu.data import native, synthetic
from gspn_tpu.eval import instance_eval as ie
from gspn_tpu.models.gspn import GSPNConfig
from gspn_tpu.models.pipeline import (
    PipelineConfig,
    init_pipeline_variables,
    make_inference_fn,
)
from gspn_tpu.models.rpointnet import RPointNetConfig
from gspn_tpu.train.checkpoint import restore_variable_collections


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="GSPN instance-seg evaluation")
    p.add_argument("--gspn-ckpt", type=str, default=None)
    p.add_argument("--rpointnet-ckpt", type=str, default=None)
    p.add_argument("--scannet-dir", type=str, default=None)
    p.add_argument("--partnet-dir", type=str, default=None,
                   help="PartNet h5 dir: part-instance segmentation eval "
                        "(BASELINE config 5 workload)")
    p.add_argument("--num-scenes", type=int, default=16)
    p.add_argument("--family", choices=sorted(synthetic.FAMILIES),
                   default="default",
                   help="synthetic generator family (data/synthetic.py "
                        "FAMILIES) — the spatial-segfps stress-matrix "
                        "axis; only used with the synthetic source")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--num-points", type=int, default=4096)
    p.add_argument("--morton", action="store_true",
                   help="Morton-sort each scene's points (any source; must match training if the model was trained on sorted data)")
    p.add_argument("--num-seeds", type=int, default=64)
    p.add_argument("--num-classes", type=int, default=18)
    p.add_argument("--dump-dir", type=str, default=None)
    p.add_argument("--dump-format", choices=["npz", "scannet"], default="npz",
                   help="dump layout: compact .npz per scene, or the "
                        "official ScanNet submission format (per-scene "
                        ".txt + predicted_masks/, directly consumable by "
                        "the official evaluate_semantic_instance.py)")
    p.add_argument("--point-sharded", action="store_true",
                   help="run inference fully sharded over every local "
                        "device (points+seeds+RoIs; parallel/scene.py). "
                        "num_seeds, sa1 npoint and num_points must be "
                        "divisible by the device count")
    p.add_argument("--data-rows", type=int, default=0,
                   help="with --point-sharded: hybrid 2-D mesh — scenes "
                        "shard over this many data rows (must divide "
                        "the batch size), each scene's work over the "
                        "remaining devices per row")
    p.add_argument("--artifact", type=str, default=None,
                   help="serve from an AOT-exported .gspnx artifact "
                        "(scripts/export_serving.py) instead of tracing "
                        "the live pipeline; its serving shape must match "
                        "--batch/--num-points and the restored variables")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--preset", choices=["default", "tiny"], default="default")
    p.add_argument("--width-mult", type=int, default=1,
                   help="MLP width multiplier — must match the value the "
                        "checkpoints were trained with")
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                   help="MLP/head compute dtype for inference")
    p.add_argument("--fps-segments", type=int, default=None,
                   help="segmented parallel-chain FPS (seed-level parity "
                        "delta, ops/fps.py) — only proposal/centroid "
                        "placement changes; checkpoints restore "
                        "unchanged. Default: the preset's choice "
                        "(flagship: 8 spatial — measured AP-better than "
                        "exact); pass 1 to force the reference's exact "
                        "greedy FPS")
    p.add_argument("--fps-segment-mode",
                   choices=["contiguous", "strided", "spatial"],
                   default="spatial",
                   help="segment partition when --fps-segments > 1: "
                        "'spatial' Morton-sorts inside the FPS op "
                        "(spatially tiled segments on any layout; the "
                        "measured round-4 recommendation and default)")
    p.add_argument("--sa1-fps-segments", type=int, default=None,
                   help="decoupled backbone-sa1 FPS pass at this segment "
                        "count (>0; the shared seeds+sa1 pass is capped "
                        "at S=8 by the 64-seed eligibility floor, while "
                        "sa1's 1024-pick chain is eligible up to S=128 — "
                        "models/pipeline.py). Default: the preset's "
                        "choice (0 = shared pass)")
    p.add_argument("--group-select", choices=["first", "strided"],
                   default=None,
                   help="neighborhood/RoI K-selection: 'first' (reference "
                        "first-K-in-input-order) or 'strided' "
                        "(subsample-robust systematic sample — use when "
                        "the raw point layout is spatially coherent, "
                        "e.g. Morton-sorted or scan-ordered; the eval "
                        "warns when its layout probe detects this). "
                        "Default: the preset's choice ('first')")
    p.add_argument("--mask-project-prune", choices=["auto", "off"],
                   default=None,
                   help="box-pruned mask projection over the spatial-FPS "
                        "Morton view (mask-exact; models/pipeline.py). "
                        "Default: the preset's choice ('off' — measured "
                        "a 4-6%% in-program loser, STATUS round-5)")
    p.add_argument("--ab-fps-segments", type=int, default=None,
                   help="paired A/B: ALSO run a second arm with this "
                        "fps_segments on the SAME scenes and report the "
                        "scene-paired bootstrap CI of the AP difference "
                        "(main - arm B). Far more powerful than two "
                        "independent --bootstrap runs: the shared scene "
                        "draw cancels in the difference. Needs "
                        "--bootstrap > 0; incompatible with "
                        "--point-sharded / --artifact")
    p.add_argument("--ab-fps-segment-mode",
                   choices=["contiguous", "strided", "spatial"],
                   default="spatial",
                   help="segment partition for the --ab-fps-segments arm")
    p.add_argument("--ab-sa1-fps-segments", type=int, default=None,
                   help="paired A/B on the decoupled-sa1 knob: the B arm "
                        "additionally sets sa1_fps_segments to this value "
                        "(combinable with --ab-fps-segments; same "
                        "bootstrap requirements)")
    p.add_argument("--ab-group-select", choices=["first", "strided"],
                   default=None,
                   help="paired A/B on the K-selection knob: the B arm "
                        "additionally sets group_select to this value "
                        "(combinable with the other --ab-* knobs; same "
                        "bootstrap requirements)")
    p.add_argument("--box-percentile", type=float, default=0.0,
                   help=">0: outlier-trimmed proposal box extents")
    p.add_argument("--score-thresh", type=float, default=0.05)
    p.add_argument("--min-region-size", type=int, default=0,
                   help="exclude GT instances below this size (official "
                        "ScanNet protocol uses 100)")
    p.add_argument("--void-forgive", action="store_true",
                   help="official void-overlap exclusion: unmatched "
                        "predictions mostly on unannotated points are "
                        "ignored rather than counted as FP")
    p.add_argument("--bootstrap", type=int, default=0,
                   help=">0: scene-level bootstrap with this many "
                        "replicates; adds ap*_ci95 [lo, hi] fields to the "
                        "summary (use when comparing configs — synthetic "
                        "16-scene APs move +-0.05 between draws)")
    p.add_argument("--match", choices=["greedy", "per_gt"], default="greedy",
                   help="duplicate-prediction resolution: greedy "
                        "(score-descending, round-1 behavior) or per_gt "
                        "(official ScanNet rule: each GT consumes every "
                        "above-threshold prediction, max-confidence one "
                        "is the TP)")
    args = p.parse_args(argv)
    if args.scannet_dir and args.partnet_dir:
        p.error("--scannet-dir and --partnet-dir are mutually exclusive")
    if args.artifact and args.point_sharded:
        p.error("--artifact and --point-sharded are mutually exclusive "
                "(the artifact is a fixed single-program export)")
    if args.data_rows and not args.point_sharded:
        p.error("--data-rows requires --point-sharded")
    if args.data_rows and args.batch % args.data_rows:
        p.error(f"--batch {args.batch} must be divisible by "
                f"--data-rows {args.data_rows}")
    if (args.artifact or args.data_rows) and args.num_scenes % args.batch:
        # these paths run fixed-shape programs; a ragged final batch
        # (num_scenes % batch scenes) cannot be fed to them
        p.error(f"--num-scenes {args.num_scenes} must be a multiple of "
                f"--batch {args.batch} with --artifact/--data-rows "
                "(fixed-shape serving paths cannot take a ragged final "
                "batch)")
    # A/B flag combinations fail HERE, before checkpoints restore and the
    # main arm compiles — a mis-typed CLI must not cost minutes on real
    # hardware before erroring (ADVICE r4).
    ab_on = (args.ab_fps_segments is not None
             or args.ab_sa1_fps_segments is not None
             or args.ab_group_select is not None)
    if ab_on:
        if args.point_sharded or args.artifact:
            p.error("the --ab-* knobs run a second live-traced arm and "
                    "are incompatible with --point-sharded / --artifact")
        if args.bootstrap <= 0:
            p.error("the --ab-* knobs report a paired bootstrap CI; pass "
                    "--bootstrap N (e.g. 100)")
    return args


def _check_ckpt_feature_dim(ckpt_dir: str, name: str, fdim: int, cfg=None):
    """The trainers save the (post-scaling) model config.json beside the
    ckpt dir; a feature_dim or width mismatch would otherwise surface as
    an opaque Orbax shape error. ``cfg``: the stage config about to be
    restored into — width-signature fields are compared against the
    saved ones (catches a missing/mismatched ``--width-mult``)."""
    cfg_path = pathlib.Path(ckpt_dir).parent / "config.json"
    if not cfg_path.exists():
        return
    try:
        saved = json.loads(cfg_path.read_text()).get("model", {})
    except (json.JSONDecodeError, OSError):
        return
    saved_fdim = saved.get("feature_dim")
    if saved_fdim is not None and int(saved_fdim) != fdim:
        raise ValueError(
            f"{name} checkpoint {ckpt_dir} was trained with feature_dim="
            f"{saved_fdim} but the eval data has feature_dim={fdim}; "
            "point --scannet-dir (or the synthetic source) at data matching "
            "the training features"
        )
    if cfg is None:
        return
    for key in ("encoder_mlp", "cond_dim", "roi_mlp", "fp_mlps"):
        saved_v = saved.get(key)
        cur = getattr(cfg, key, None)
        if saved_v is None or cur is None:
            continue
        norm = json.loads(json.dumps(cur if isinstance(cur, int) else list(
            list(x) if isinstance(x, (list, tuple)) else x for x in cur
        )))
        if norm != saved_v:
            raise ValueError(
                f"{name} checkpoint {ckpt_dir} was trained with {key}="
                f"{saved_v} but the eval config has {norm} — pass the "
                "same --width-mult/--preset the checkpoint was trained "
                "with"
            )


def main(argv=None):
    args = parse_args(argv)
    if args.preset == "tiny":
        from gspn_tpu.train.train_gspn import TINY_GSPN
        from gspn_tpu.train.train_rpointnet import tiny_rpointnet

        cfg = PipelineConfig(
            gspn=TINY_GSPN,
            rpointnet=tiny_rpointnet(args.num_classes),
            num_seeds=args.num_seeds,
            box_percentile=args.box_percentile,
            score_thresh=args.score_thresh,
        )
    else:
        cfg = PipelineConfig(
            gspn=GSPNConfig(),
            rpointnet=RPointNetConfig(num_classes=args.num_classes),
            num_seeds=args.num_seeds,
            box_percentile=args.box_percentile,
            score_thresh=args.score_thresh,
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
    if args.sa1_fps_segments is not None:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, sa1_fps_segments=args.sa1_fps_segments
        )
    if args.group_select is not None:
        from gspn_tpu.models.presets import set_pipeline_group_select

        cfg = set_pipeline_group_select(cfg, args.group_select)
    if args.mask_project_prune is not None:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, mask_project_prune=args.mask_project_prune
        )
    key = jax.random.PRNGKey(args.seed)

    # data source — each batches() call creates its own rng so probing
    # shapes below does not perturb the evaluated scene stream
    if args.scannet_dir or args.partnet_dir:
        if args.scannet_dir:
            from gspn_tpu.data.scannet import ScanNetCrops

            ds = ScanNetCrops(args.scannet_dir, num_points=args.num_points,
                              morton=args.morton)
        else:  # PartNet part-instance workload (BASELINE config 5)
            from gspn_tpu.data.partnet import PartNetParts

            ds = PartNetParts(args.partnet_dir, num_points=args.num_points)

        # ScanNetCrops sorts internally (morton=); PartNet needs the
        # host-side batch sorter. AP is permutation-invariant (masks and
        # GT labels permute together), so --morton only changes layout.
        _sort = args.morton and not args.scannet_dir

        def batches():
            np_rng = np.random.default_rng(args.seed)
            done = 0
            while done < args.num_scenes:
                b = min(args.batch, args.num_scenes - done)
                batch = ds.sample_batch(np_rng, b)
                yield native.morton_sort_batch(batch) if _sort else batch
                done += b
    else:

        fam_kw = dict(synthetic.FAMILIES[args.family])
        fam_kw.setdefault("max_instances", 8)

        def batches():
            np_rng = np.random.default_rng(args.seed)
            done = 0
            while done < args.num_scenes:
                b = min(args.batch, args.num_scenes - done)
                batch = synthetic.scene_batch(
                    np_rng, b, n_points=args.num_points, **fam_kw
                )
                yield (
                    native.morton_sort_batch(batch) if args.morton else batch
                )
                done += b

    # variables: init fresh, then restore each stage with a checkpoint
    first = next(iter(batches()))
    # layout-bias probe (round-4 mechanism study): warn when the raw
    # point layout is spatially coherent and first-K grouping is in its
    # measured pathology regime — unless strided selection is already on
    if cfg.gspn.group_select == "first":
        from gspn_tpu.data.layout_probe import warn_if_layout_biased

        mid = min(1, len(cfg.gspn.context_radii) - 1)
        warn_if_layout_biased(
            first,
            radius=float(cfg.gspn.context_radii[mid]),
            k=int(cfg.gspn.context_nsample[mid]),
            where="eval data",
        )
    n = first["xyz"].shape[1]
    f = first.get("features")
    fdim = 0 if f is None else int(f.shape[-1])
    if fdim != cfg.gspn.feature_dim or fdim != cfg.rpointnet.feature_dim:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            gspn=dataclasses.replace(cfg.gspn, feature_dim=fdim),
            rpointnet=dataclasses.replace(cfg.rpointnet, feature_dim=fdim),
        )
    variables = init_pipeline_variables(cfg, key, n, feature_dim=fdim)
    for name, ckpt in (("gspn", args.gspn_ckpt), ("rpointnet", args.rpointnet_ckpt)):
        if ckpt:
            _check_ckpt_feature_dim(
                ckpt, name, fdim,
                cfg=cfg.gspn if name == "gspn" else cfg.rpointnet,
            )
            variables[name] = restore_variable_collections(
                ckpt, variables[name]
            )
            print(f"restored {name} from {ckpt}")

    import time as _time

    if args.point_sharded:
        # fully point/seed/RoI-sharded inference over every local device;
        # same latents as the single-device path (gspn draws eps with the
        # same key and shape), so results match it to the documented
        # float tolerance of the sharded feature map.
        from gspn_tpu.parallel.mesh import make_mesh, make_mesh_2d
        from gspn_tpu.parallel.scene import make_point_sharded_inference

        rows = args.data_rows
        sharded = make_point_sharded_inference(
            cfg,
            make_mesh_2d(rows) if rows else make_mesh(axis="space"),
            data_axis="data" if rows else None,
        )
        latent = cfg.gspn.latent_dim

        def infer(variables, xyz, feats, valid, key):
            eps = jax.random.normal(
                key, (xyz.shape[0], cfg.num_seeds, latent), jnp.float32
            )
            if fdim:
                return sharded(variables, xyz, feats, valid, eps)
            return sharded(variables, xyz, valid, eps)
    elif args.artifact:
        # serve the eval from the AOT artifact — the whole pipeline is the
        # deserialized StableHLO, no model retrace (gspn_tpu/serve).
        from gspn_tpu.serve import load_artifact

        exported, manifest = load_artifact(args.artifact)
        saved_seeds = manifest.get("pipeline_config", {}).get("num_seeds")
        if saved_seeds is not None and int(saved_seeds) != cfg.num_seeds:
            raise ValueError(
                f"artifact was exported with num_seeds={saved_seeds}, "
                f"eval is configured with {cfg.num_seeds}"
            )
        print(f"serving from {args.artifact} "
              f"(platforms={manifest.get('platforms')})")

        def infer(variables, xyz, feats, valid, key):
            if feats is not None:
                return exported.call(variables, xyz, feats, valid, key)
            return exported.call(variables, xyz, valid, key)
    else:
        infer = jax.jit(make_inference_fn(cfg))
    infer_b = None
    if (args.ab_fps_segments is not None
            or args.ab_sa1_fps_segments is not None
            or args.ab_group_select is not None):
        # flag-combination validation already ran in parse_args
        import dataclasses

        from gspn_tpu.models.presets import (
            set_pipeline_fps_segments,
            set_pipeline_group_select,
        )

        cfg_b = cfg
        if args.ab_fps_segments is not None:
            cfg_b = set_pipeline_fps_segments(
                cfg_b, args.ab_fps_segments, args.ab_fps_segment_mode
            )
        if args.ab_sa1_fps_segments is not None:
            cfg_b = dataclasses.replace(
                cfg_b, sa1_fps_segments=args.ab_sa1_fps_segments
            )
        if args.ab_group_select is not None:
            cfg_b = set_pipeline_group_select(cfg_b, args.ab_group_select)
        infer_b = jax.jit(make_inference_fn(cfg_b))
    all_preds_b = []
    all_preds, all_gts = [], []
    infer_s = 0.0
    infer_pts = 0
    dump_dir = pathlib.Path(args.dump_dir) if args.dump_dir else None
    if dump_dir:
        dump_dir.mkdir(parents=True, exist_ok=True)

    scene_i = 0
    dumped: dict[str, int] = {}
    for batch in batches():
        jb = {
            k: jnp.asarray(v) for k, v in batch.items() if k != "scene_ids"
        }
        feats = jb["features"] if jb["features"].shape[-1] else None
        t0 = _time.perf_counter()
        preds = infer(variables, jb["xyz"], feats, jb["valid"], key)
        scenes = ie.predictions_from_device(preds, jb["valid"])  # syncs
        if scene_i > 0:  # first batch pays compile; keep it out of the rate
            infer_s += _time.perf_counter() - t0
            infer_pts += int(jb["valid"].size)
        if infer_b is not None:  # paired arm: same batch, same rng key
            preds_b = infer_b(variables, jb["xyz"], feats, jb["valid"], key)
            all_preds_b.extend(
                ie.predictions_from_device(preds_b, jb["valid"])
            )
        for bi, sp in enumerate(scenes):
            v = batch["valid"][bi]
            gt = ie.gt_from_labels(
                batch["inst_label"][bi][v], batch["sem_label"][bi][v]
            )
            all_preds.append(sp)
            all_gts.append(gt)
            if dump_dir:
                scene_id = batch.get("scene_ids", [None] * (bi + 1))[bi] or (
                    f"scene_{scene_i:05d}"
                )
                # scenes are sampled WITH replacement: suffix repeat
                # draws so later crops of the same scene don't silently
                # overwrite earlier dumps
                seen = dumped.get(scene_id, 0)
                dumped[scene_id] = seen + 1
                if seen:
                    scene_id = f"{scene_id}__crop{seen}"
                if args.dump_format == "scannet":
                    from gspn_tpu.eval.scannet_export import (
                        write_scannet_submission,
                    )

                    write_scannet_submission(dump_dir, scene_id, sp)
                else:
                    np.savez_compressed(
                        dump_dir / f"{scene_id}.npz",
                        masks=sp.masks,
                        scores=sp.scores,
                        classes=sp.classes,
                    )
            scene_i += 1

    class_ids = sorted({c for gt in all_gts for c in gt.inst_class.values()})
    if not class_ids:
        class_ids = list(range(1, args.num_classes + 1))
    res = ie.evaluate_instances(
        all_preds, all_gts, class_ids,
        min_region_size=args.min_region_size,
        void_forgive=args.void_forgive,
        match=args.match,
    )
    summary = {
        "scenes": scene_i,
        "ap": res["ap"],
        "ap_50": res["ap_50"],
        "ap_25": res["ap_25"],
        "points_per_sec": round(infer_pts / max(infer_s, 1e-9), 1),
    }
    if args.bootstrap > 0:
        cis = ie.bootstrap_ci(
            all_preds, all_gts, class_ids,
            n_boot=args.bootstrap, seed=args.seed,
            min_region_size=args.min_region_size,
            void_forgive=args.void_forgive,
            match=args.match,
        )
        for k, (lo, hi) in cis.items():
            summary[f"{k}_ci95"] = [round(lo, 4), round(hi, 4)]
    if infer_b is not None:
        res_b = ie.evaluate_instances(
            all_preds_b, all_gts, class_ids,
            min_region_size=args.min_region_size,
            void_forgive=args.void_forgive,
            match=args.match,
        )
        for k in ("ap", "ap_50", "ap_25"):
            summary[f"{k}_armB"] = res_b[k]
        diff = ie.bootstrap_diff(
            all_preds, all_preds_b, all_gts, class_ids,
            n_boot=args.bootstrap, seed=args.seed,
            min_region_size=args.min_region_size,
            void_forgive=args.void_forgive,
            match=args.match,
        )
        for k, v in diff.items():
            summary[k] = (
                [round(v[0], 4), round(v[1], 4)]
                if isinstance(v, tuple)
                else round(v, 4)
            )
    print(json.dumps(summary))
    return res


if __name__ == "__main__":
    main()
