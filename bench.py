"""Benchmark: end-to-end instance-segmentation inference points/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput (BASELINE.md), so the baseline here
is a faithful *reference-style* execution of the same trained math on the
same chip: the pipeline split at the reference's three host boundaries
(SURVEY.md §3.3 — separate feed of each stage with device->host->device
transfers and host NumPy NMS between them). ``vs_baseline`` is
fused-points-per-sec / reference-style-points-per-sec.

Flags: ``--dtype bf16`` benches the bf16 (MXU-native) flagship instead of
f32; point-op kernels stay f32 (index outputs, exact comparisons).

Drift calibration (VERDICT r3 #3): the tunneled chip's absolute
throughput drifts up to ~40% between sessions, so raw round-over-round
values are not comparable. Every bench line therefore also carries a
FROZEN probe program's time (``probe_ms`` — fixed shapes/weights/seed,
never to be edited) and ``value_per_probe`` = value × probe_seconds:
points per probe-interval. Both the pipeline and the probe slow down
together with the tunnel, so ``value_per_probe`` is the cross-session
comparable number; a drop in ``value_per_probe`` is a real regression,
a drop in ``value`` alone at elevated ``probe_ms`` is tunnel weather.

Whole-scene regime (VERDICT r3 #5): the same line carries
``value_wholescene`` (+ its roofline fraction) — fused inference on one
masked 65,536-point scene, the survey's long-context axis, where the
box_group and segmented-FPS wins actually live.

Training regime (VERDICT r4 #7): ``value_train`` /
``value_train_per_probe`` — the stage-2 (R-PointNet) jitted train step at
the BASELINE config-5 shape (B=4 × N=4096), trainer defaults (exact FPS),
so training perf is driver-visible round-over-round like inference.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B, N = 8, 8192
WARMUP, ITERS = 3, 30


def _install_tpu_watchdog(init_timeout_s=300.0, total_timeout_s=3000.0):
    """Fail fast when the tunneled chip is unreachable.

    The axon backend init polls its local relay with NO timeout — when
    the tunnel is down the process hangs forever in a nanosleep loop
    (observed in-session; CLAUDE.md "Platform gotchas"). A hung bench
    records nothing; instead emit one diagnostic JSON line (same schema,
    value 0, explicit "error") and exit nonzero so the driver's record
    shows *why* there is no number."""
    import os as _os
    import threading

    ready, done = threading.Event(), threading.Event()

    def _die(msg):
        print(
            json.dumps(
                {
                    "metric": "instance_seg_inference_points_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "points/sec",
                    "vs_baseline": 0.0,
                    "error": msg,
                }
            ),
            flush=True,
        )
        _os._exit(3)

    def _watch():
        if not ready.wait(init_timeout_s):
            _die(
                f"TPU backend not ready within {init_timeout_s:.0f}s "
                "(axon tunnel down?)"
            )
        if not done.wait(total_timeout_s):
            _die(
                f"bench did not finish within {total_timeout_s:.0f}s "
                "(tunnel dropped mid-run?)"
            )

    threading.Thread(target=_watch, daemon=True).start()
    jax.devices()  # blocks here if the tunnel is down
    ready.set()
    return done


# ---------------------------------------------------------------------------
# FROZEN drift-calibration probe — r4; DO NOT EDIT (shapes, seeds, ops and
# timing parameters are the calibration unit itself; any change breaks
# cross-round comparability of value_per_probe).
# Composite chosen to mirror the pipeline's two cost structures: the
# sequential Pallas FPS chain (dispatch + latency-bound loop control) and
# one MXU matmul (arithmetic throughput).
# ---------------------------------------------------------------------------

_PROBE_B, _PROBE_N, _PROBE_S, _PROBE_D = 8, 8192, 64, 1024


def measure_probe() -> float:
    """Median seconds per probe call (6 batches × 10 iters)."""
    from gspn_tpu import ops
    from gspn_tpu.utils.timing import time_fn

    kx, ka, kb = jax.random.split(jax.random.PRNGKey(42), 3)
    xyz = jax.random.uniform(kx, (_PROBE_B, _PROBE_N, 3), jnp.float32)
    a = jax.random.normal(ka, (_PROBE_D, _PROBE_D), jnp.float32)
    b = jax.random.normal(kb, (_PROBE_D, _PROBE_D), jnp.float32)

    @jax.jit
    def probe(xyz, a, b):
        idx = ops.farthest_point_sample(_PROBE_S, xyz)
        return jnp.sum(idx.astype(jnp.float32)) + jnp.sum(a @ b)

    return time_fn(probe, xyz, a, b, iters=10, warmup=3,
                   batches=6, stat="median")


def _host_nms(boxes: np.ndarray, scores: np.ndarray, iou: float) -> np.ndarray:
    """Greedy score-descending NMS on the host — the reference runs NMS in
    NumPy between proposal generation and RoIAlign (SURVEY.md §3.3 boundary
    #3); this is that stage of the baseline, not a test oracle."""
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(scores), bool)
    alive = np.ones(len(scores), bool)
    ext = np.maximum(boxes[:, 3:6] - boxes[:, 0:3], 0.0)
    vol = ext[:, 0] * ext[:, 1] * ext[:, 2]
    for oi, i in enumerate(order):
        if not alive[i]:
            continue
        keep[i] = True
        rest = order[oi + 1:]
        lo = np.maximum(boxes[i, 0:3], boxes[rest, 0:3])
        hi = np.minimum(boxes[i, 3:6], boxes[rest, 3:6])
        e = np.maximum(hi - lo, 0.0)
        inter = e[:, 0] * e[:, 1] * e[:, 2]
        union = np.maximum(vol[i] + vol[rest] - inter, 1e-12)
        alive[rest[inter / union > iou]] = False
    return keep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    ap.add_argument("--fps-segments", type=int, default=None,
                    help="segmented parallel-chain FPS (documented "
                         "seed-level parity delta, ops/fps.py). Default: "
                         "the flagship preset's choice (8 spatial — "
                         "measured AP-better than exact); pass 1 to "
                         "bench the reference's exact greedy FPS. Both "
                         "sides of vs_baseline use the same setting, so "
                         "the ratio stays like-for-like.")
    ap.add_argument("--fps-segment-mode",
                    choices=["contiguous", "strided", "spatial"],
                    default="spatial",
                    help="segment partition when --fps-segments > 1 "
                         "('spatial' = Morton-sort inside the FPS op)")
    ap.add_argument("--sa1-fps-segments", type=int, default=None,
                    help="decoupled backbone-sa1 FPS pass at this segment "
                         "count (models/pipeline.py::_split_fps_indices). "
                         "Default: the preset's choice (0 = shared pass)")
    ap.add_argument("--group-select", choices=["first", "strided"],
                    default=None,
                    help="neighborhood/RoI K-selection (ops/ball_query.py;"
                         " 'strided' = the subsample-robust mode for "
                         "spatially-coherent layouts). Default: preset "
                         "('first')")
    args = ap.parse_args()

    done = _install_tpu_watchdog()

    from gspn_tpu import ops
    from gspn_tpu.data import synthetic
    from gspn_tpu.models.gspn import proposal_boxes
    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
        project_roi_masks,
    )
    from gspn_tpu.models.rpointnet import apply_box_deltas
    from __graft_entry__ import _flagship_pipeline_config

    cfg = _flagship_pipeline_config()
    if args.dtype == "bf16":
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            gspn=dataclasses.replace(cfg.gspn, dtype=jnp.bfloat16),
            rpointnet=dataclasses.replace(cfg.rpointnet, dtype=jnp.bfloat16),
        )
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
    rng = np.random.default_rng(0)
    batch = synthetic.scene_batch(rng, B, n_points=N, max_instances=8)
    xyz = jnp.asarray(batch["xyz"])
    valid = jnp.asarray(batch["valid"])
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), N)
    key = jax.random.PRNGKey(1)

    # ---- ours: one fused XLA program. (A lax.scan "streamed" variant was
    # measured and does NOT help: per-call dispatch already pipelines
    # under async execution, so the scan only adds overhead — the
    # serving API stays available as make_streamed_inference_fn.)
    infer = jax.jit(make_inference_fn(cfg))

    # ---- reference-style: stage-per-sess.run with host boundaries
    gspn_cfg, rpn_cfg = cfg.gspn, cfg.rpointnet
    from gspn_tpu.models.gspn import GSPN
    from gspn_tpu.models.rpointnet import RPointNet

    gspn, rpn = GSPN(gspn_cfg), RPointNet(rpn_cfg)

    @jax.jit
    def stage_seeds(xyz, valid):
        return ops.farthest_point_sample(
            cfg.num_seeds, xyz, valid,
            segments=ops.eligible_fps_segments(
                cfg.gspn.fps_segments, cfg.num_seeds, N
            ),
            segment_mode=cfg.gspn.fps_segment_mode,
        )

    @jax.jit
    def stage_gspn(gvars, xyz, seed_idx, valid, key):
        out = gspn.apply(gvars, xyz, seed_idx, valid=valid, z_rng=key, train=False)
        return proposal_boxes(out.generated, rpn_cfg.box_margin), jax.nn.sigmoid(out.objectness)

    @jax.jit
    def stage_rpn(rvars, xyz, boxes, valid):
        out = rpn.apply(rvars, xyz, boxes, valid=valid, train=False)
        return out.cls_logits, out.box_deltas, out.mask_logits, out.roi_xyz, out.roi_valid

    @jax.jit
    def stage_masks(xyz, refined, roi_xyz, mask_logits, valid):
        return project_roi_masks(xyz, refined, roi_xyz, mask_logits, cfg.mask_thresh, valid)

    def reference_style(xyz_np, valid_np, key):
        # boundary #1: host feed per stage (device_put from host arrays)
        x = jnp.asarray(xyz_np)
        v = jnp.asarray(valid_np)
        seeds = np.asarray(stage_seeds(x, v))  # -> host
        boxes, obj = stage_gspn(variables["gspn"], jnp.asarray(xyz_np), jnp.asarray(seeds), v, key)
        boxes_np, obj_np = np.asarray(boxes), np.asarray(obj)  # -> host
        # boundary #3: host NMS (NumPy, like the reference)
        keeps = np.stack(
            [_host_nms(boxes_np[b], obj_np[b], rpn_cfg.nms_iou) for b in range(B)]
        )
        cls, deltas, mlog, ridx, rvalid = stage_rpn(
            variables["rpointnet"], jnp.asarray(xyz_np), jnp.asarray(boxes_np), v
        )
        refined = apply_box_deltas(jnp.asarray(boxes_np), deltas)
        masks = stage_masks(jnp.asarray(xyz_np), refined, ridx, mlog, v)
        return np.asarray(masks) & keeps[..., None] & np.asarray(rvalid)[..., None]

    # ---- interleaved measurement: the tunnel's throughput drifts between
    # multi-second windows (up to ~40% across sessions, STATUS.md), so
    # fused / reference-style batches alternate and each side takes its
    # median — the vs_baseline RATIO is drift-robust, not just each
    # number separately.
    from gspn_tpu.utils.timing import time_fn

    xyz_np, valid_np = batch["xyz"], batch["valid"]
    reference_style(xyz_np, valid_np, key)  # compile
    time_fn(infer, variables, xyz, None, valid, key, iters=1, warmup=WARMUP)
    fused_ts, ref_ts = [], []
    per = ITERS // 6
    for _ in range(6):
        fused_ts.append(
            time_fn(infer, variables, xyz, None, valid, key,
                    iters=per, warmup=0)
        )
        t0 = time.perf_counter()
        for _ in range(max(per // 2, 1)):
            reference_style(xyz_np, valid_np, key)
        ref_ts.append((time.perf_counter() - t0) / max(per // 2, 1))
    fused_dt = float(np.median(fused_ts))
    ref_dt = float(np.median(ref_ts))
    fused_pps = B * N / fused_dt
    ref_pps = B * N / ref_dt

    # ---- frozen drift-calibration probe (same window as the flagship
    # measurement; see module docstring)
    probe_dt = measure_probe()

    # ---- whole-scene regime: one masked 65,536-point scene (the
    # long-context axis; box_group / segmented-FPS payoff regime)
    WS_B, WS_N = 1, 65536
    ws_batch = synthetic.scene_batch(
        np.random.default_rng(0), WS_B, n_points=WS_N,
        max_instances=24, extent=8.0,
    )
    ws_valid_np = np.asarray(ws_batch["valid"]).copy()
    ws_valid_np[:, -WS_N // 10:] = False  # ~10% padding, as bench_large
    ws_xyz = jnp.asarray(ws_batch["xyz"])
    ws_valid = jnp.asarray(ws_valid_np)
    ws_dt = time_fn(
        infer, variables, ws_xyz, None, ws_valid, key,
        iters=5, warmup=2, batches=4, stat="median",
    )
    ws_pps = WS_B * WS_N / ws_dt

    # ---- training regime (VERDICT r4 #7): stage-2 train-step throughput
    # at the BASELINE config-5 shape (B=4 x N=4096), measured on the
    # TRAINER-default configuration (exact FPS — trainers keep seg1; the
    # --fps-segments flag above only affects the inference arms) so the
    # number tracks what `train_rpointnet` actually runs.
    import dataclasses as _dc

    import optax

    from gspn_tpu.data.instances import gather_seed_instances
    from gspn_tpu.models.gspn import GSPN
    from gspn_tpu.models.rpointnet import RPointNet
    from gspn_tpu.train.steps import (
        TrainState,
        make_gspn_loss_fn,
        make_rpointnet_loss_fn,
        make_train_step,
    )

    TR_B, TR_N, TR_SEEDS, TR_GT = 4, 4096, 64, 256
    tr_gcfg = _dc.replace(cfg.gspn, fps_segments=1)
    tr_rcfg = _dc.replace(cfg.rpointnet, fps_segments=1)
    tr_batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            np.random.default_rng(0), TR_B, n_points=TR_N, max_instances=8
        ).items()
    }
    tr_key = jax.random.PRNGKey(0)
    tx = optax.adam(1e-3)
    tr_gmodel = GSPN(tr_gcfg)
    tr_seed_idx = ops.farthest_point_sample(
        TR_SEEDS, tr_batch["xyz"], tr_batch["valid"]
    )
    tr_gp, tr_gv, _, _ = gather_seed_instances(
        tr_batch["xyz"], tr_batch["inst_label"], tr_seed_idx, TR_GT
    )
    tr_gvars = tr_gmodel.init(
        tr_key, tr_batch["xyz"], tr_seed_idx, valid=tr_batch["valid"],
        gt_points=tr_gp, gt_valid=tr_gv, z_rng=tr_key, train=False,
    )
    tr_gstate = TrainState.create(tr_gvars, tx)
    tr_rmodel = RPointNet(tr_rcfg)
    tr_boxes = jnp.tile(
        jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0], jnp.float32),
        (TR_B, TR_SEEDS, 1),
    )
    tr_rvars = tr_rmodel.init(
        tr_key, tr_batch["xyz"], tr_boxes, valid=tr_batch["valid"],
        train=False,
    )
    tr_rstate = TrainState.create(tr_rvars, tx)
    frozen = (
        tr_gmodel,
        {"params": tr_gstate.params, "batch_stats": tr_gstate.batch_stats},
        TR_SEEDS,
    )
    tr_step = make_train_step(
        make_rpointnet_loss_fn(
            tr_rmodel, max_instances=16, frozen_gspn=frozen
        ),
        tx,
    )
    train_dt = time_fn(
        tr_step, tr_rstate, tr_batch, tr_key,
        iters=10, warmup=3, batches=4, stat="median",
    )
    train_pps = TR_B * TR_N / train_dt

    # absolute anchor: analytic roofline model vs this measurement
    from gspn_tpu.utils.roofline import pipeline_cost

    rep = pipeline_cost(cfg, B, N)["total"].report(fused_dt)
    ws_rep = pipeline_cost(cfg, WS_B, WS_N)["total"].report(ws_dt)

    done.set()
    metric = "instance_seg_inference_points_per_sec_per_chip"
    if args.dtype != "f32":
        metric += f"_{args.dtype}"
    # derive the suffix from the MEASURED config, not from whether flags
    # were typed: the preset default is seg8-spatial since r4, and the
    # metric key must identify the program so cross-round value_per_probe
    # comparisons stay like-for-like (bare key == exact-FPS records)
    if cfg.gspn.fps_segments != 1:
        metric += f"_segfps{cfg.gspn.fps_segments}"
        if cfg.gspn.fps_segment_mode != "contiguous":
            metric += f"_{cfg.gspn.fps_segment_mode}"
    if cfg.sa1_fps_segments:
        metric += f"_sa1seg{cfg.sa1_fps_segments}"
    if cfg.gspn.group_select != "first":
        metric += f"_{cfg.gspn.group_select}sel"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(fused_pps, 1),
                "unit": "points/sec",
                "vs_baseline": round(fused_pps / ref_pps, 3),
                "mfu": round(rep["mfu"], 5),
                "roofline_frac": round(rep["frac_of_roof"], 4),
                "roofline_bound": rep["bound"],
                # drift calibration: frozen probe (see module docstring);
                # value_per_probe = value * probe_seconds is the
                # cross-session comparable number
                "probe_ms": round(probe_dt * 1e3, 3),
                "value_per_probe": round(fused_pps * probe_dt, 1),
                # whole-scene regime (B=1, N=65536, ~10% masked)
                "value_wholescene": round(ws_pps, 1),
                "wholescene_ms": round(ws_dt * 1e3, 3),
                "roofline_frac_wholescene": round(
                    ws_rep["frac_of_roof"], 4
                ),
                # training regime (stage-2 step, B=4 x N=4096, trainer
                # defaults: exact FPS) — probe-normalize like value
                "value_train": round(train_pps, 1),
                "train_step_ms": round(train_dt * 1e3, 3),
                "value_train_per_probe": round(train_pps * probe_dt, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
