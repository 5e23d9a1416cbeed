"""Per-stage timing breakdown of the flagship instance-seg pipeline on the
real chip (VERDICT round-1 item #1: make the perf claim defensible).

Times each pipeline stage as its own jitted program at the bench shape
(B=8, N=8192), plus the backbone layer-by-layer, so STATUS.md can name
where the milliseconds live. Stage sums exceed the fused end-to-end time
(XLA overlaps/fuses across stages in the one-program path); the table is
a where-does-time-go map, not an additive decomposition.

    python scripts/profile_pipeline.py [--dtype bf16] [--trace DIR]
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

B, N = 8, 8192
ITERS, WARMUP = 20, 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    ap.add_argument("--trace", type=str, default=None,
                    help="also capture a jax.profiler trace of the fused run")
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--fps-segments", type=int, default=None,
                    help="segmented parallel-chain FPS; default = the "
                         "preset's choice (8 spatial), 1 = exact")
    ap.add_argument("--fps-segment-mode",
                    choices=["contiguous", "strided", "spatial"],
                    default="spatial")
    args = ap.parse_args()

    from gspn_tpu import ops
    from gspn_tpu.data import synthetic
    from gspn_tpu.models.gspn import GSPN, proposal_boxes
    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
        project_roi_masks,
    )
    from gspn_tpu.models.rpointnet import RPointNet, apply_box_deltas
    from gspn_tpu.nn.pointnet2 import PointNetFPModule, PointNetSAModule
    from gspn_tpu.utils.timing import time_fn
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
    rng = np.random.default_rng(0)
    batch = synthetic.scene_batch(rng, B, n_points=N, max_instances=8)
    xyz = jnp.asarray(batch["xyz"])
    valid = jnp.asarray(batch["valid"])
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), N)
    key = jax.random.PRNGKey(1)

    gspn, rpn = GSPN(cfg.gspn), RPointNet(cfg.rpointnet)
    rows: list[tuple[str, float]] = []

    def bench(name, fn, *xs):
        dt = time_fn(jax.jit(fn), *xs, iters=args.iters, warmup=WARMUP)
        rows.append((name, dt * 1e3))
        print(f"{name:<34s} {dt * 1e3:8.3f} ms")
        return fn(*xs)

    # ---- stage 1: seeds
    seed_idx = bench(
        "seeds: fps(64, N=8192)",
        lambda x, v: ops.farthest_point_sample(
            cfg.num_seeds, x, v,
            segments=ops.eligible_fps_segments(
                cfg.gspn.fps_segments, cfg.num_seeds, N
            ),
        ),
        xyz, valid,
    )

    # ---- stage 2: GSPN proposal forward
    gout = bench(
        "gspn: context+cvae forward",
        lambda gv, x, s, v: gspn.apply(gv, x, s, valid=v, z_rng=key, train=False),
        variables["gspn"], xyz, seed_idx, valid,
    )
    boxes = proposal_boxes(gout.generated, cfg.rpointnet.box_margin)
    obj = jax.nn.sigmoid(gout.objectness)

    # ---- stage 3: NMS
    bench(
        "nms: on-device 3d",
        lambda b, s: ops.nms_3d_batched(b, s, cfg.rpointnet.nms_iou),
        boxes, obj,
    )

    # ---- stage 4: backbone, layer by layer
    bb = variables["rpointnet"]["params"]["backbone"]
    bb_stats = variables["rpointnet"]["batch_stats"]["backbone"]
    xs, fs, vs = [xyz], [None], [valid]
    for i, spec in enumerate(cfg.rpointnet.sa_layers):
        mod = PointNetSAModule(
            npoint=spec.npoint, radius=spec.radius, nsample=spec.nsample,
            mlp=spec.mlp, use_bn=cfg.rpointnet.use_bn,
            ops_impl=cfg.rpointnet.ops_impl, dtype=cfg.rpointnet.dtype,
        )
        svars = {
            "params": bb[f"sa{i + 1}"],
            "batch_stats": bb_stats[f"sa{i + 1}"],
        }
        out = bench(
            f"backbone sa{i + 1}: P={spec.npoint} K={spec.nsample} "
            f"N={xs[-1].shape[1]}",
            lambda sv, x, f, v, m=mod: m.apply(sv, x, f, v, False),
            svars, xs[-1], fs[-1], vs[-1],
        )
        xs.append(out[0]); fs.append(out[1]); vs.append(out[2])
    feat = fs[-1]
    for i, mlp in enumerate(cfg.rpointnet.fp_mlps):
        lvl = len(cfg.rpointnet.sa_layers) - 1 - i
        mod = PointNetFPModule(mlp, use_bn=cfg.rpointnet.use_bn,
                               dtype=cfg.rpointnet.dtype)
        svars = {
            "params": bb[f"fp{i + 1}"],
            "batch_stats": bb_stats[f"fp{i + 1}"],
        }
        feat = bench(
            f"backbone fp{i + 1}: M={xs[lvl + 1].shape[1]} -> "
            f"N={xs[lvl].shape[1]}",
            lambda sv, a, b, p1, p2, v1, v2, m=mod: m.apply(
                sv, a, b, p1, p2, v1, v2, False
            ),
            svars, xs[lvl], xs[lvl + 1], fs[lvl], feat, vs[lvl], vs[lvl + 1],
        )

    # ---- stage 5: full R-PointNet (backbone + RoIAlign + heads)
    out = bench(
        "rpointnet: backbone+roialign+heads",
        lambda rv, x, b, v: rpn.apply(rv, x, b, valid=v, train=False),
        variables["rpointnet"], xyz, boxes, valid,
    )

    # ---- stage 6: mask projection
    refined = apply_box_deltas(boxes, out.box_deltas)
    bench(
        "masks: project to scene points",
        lambda x, r, i, m, v: project_roi_masks(
            x, r, i, m, cfg.mask_thresh, v, mode=cfg.mask_project
        ),
        xyz, refined, out.roi_xyz, out.mask_logits, valid,
    )

    # ---- fused end-to-end
    infer = make_inference_fn(cfg)
    dt = time_fn(
        jax.jit(infer), variables, xyz, None, valid, key,
        iters=args.iters, warmup=WARMUP,
    )
    rows.append(("FUSED end-to-end", dt * 1e3))
    print(f"{'FUSED end-to-end':<34s} {dt * 1e3:8.3f} ms   "
          f"({B * N / dt / 1e6:.2f} Mpts/s)")

    if args.trace:
        from gspn_tpu.utils.profiling import trace as prof_trace
        from gspn_tpu.utils.timing import sync

        jfn = jax.jit(infer)
        sync(jfn(variables, xyz, None, valid, key))
        with prof_trace(args.trace):
            for _ in range(3):
                sync(jfn(variables, xyz, None, valid, key))
        print(f"trace written to {args.trace}")

    print(json.dumps({
        "dtype": args.dtype,
        "stages_ms": {k: round(v, 3) for k, v in rows},
        "fused_mpts_per_s": round(B * N / dt / 1e6, 3),
    }))


if __name__ == "__main__":
    main()
