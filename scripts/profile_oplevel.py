"""Op-level decomposition of the two big pipeline blocks (STATUS agenda
item: "need an op-level trace to apportion gspn forward ~4.6ms and
rpointnet ~13.6ms").

Times each sub-computation as its own jitted program at the bench shape
(B=8, N=8192, S=R=64). Each row pays the ~1.35 ms dispatch floor once;
derived "minus" rows are differences of two measured programs, so the
floor cancels. Writes a JSON summary to stdout (and --out FILE).

    python scripts/profile_oplevel.py [--iters 20] [--out /tmp/oplevel.json]
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
WARMUP = 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from gspn_tpu import ops
    from gspn_tpu.data import synthetic
    from gspn_tpu.models.gspn import GSPN, proposal_boxes
    from gspn_tpu.models.pipeline import init_pipeline_variables, project_roi_masks
    from gspn_tpu.models.rpointnet import (
        RoIHeads,
        RPointNet,
        gather_roi_features,
        point_roi_align,
    )
    from gspn_tpu.utils.timing import time_fn
    from __graft_entry__ import _flagship_pipeline_config

    cfg = _flagship_pipeline_config()
    rng = np.random.default_rng(0)
    batch = synthetic.scene_batch(rng, B, n_points=N, max_instances=8)
    xyz = jnp.asarray(batch["xyz"])
    valid = jnp.asarray(batch["valid"])
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), N)
    key = jax.random.PRNGKey(1)

    gspn = GSPN(cfg.gspn)
    rpn = RPointNet(cfg.rpointnet)
    rows: dict[str, float] = {}

    def bench(name, fn, *xs):
        jfn = jax.jit(fn)
        dt = time_fn(jfn, *xs, iters=args.iters, warmup=WARMUP)
        rows[name] = dt * 1e3
        print(f"{name:<44s} {dt * 1e3:8.3f} ms", flush=True)
        return fn(*xs)

    # ---------------- GSPN block ----------------
    seed_idx = ops.farthest_point_sample(cfg.num_seeds, xyz, valid)
    seed_xyz = ops.gather_point(xyz, seed_idx)

    def gspn_crops(x, sx, v):
        return ops.query_ball_group_multi(
            cfg.gspn.context_radii, cfg.gspn.context_nsample, x, sx, v,
            impl=cfg.gspn.ops_impl,
        )

    bench("gspn/context_crops (fused ballgroup x3)", gspn_crops, xyz, seed_xyz, valid)

    gout = bench(
        "gspn/forward (full)",
        lambda gv, x, s, v: gspn.apply(gv, x, s, valid=v, z_rng=key, train=False),
        variables["gspn"], xyz, seed_idx, valid,
    )
    rows["gspn/encoders+heads (derived)"] = (
        rows["gspn/forward (full)"] - rows["gspn/context_crops (fused ballgroup x3)"]
    )

    boxes = proposal_boxes(gout.generated, cfg.rpointnet.box_margin)

    # ---------------- R-PointNet block ----------------
    # backbone alone
    from gspn_tpu.models.rpointnet import Backbone

    bb_vars = {
        "params": variables["rpointnet"]["params"]["backbone"],
        "batch_stats": variables["rpointnet"]["batch_stats"]["backbone"],
    }
    feat = bench(
        "rpn/backbone (SAx4+FPx4)",
        lambda bv, x, v: Backbone(cfg.rpointnet).apply(bv, x, None, v, False),
        bb_vars, xyz, valid,
    )

    s = cfg.rpointnet.roi_samples
    align = bench(
        "rpn/point_roi_align (inside+topk+canon)",
        lambda x, b, v: point_roi_align(x, b, s, v),
        xyz, boxes, valid,
    )
    idx = align[0]

    bench("rpn/gather_roi_features", gather_roi_features, feat, idx)

    # inside-mask alone (the (B,R,N) containment test inside roi_align)
    def inside_only(x, b, v):
        lo = b[..., None, 0:3]
        hi = b[..., None, 3:6]
        p = x[:, None, :, :]
        ins = jnp.all(jnp.logical_and(p >= lo, p <= hi), axis=-1)
        return jnp.logical_and(ins, v[:, None, :])

    bench("rpn/roi inside-mask only", inside_only, xyz, boxes, valid)

    hd_vars = {
        "params": variables["rpointnet"]["params"]["heads"],
        "batch_stats": variables["rpointnet"]["batch_stats"]["heads"],
    }
    canon = align[1]
    roi_feats = gather_roi_features(feat, idx)
    roi_valid = align[2]
    bench(
        "rpn/heads (roi_mlp+cls+box+mask)",
        lambda hv, c, f, rv: RoIHeads(cfg.rpointnet).apply(hv, c, f, rv, False),
        hd_vars, canon, roi_feats, roi_valid,
    )

    out = bench(
        "rpn/full (backbone+align+heads)",
        lambda rv, x, b, v: rpn.apply(rv, x, b, valid=v, train=False),
        variables["rpointnet"], xyz, boxes, valid,
    )
    rows["rpn/align+heads (derived)"] = (
        rows["rpn/full (backbone+align+heads)"] - rows["rpn/backbone (SAx4+FPx4)"]
    )

    # ---------------- mask projection ----------------
    from gspn_tpu.models.rpointnet import apply_box_deltas

    refined = apply_box_deltas(boxes, out.box_deltas)
    bench(
        "masks/project (inside + 1nn kernel)",
        lambda x, r, rx, ml, v: project_roi_masks(
            x, r, rx, ml, cfg.mask_thresh, v, mode=cfg.mask_project
        ),
        xyz, refined, out.roi_xyz, out.mask_logits, valid,
    )

    def mask_inside_only(x, r, v):
        ins = jnp.all(
            jnp.logical_and(
                x[:, None, :, :] >= r[..., None, 0:3],
                x[:, None, :, :] <= r[..., None, 3:6],
            ),
            axis=-1,
        )
        return jnp.logical_and(ins, v[:, None, :])

    bench("masks/inside-mask only", mask_inside_only, xyz, refined, valid)

    bench(
        "masks/nearest_sample_logit kernel",
        lambda x, rx, ml: ops.nearest_sample_logit(x, rx, ml),
        xyz, out.roi_xyz, out.mask_logits,
    )

    # ---------------- backbone SA1 decomposition ----------------
    spec = cfg.rpointnet.sa_layers[0]

    fps_idx = bench(
        "sa1/fps(1024, N=8192)",
        lambda x, v: ops.farthest_point_sample(spec.npoint, x, v),
        xyz, valid,
    )
    new_xyz = ops.gather_point(xyz, fps_idx)

    def bg(x, nx, v):
        return ops.query_ball_group_multi(
            (spec.radius,), (spec.nsample,), x, nx, v
        )

    ((_, _, grouped),) = bench("sa1/ballgroup(P=1024,K=32)", bg, xyz, new_xyz, valid)

    from gspn_tpu.nn.layers import PointMLP

    mlp_mod = PointMLP(spec.mlp, use_bn=cfg.rpointnet.use_bn)
    sa1 = variables["rpointnet"]["params"]["backbone"]["sa1"]
    sa1_stats = variables["rpointnet"]["batch_stats"]["backbone"]["sa1"]
    mvars = {"params": sa1["mlp"], "batch_stats": sa1_stats["mlp"]}

    def mlp_max(mv, g):
        h = mlp_mod.apply(mv, g, train=False)
        return jnp.max(h, axis=2)

    bench("sa1/pointmlp+max (P=1024,K=32,3->64)", mlp_max, mvars, grouped)

    print(json.dumps({"oplevel_ms": {k: round(v, 3) for k, v in rows.items()}}))
    if args.out:
        pathlib.Path(args.out).write_text(
            json.dumps({k: round(v, 3) for k, v in rows.items()}, indent=1)
        )


if __name__ == "__main__":
    main()
