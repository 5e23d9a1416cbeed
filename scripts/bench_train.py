"""Training-throughput benchmark (BASELINE.json config-5 axis): jitted
train-step points/sec/chip for both stages on synthetic ScanNet-like
scenes, f32 and bf16.

    python scripts/bench_train.py [--batch 4] [--num-points 4096] [--dtype bf16]

One JSON line per stage. Complements bench.py (inference) — the reference
publishes no training throughput either, so these rows are our own
tracking metric across rounds.
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
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--num-points", type=int, default=4096)
    ap.add_argument("--num-seeds", type=int, default=64)
    ap.add_argument("--gt-size", type=int, default=256)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32


    from gspn_tpu import ops
    from gspn_tpu.data import synthetic
    from gspn_tpu.data.instances import gather_seed_instances
    from gspn_tpu.models.gspn import GSPN, GSPNConfig
    from gspn_tpu.models.rpointnet import RPointNet, RPointNetConfig
    from gspn_tpu.train.steps import (
        TrainState,
        make_gspn_loss_fn,
        make_rpointnet_loss_fn,
        make_train_step,
    )
    from gspn_tpu.utils.timing import time_fn

    b, n = args.batch, args.num_points
    rng = np.random.default_rng(0)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, b, n_points=n, max_instances=8
        ).items()
    }
    key = jax.random.PRNGKey(0)
    tx = optax.adam(1e-3)
    rows = []

    # ---- stage 1 (GSPN CVAE)
    gcfg = GSPNConfig(dtype=dtype)
    gmodel = GSPN(gcfg)
    seed_idx = ops.farthest_point_sample(args.num_seeds, batch["xyz"], batch["valid"])
    gp, gv, _, _ = gather_seed_instances(
        batch["xyz"], batch["inst_label"], seed_idx, args.gt_size
    )
    gvars = gmodel.init(
        key, batch["xyz"], seed_idx, valid=batch["valid"], gt_points=gp,
        gt_valid=gv, z_rng=key, train=False,
    )
    gstate = TrainState.create(gvars, tx)
    gstep = make_train_step(
        make_gspn_loss_fn(gmodel, args.num_seeds, args.gt_size), tx
    )
    from gspn_tpu.models.pipeline import PipelineConfig
    from gspn_tpu.utils.roofline import train_step_cost

    dt = time_fn(gstep, gstate, batch, key, iters=args.iters, warmup=3)
    pcfg = PipelineConfig(gspn=gcfg, rpointnet=RPointNetConfig(dtype=dtype),
                          num_seeds=args.num_seeds)
    rep1 = train_step_cost(pcfg, b, n, gt_size=args.gt_size, stage=1)[
        "total"
    ].report(dt)
    rows.append({
        "metric": f"gspn_train_points_per_sec_per_chip_{args.dtype}",
        "value": round(b * n / dt, 1),
        "unit": "points/sec",
        "step_ms": round(dt * 1e3, 3),
        "roofline_frac": round(rep1["frac_of_roof"], 4),
        "roofline_bound": rep1["bound"],
        "mfu": round(rep1["mfu"], 5),
    })

    # ---- stage 2 (R-PointNet, frozen stage-1 proposals)
    rcfg = RPointNetConfig(dtype=dtype)
    rmodel = RPointNet(rcfg)
    boxes = jnp.tile(
        jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0], jnp.float32),
        (b, args.num_seeds, 1),
    )
    rvars = rmodel.init(key, batch["xyz"], boxes, valid=batch["valid"], train=False)
    rstate = TrainState.create(rvars, tx)
    frozen = (gmodel, {"params": gstate.params, "batch_stats": gstate.batch_stats},
              args.num_seeds)
    rstep = make_train_step(
        make_rpointnet_loss_fn(rmodel, max_instances=16, frozen_gspn=frozen), tx
    )
    dt = time_fn(rstep, rstate, batch, key, iters=args.iters, warmup=3)
    rep2 = train_step_cost(
        PipelineConfig(gspn=gcfg, rpointnet=rcfg, num_seeds=args.num_seeds),
        b, n, gt_size=args.gt_size, stage=2,
    )["total"].report(dt)
    rows.append({
        "metric": f"rpointnet_train_points_per_sec_per_chip_{args.dtype}",
        "value": round(b * n / dt, 1),
        "unit": "points/sec",
        "step_ms": round(dt * 1e3, 3),
        "roofline_frac": round(rep2["frac_of_roof"], 4),
        "roofline_bound": rep2["bound"],
        "mfu": round(rep2["mfu"], 5),
    })

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
