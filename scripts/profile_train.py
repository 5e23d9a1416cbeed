"""Train-step decomposition profiler: forward / backward / optimizer.

For each stage, times three jitted programs on the same batch —

  fwd   : loss_fn only
  grad  : value_and_grad(loss_fn)           (fwd + bwd)
  step  : the real train step               (fwd + bwd + optax/BN update)

and reports the deltas (bwd = grad - fwd, opt = step - grad). Every
program pays the same ~1.35 ms dispatch floor on the tunneled chip, so
the deltas cancel it (same cumulative-prefix logic as
profile_fused.py, applied to the train step's three-phase structure).

    python scripts/profile_train.py [--batch 4] [--num-points 4096]
                                    [--dtype bf16] [--iters 20]

One JSON line per stage. Complements scripts/bench_train.py (which
reports only the whole-step throughput).
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

    def profile(name, loss_fn, state, step):
        # identical call signatures; each jitted separately
        fwd = jax.jit(
            lambda p, s, bt, k: loss_fn(p, s, bt, k)[0]
        )
        grad = jax.jit(
            lambda p, s, bt, k: jax.value_and_grad(loss_fn, has_aux=True)(
                p, s, bt, k
            )[1]
        )
        t_fwd = time_fn(
            lambda bt, k: fwd(state.params, state.batch_stats, bt, k),
            batch, key, iters=args.iters, warmup=3,
        )
        t_grad = time_fn(
            lambda bt, k: grad(state.params, state.batch_stats, bt, k),
            batch, key, iters=args.iters, warmup=3,
        )
        t_step = time_fn(step, state, batch, key, iters=args.iters, warmup=3)
        print(json.dumps({
            "stage": name,
            "batch": b,
            "num_points": n,
            "dtype": args.dtype,
            "fwd_ms": round(t_fwd * 1e3, 3),
            "grad_ms": round(t_grad * 1e3, 3),
            "step_ms": round(t_step * 1e3, 3),
            "bwd_delta_ms": round((t_grad - t_fwd) * 1e3, 3),
            "opt_delta_ms": round((t_step - t_grad) * 1e3, 3),
            "points_per_sec": round(b * n / t_step, 1),
        }))

    # ---- stage 1 (GSPN CVAE)
    gcfg = GSPNConfig(dtype=dtype)
    gmodel = GSPN(gcfg)
    seed_idx = ops.farthest_point_sample(
        args.num_seeds, batch["xyz"], batch["valid"]
    )
    gp, gv, _, _ = gather_seed_instances(
        batch["xyz"], batch["inst_label"], seed_idx, args.gt_size
    )
    gvars = gmodel.init(
        key, batch["xyz"], seed_idx, valid=batch["valid"], gt_points=gp,
        gt_valid=gv, z_rng=key, train=False,
    )
    gstate = TrainState.create(gvars, tx)
    gloss = make_gspn_loss_fn(gmodel, args.num_seeds, args.gt_size)
    profile("gspn", gloss, gstate, make_train_step(gloss, tx))

    # ---- stage 2 (R-PointNet, frozen stage-1 proposals)
    rcfg = RPointNetConfig(dtype=dtype)
    rmodel = RPointNet(rcfg)
    boxes = jnp.tile(
        jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0], jnp.float32),
        (b, args.num_seeds, 1),
    )
    rvars = rmodel.init(
        key, batch["xyz"], boxes, valid=batch["valid"], train=False
    )
    rstate = TrainState.create(rvars, tx)
    frozen = (
        gmodel,
        {"params": gstate.params, "batch_stats": gstate.batch_stats},
        args.num_seeds,
    )
    rloss = make_rpointnet_loss_fn(rmodel, max_instances=16,
                                   frozen_gspn=frozen)
    profile("rpointnet", rloss, rstate, make_train_step(rloss, tx))


if __name__ == "__main__":
    main()
