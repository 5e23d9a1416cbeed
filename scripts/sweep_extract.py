"""Interleaved on-chip A/B of the ball-group extraction schedules
(``ops/ball_group.py _EXTRACT``): "serial" (r3 default — per-hit
min->select->invalidate chain) vs "rank" (r4 — per-window precomputed
arrival ranks + independent masked-sum steps). Both oracle-exact first-K;
this sweep is pure performance (VERDICT r3 #2 bar: >=1.2x on sa1+ctx
in-program at flagship AND whole-scene shapes).

Measures, batch-interleaved within the same tunnel window:
  1. standalone fused ball-group at sa1 / gspn-ctx / whole-scene shapes;
  2. in-program: fused inference pipeline (flagship B=8xN=8192 and
     whole-scene B=1xN=65536) with the extract mode threaded through.

    python scripts/sweep_extract.py [--iters 8] [--batches 6]
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def interleaved(fa, fb, args_a, args_b, iters, batches):
    """Alternate timing batches of fa/fb; return (median_a, median_b)."""
    from gspn_tpu.utils.timing import time_fn

    ta, tb = [], []
    time_fn(fa, *args_a, iters=1, warmup=2)
    time_fn(fb, *args_b, iters=1, warmup=2)
    for _ in range(batches):
        ta.append(time_fn(fa, *args_a, iters=iters, warmup=0))
        tb.append(time_fn(fb, *args_b, iters=iters, warmup=0))
    return float(np.median(ta)), float(np.median(tb))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batches", type=int, default=6)
    args = ap.parse_args()

    from gspn_tpu import ops
    from gspn_tpu.data import synthetic
    from gspn_tpu.ops.ball_group import query_ball_group_multi

    rng = np.random.default_rng(0)

    def ball_ab(name, b, n, m, radii, ks, masked=False):
        batch = synthetic.scene_batch(
            rng, b, n_points=n, max_instances=8 if n <= 8192 else 24,
            extent=2.0 if n <= 8192 else 8.0,
        )
        xyz = jnp.asarray(batch["xyz"])
        valid = None
        if masked:
            v = np.asarray(batch["valid"]).copy()
            v[:, -n // 10:] = False
            valid = jnp.asarray(v)
        q = ops.gather_point(xyz, ops.farthest_point_sample(m, xyz, valid))

        def run(extract, x, qq):
            outs = query_ball_group_multi(
                radii, ks, x, qq, valid, impl="pallas", extract=extract
            )
            return [o[2] for o in outs]

        fa = jax.jit(functools.partial(run, "serial"))
        fb = jax.jit(functools.partial(run, "rank"))
        da, db = interleaved(fa, fb, (xyz, q), (xyz, q),
                             args.iters, args.batches)
        print(f"{name:<42s} serial {da*1e3:7.3f} ms  rank {db*1e3:7.3f} ms"
              f"  ratio {da/db:5.3f}x")

    # sa1: P=1024 queries, K=32, single scale
    ball_ab("sa1 (B=8 N=8192 M=1024 r=.1 K=32)", 8, 8192, 1024,
            (0.1,), (32,))
    # gspn context crops: 64 seeds, two scales
    ball_ab("ctx (B=8 N=8192 M=64 r=.3/.6 K=128/256)", 8, 8192, 64,
            (0.3, 0.6), (128, 256))
    # whole-scene masked
    ball_ab("whole-scene sa1 (B=1 N=65536 M=1024)", 1, 65536, 1024,
            (0.4,), (32,), masked=True)

    # box_group at the RoIAlign shape (R=128 proposals, S=64 samples)
    from gspn_tpu.ops.box_group import query_box_group

    def box_ab(name, b, n, r, s, extent):
        batch = synthetic.scene_batch(
            rng, b, n_points=n, max_instances=8 if n <= 8192 else 24,
            extent=extent,
        )
        xyz = jnp.asarray(batch["xyz"])
        c = rng.uniform(-extent / 2, extent / 2, (b, r, 3)).astype(np.float32)
        e = rng.uniform(0.2, 0.8, (b, r, 3)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([c - e, c + e], axis=-1))

        def run(extract, x, bx):
            return query_box_group(bx, s, x, impl="pallas", extract=extract)

        fa = jax.jit(functools.partial(run, "serial"))
        fb = jax.jit(functools.partial(run, "rank"))
        da, db = interleaved(fa, fb, (xyz, boxes), (xyz, boxes),
                             args.iters, args.batches)
        print(f"{name:<42s} serial {da*1e3:7.3f} ms  rank {db*1e3:7.3f} ms"
              f"  ratio {da/db:5.3f}x")

    box_ab("box_group (B=8 N=8192 R=128 S=64)", 8, 8192, 128, 64, 2.0)
    box_ab("box_group whole-scene (B=1 N=65536 R=128)", 1, 65536, 128, 64,
           8.0)

    # ---- in-program: full fused inference, extract threaded via _EXTRACT
    import gspn_tpu.ops.ball_group as bg
    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
    )
    from __graft_entry__ import _flagship_pipeline_config

    cfg = _flagship_pipeline_config()
    for name, b, n in [("flagship B=8 N=8192", 8, 8192),
                       ("whole-scene B=1 N=65536", 1, 65536)]:
        batch = synthetic.scene_batch(
            rng, b, n_points=n, max_instances=8 if n <= 8192 else 24,
            extent=2.0 if n <= 8192 else 8.0,
        )
        xyz = jnp.asarray(batch["xyz"])
        if n > 8192:
            v = np.asarray(batch["valid"]).copy()
            v[:, -n // 10:] = False
            valid = jnp.asarray(v)
        else:
            valid = jnp.asarray(batch["valid"])
        variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), n)
        key = jax.random.PRNGKey(1)

        # module-flag switch: _EXTRACT is read at TRACE time, so trace
        # each jitted program under its flag BEFORE interleaving (traces
        # are cached; the flag is irrelevant afterwards)
        from gspn_tpu.utils.timing import sync

        bg._EXTRACT = "serial"
        fa = jax.jit(make_inference_fn(cfg))
        sync(fa(variables, xyz, None, valid, key))
        bg._EXTRACT = "rank"
        fb = jax.jit(make_inference_fn(cfg))
        sync(fb(variables, xyz, None, valid, key))
        bg._EXTRACT = "serial"
        da, db = interleaved(
            fa, fb,
            (variables, xyz, None, valid, key),
            (variables, xyz, None, valid, key),
            max(args.iters // 2, 2), args.batches,
        )
        print(f"in-program {name:<31s} serial {da*1e3:7.3f} ms  "
              f"rank {db*1e3:7.3f} ms  ratio {da/db:5.3f}x")


if __name__ == "__main__":
    main()
