"""In-program backbone apportioning: time cumulative prefixes of the
SA/FP stack as single jitted programs, so each layer's cost is the
difference of two fused programs (dispatch floor and program-boundary
layout overheads cancel — unlike timing each layer standalone).

    python scripts/profile_backbone.py [--iters 20]
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
    args = ap.parse_args()

    from gspn_tpu.data import synthetic
    from gspn_tpu.models.pipeline import init_pipeline_variables
    from gspn_tpu.models.rpointnet import Backbone
    from gspn_tpu.nn.pointnet2 import PointNetFPModule, PointNetSAModule
    from gspn_tpu.utils.timing import time_fn
    from __graft_entry__ import _flagship_pipeline_config

    cfg = _flagship_pipeline_config()
    rng = np.random.default_rng(0)
    batch = synthetic.scene_batch(rng, B, n_points=N, max_instances=8)
    xyz = jnp.asarray(batch["xyz"])
    valid = jnp.asarray(batch["valid"])
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), N)
    bb = {
        "params": variables["rpointnet"]["params"]["backbone"],
        "batch_stats": variables["rpointnet"]["batch_stats"]["backbone"],
    }
    rcfg = cfg.rpointnet
    nsa = len(rcfg.sa_layers)

    def make_prefix(n_sa: int, n_fp: int):
        """A function running the first n_sa SA layers then n_fp FP layers."""

        def fn(bv, x, v):
            xs, fs, vs = [x], [None], [v]
            for i in range(n_sa):
                spec = rcfg.sa_layers[i]
                mod = PointNetSAModule(
                    npoint=spec.npoint, radius=spec.radius,
                    nsample=spec.nsample, mlp=spec.mlp, use_bn=rcfg.use_bn,
                    ops_impl=rcfg.ops_impl, dtype=rcfg.dtype,
                )
                sv = {
                    "params": bv["params"][f"sa{i + 1}"],
                    "batch_stats": bv["batch_stats"][f"sa{i + 1}"],
                }
                nx, nf, nv = mod.apply(sv, xs[-1], fs[-1], vs[-1], False)
                xs.append(nx); fs.append(nf); vs.append(nv)
            feat = fs[-1]
            for i in range(n_fp):
                lvl = nsa - 1 - i
                mod = PointNetFPModule(
                    rcfg.fp_mlps[i], use_bn=rcfg.use_bn, dtype=rcfg.dtype
                )
                sv = {
                    "params": bv["params"][f"fp{i + 1}"],
                    "batch_stats": bv["batch_stats"][f"fp{i + 1}"],
                }
                feat = mod.apply(
                    sv, xs[lvl], xs[lvl + 1], fs[lvl], feat, vs[lvl],
                    vs[lvl + 1], False,
                )
            return feat

        return fn

    stages = [(i, 0) for i in range(1, nsa + 1)] + [
        (nsa, j) for j in range(1, nsa + 1)
    ]
    rows = {}
    prev = 0.0
    for n_sa, n_fp in stages:
        fn = jax.jit(make_prefix(n_sa, n_fp))
        dt = time_fn(fn, bb, xyz, valid, iters=args.iters, warmup=WARMUP) * 1e3
        name = f"sa1..{n_sa}" + (f"+fp1..{n_fp}" if n_fp else "")
        delta = dt - prev
        rows[name] = {"cum_ms": round(dt, 3), "delta_ms": round(delta, 3)}
        print(f"{name:<18s} cum {dt:8.3f} ms   delta {delta:8.3f} ms", flush=True)
        prev = dt

    # full backbone module for cross-check
    full = jax.jit(
        lambda bv, x, v: Backbone(rcfg).apply(bv, x, None, v, False)
    )
    dt = time_fn(full, bb, xyz, valid, iters=args.iters, warmup=WARMUP) * 1e3
    rows["Backbone(full)"] = {"cum_ms": round(dt, 3), "delta_ms": 0.0}
    print(f"{'Backbone(full)':<18s} cum {dt:8.3f} ms")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
