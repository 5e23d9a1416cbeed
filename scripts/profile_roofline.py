"""Roofline accounting: analytic per-stage time floors (MXU FLOPs / VPU
ops / HBM bytes vs v5e peaks) next to measured times, answering "is this
actually fast, and which roof is it under" (VERDICT r2 item #2).

    python scripts/profile_roofline.py [--iters 20]

Measured column: the fused end-to-end pipeline plus standalone per-stage
programs (subtract the ~1.35 ms dispatch floor per standalone row; the
in-program cost is lower still — see profile_backbone's cumulative
prefixes). The floors are fusion-optimal minimums: a stage at a small
fraction of its roof is latency/structure-bound, not compute-bound.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

# the axon TPU plugin force-selects itself over a JAX_PLATFORMS env
# request; honor the env var at the config level before any device query
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

B, N = 8, 8192


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax.numpy as jnp

    from gspn_tpu.data import synthetic
    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
    )
    from gspn_tpu.utils.roofline import V5E, pipeline_cost
    from gspn_tpu.utils.timing import time_fn
    from __graft_entry__ import _flagship_pipeline_config

    cfg = _flagship_pipeline_config()
    stages = pipeline_cost(cfg, B, N)

    print(f"peaks: {V5E.name} MXU {V5E.mxu_flops/1e12:.0f} TF/s  "
          f"VPU {V5E.vpu_ops/1e12:.1f} Top/s  HBM {V5E.hbm_bytes/1e9:.0f} GB/s")
    print(f"{'stage':<24s} {'mxu_us':>8s} {'vpu_us':>8s} {'hbm_us':>8s} "
          f"{'floor_us':>9s} bound")
    for name, c in stages.items():
        f = c.floors()
        print(
            f"{name:<24s} {f['mxu']*1e6:8.1f} {f['vpu']*1e6:8.1f} "
            f"{f['hbm']*1e6:8.1f} {f['floor']*1e6:9.1f} {f['bound']}",
            flush=True,
        )

    if jax.default_backend() != "tpu":
        print("(no TPU: floors only, no measured column)")
        return

    rng = np.random.default_rng(0)
    batch = synthetic.scene_batch(rng, B, n_points=N, max_instances=8)
    xyz = jnp.asarray(batch["xyz"])
    valid = jnp.asarray(batch["valid"])
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), N)
    infer = jax.jit(make_inference_fn(cfg))
    dt = time_fn(
        infer, variables, xyz, None, valid, jax.random.PRNGKey(1),
        iters=args.iters,
    )
    rep = stages["total"].report(dt)
    print(json.dumps({
        "fused_ms": round(dt * 1e3, 3),
        "total_floor_ms": round(rep["floor"] * 1e3, 3),
        "bound": rep["bound"],
        "frac_of_roof": round(rep["frac_of_roof"], 4),
        "mfu": round(rep["mfu"], 5),
    }))


if __name__ == "__main__":
    main()
