"""Interleaved perf A/B: decoupled seeds/sa1 FPS passes (VERDICT r4 #1).

The flagship's ONE shared FPS pass computes 1024 picks at S=8 (128
sequential steps per chain) because the 64-seed consumer caps the shared
segment count (`shared_eligible_fps_segments` floor: >= 8 picks/chain).
`PipelineConfig.sa1_fps_segments` decouples them: seeds stay at spatial
S=8, sa1 runs its own pass at S in {16, 32, 64, 128} (64..8 steps/chain),
with the Morton sort paid ONCE for both passes
(models/pipeline.py::_split_fps_indices).

Two tables per shape (flagship B=8xN=8192, whole-scene B=1xN=65536):
  1. sampling-only: jitted shared_fps_indices (the FPS cost in isolation)
  2. whole-pipeline: the fused inference program (the decision number —
     STATUS "Measurement hygiene": judge perf only from fused in-program
     deltas)
All arms interleave batch-by-batch in the same window.

    python scripts/ab_fps_split.py
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

ROUNDS, ITERS = 6, 8
SA1_SEGS = (16, 32, 64, 128)


def main():
    from gspn_tpu.data import synthetic
    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
        shared_fps_indices,
    )
    from gspn_tpu.models.presets import set_pipeline_fps_segments
    from gspn_tpu.utils.timing import time_fn
    from __graft_entry__ import _flagship_pipeline_config

    base = _flagship_pipeline_config()  # seg8 spatial shared (r4 default)
    exact = set_pipeline_fps_segments(base, 1)
    cfgs = {"exact": exact, "shared8": base}
    for s in SA1_SEGS:
        cfgs[f"split{s}"] = dataclasses.replace(base, sa1_fps_segments=s)

    key = jax.random.PRNGKey(1)
    for name, b, n, masked in (
        ("flagship B=8 N=8192", 8, 8192, False),
        ("whole-scene B=1 N=65536 (10% masked)", 1, 65536, True),
    ):
        rng = np.random.default_rng(0)
        batch = synthetic.scene_batch(
            rng, b, n_points=n, max_instances=8 if n <= 8192 else 24,
            extent=2.0 if n <= 8192 else 8.0,
        )
        valid = np.asarray(batch["valid"]).copy()
        if masked:
            valid[:, -n // 10:] = False
        xyz = jnp.asarray(batch["xyz"])
        validj = jnp.asarray(valid)
        variables = init_pipeline_variables(base, jax.random.PRNGKey(0), n)

        # ---- 1. sampling-only arms (sum both outputs so nothing DCEs)
        def make_fps_arm(cfg):
            def f(xyz, valid):
                seed_idx, sa1_idx = shared_fps_indices(cfg, xyz, valid)
                tot = jnp.sum(seed_idx)
                if sa1_idx is not None:
                    tot = tot + jnp.sum(sa1_idx)
                return tot

            return jax.jit(f)

        fps_arms = {tag: make_fps_arm(c) for tag, c in cfgs.items()}
        for f in fps_arms.values():
            time_fn(f, xyz, validj, iters=1, warmup=1)
        ts = {tag: [] for tag in fps_arms}
        for _ in range(ROUNDS):
            for tag, f in fps_arms.items():
                ts[tag].append(time_fn(f, xyz, validj, iters=ITERS, warmup=0))
        med = {tag: float(np.median(v)) for tag, v in ts.items()}
        print(json.dumps({
            "table": "sampling-only", "config": name,
            **{f"{tag}_ms": round(t * 1e3, 3) for tag, t in med.items()},
            **{f"{tag}_vs_shared8": round(med["shared8"] / t, 4)
               for tag, t in med.items() if tag != "shared8"},
        }), flush=True)

        # ---- 2. whole-pipeline arms
        infers = {tag: jax.jit(make_inference_fn(c)) for tag, c in cfgs.items()}
        for f in infers.values():
            time_fn(f, variables, xyz, None, validj, key, iters=1, warmup=1)
        ts = {tag: [] for tag in infers}
        for _ in range(ROUNDS):
            for tag, f in infers.items():
                ts[tag].append(
                    time_fn(f, variables, xyz, None, validj, key,
                            iters=ITERS, warmup=0))
        med = {tag: float(np.median(v)) for tag, v in ts.items()}
        print(json.dumps({
            "table": "whole-pipeline", "config": name,
            **{f"{tag}_ms": round(t * 1e3, 3) for tag, t in med.items()},
            **{f"{tag}_vs_shared8": round(med["shared8"] / t, 4)
               for tag, t in med.items() if tag != "shared8"},
            "shared8_pps": round(b * n / med["shared8"], 1),
        }), flush=True)


if __name__ == "__main__":
    main()
