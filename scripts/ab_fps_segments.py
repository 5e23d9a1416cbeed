"""Interleaved A/B: fused inference with exact vs segmented FPS.

Segmented parallel-chain FPS (ops/fps.py, ``fps_segments``) cuts the
inherently sequential greedy chain S-fold by running S exact chains on
separate sublane rows of the same kernel — at a documented seed-level
parity delta (SURVEY.md §7 hard-part #1). FPS is the pipeline's single
biggest latency-structured stage (the in-program shared seeds+sa1 pass is
~2.3 ms at flagship shapes and ~6 ms at whole-scene N=65536 — STATUS.md),
so this is the one remaining large lever the kernel sweeps left standing.

Measured the only trustworthy way on the drifting tunnel: batch-by-batch
interleaved A/B (STATUS.md "Measurement hygiene"). Raw (unsorted) scene
layout — the pipeline default; ab_morton.py measured sorted layouts slower
end-to-end.

    python scripts/ab_fps_segments.py
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np
import jax.numpy as jnp

ROUNDS, ITERS = 6, 8


def ab(name, infer_a, infer_b, variables, xyz, valid, key, n_pts, label_b):
    from gspn_tpu.utils.timing import time_fn

    time_fn(infer_a, variables, xyz, None, valid, key, iters=1, warmup=1)
    time_fn(infer_b, variables, xyz, None, valid, key, iters=1, warmup=1)
    a_ts, b_ts = [], []
    for _ in range(ROUNDS):
        a_ts.append(
            time_fn(infer_a, variables, xyz, None, valid, key,
                    iters=ITERS, warmup=0))
        b_ts.append(
            time_fn(infer_b, variables, xyz, None, valid, key,
                    iters=ITERS, warmup=0))
    a, b = float(np.median(a_ts)), float(np.median(b_ts))
    print(json.dumps({
        "config": name,
        "exact_ms": round(a * 1e3, 3),
        f"{label_b}_ms": round(b * 1e3, 3),
        "speedup": round(a / b, 4),
        "exact_pps": round(n_pts / a, 1),
        f"{label_b}_pps": round(n_pts / b, 1),
    }), flush=True)


def main():
    from gspn_tpu.data import synthetic
    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
    )
    from gspn_tpu.models.presets import set_pipeline_fps_segments
    from __graft_entry__ import _flagship_pipeline_config

    # pin the baseline arm to exact FPS (the flagship preset defaults to
    # spatial seg8 since round 4 — this script A/Bs against exact)
    cfg = set_pipeline_fps_segments(_flagship_pipeline_config(), 1)
    infer_exact = jax.jit(make_inference_fn(cfg))
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
        variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), n)
        for segs in (4, 8, 16):
            seg_cfg = set_pipeline_fps_segments(cfg, segs)
            infer_seg = jax.jit(make_inference_fn(seg_cfg))
            ab(
                name, infer_exact, infer_seg, variables, xyz, validj, key,
                b * n, f"seg{segs}",
            )


if __name__ == "__main__":
    main()
