"""Interleaved A/B: fused inference on raw vs Morton-sorted scenes.

STATUS.md round-4 lead: Morton-sorting scenes at DATA-PREP time is free
(``--morton`` in the trainers/eval, ``native.morton_order`` at load), and
the ball-group kernel's exact AABB chunk pruning + query-sort only pay on
spatially-coherent layouts. Round 2 measured sorted scenes *slower*
end-to-end, but that predates the round-3 kernel rework (NC=4096 chunks,
window-major extraction, _SORT_Q). This script re-measures the question
the only trustworthy way on the drifting tunnel: batch-by-batch
interleaved A/B (see STATUS.md "Measurement hygiene"), at the flagship
size and at whole-scene N=65536.

Throughput-only comparison: sorting changes the scene's index order, so
FPS seeds / first-K ball membership differ point-for-point (the layout is
the data pipeline's to choose — SURVEY.md §2.1 ball-query contract is
order-dependent by design); that sorted crops hold the same point SET is
pinned by tests/test_data.py::test_scannet_crops_morton.

    python scripts/ab_morton.py
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


def ab(name, infer, variables, xyz, valid, sxyz, svalid, key, n_pts):
    from gspn_tpu.utils.timing import time_fn

    # compile both before the interleave
    time_fn(infer, variables, xyz, None, valid, key, iters=1, warmup=1)
    time_fn(infer, variables, sxyz, None, svalid, key, iters=1, warmup=1)
    raw_ts, srt_ts = [], []
    for _ in range(ROUNDS):
        raw_ts.append(
            time_fn(infer, variables, xyz, None, valid, key,
                    iters=ITERS, warmup=0))
        srt_ts.append(
            time_fn(infer, variables, sxyz, None, svalid, key,
                    iters=ITERS, warmup=0))
    raw, srt = float(np.median(raw_ts)), float(np.median(srt_ts))
    print(json.dumps({
        "config": name,
        "raw_ms": round(raw * 1e3, 3),
        "morton_ms": round(srt * 1e3, 3),
        "speedup": round(raw / srt, 4),
        "raw_pps": round(n_pts / raw, 1),
        "morton_pps": round(n_pts / srt, 1),
    }))


def main():
    from gspn_tpu import ops
    from gspn_tpu.data import synthetic
    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
    )
    from gspn_tpu.models.presets import set_pipeline_fps_segments
    from __graft_entry__ import _flagship_pipeline_config

    # pin exact FPS: this script isolates the DATA-layout effect, and its
    # recorded r4 numbers predate the spatial-seg8 preset default
    cfg = set_pipeline_fps_segments(_flagship_pipeline_config(), 1)
    infer = jax.jit(make_inference_fn(cfg))
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
        perm = ops.spatial_order(xyz, validj)
        sxyz = ops.apply_order(perm, xyz)
        svalid = ops.apply_order(perm, validj)
        variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), n)
        ab(name, infer, variables, xyz, validj, sxyz, svalid, key, b * n)


if __name__ == "__main__":
    main()
