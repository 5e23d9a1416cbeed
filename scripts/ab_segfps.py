"""Interleaved perf A/B over the segmented-FPS x data-layout matrix.

The AP side of VERDICT-r3 #1 runs through run_eval (STATUS "Segmented-
FPS AP A/B"); this script supplies the matching PERF cells so the
default-config decision (exact seg1 on raw vs seg4/seg8, raw vs Morton)
is made from one table. All arms are timed batch-by-batch interleaved in
the same window (STATUS "Measurement hygiene" — the tunnel drifts up to
~40% across sessions, so only same-window ratios are trustworthy).

Arms: fps_segments in {1, 4, 8} x {raw, morton} layouts, at the flagship
B=8xN=8192 shape and the whole-scene B=1xN=65536 (10% masked) shape.
Morton arms run the SAME device program on host-sorted data (layout is
the data pipeline's choice; ab_morton.py pins the set-equality
contract).

    python scripts/ab_segfps.py
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
SEGS = (1, 4, 8)


def main():
    from gspn_tpu import ops
    from gspn_tpu.data import synthetic
    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
    )
    from gspn_tpu.models.presets import set_pipeline_fps_segments
    from gspn_tpu.utils.timing import time_fn
    from __graft_entry__ import _flagship_pipeline_config

    # every arm pinned explicitly — the flagship preset defaults to
    # spatial seg8 since round 4, so "base" is NOT the exact arm
    base = _flagship_pipeline_config()
    infers = {
        s: jax.jit(make_inference_fn(
            set_pipeline_fps_segments(base, s, "contiguous")))
        for s in SEGS
    }
    # round-4 third option: Morton sort INSIDE the FPS op (raw layout for
    # grouping, spatially tiled segments for the chains) — see ops/fps.py
    infers_spatial = {
        s: jax.jit(make_inference_fn(
            set_pipeline_fps_segments(base, s, "spatial")))
        for s in SEGS
        if s != 1
    }
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
        variables = init_pipeline_variables(base, jax.random.PRNGKey(0), n)

        arms = []  # (tag, infer, xyz, valid)
        for s in SEGS:
            arms.append((f"seg{s}_raw", infers[s], xyz, validj))
            arms.append((f"seg{s}_morton", infers[s], sxyz, svalid))
            if s != 1:
                arms.append(
                    (f"seg{s}_spatial", infers_spatial[s], xyz, validj)
                )

        for _, f, x, v in arms:  # compile everything before interleaving
            time_fn(f, variables, x, None, v, key, iters=1, warmup=1)
        ts = {tag: [] for tag, *_ in arms}
        for _ in range(ROUNDS):
            for tag, f, x, v in arms:
                ts[tag].append(
                    time_fn(f, variables, x, None, v, key,
                            iters=ITERS, warmup=0))
        med = {tag: float(np.median(v)) for tag, v in ts.items()}
        ref = med["seg1_raw"]
        print(json.dumps({
            "config": name,
            **{f"{tag}_ms": round(t * 1e3, 3) for tag, t in med.items()},
            **{f"{tag}_speedup": round(ref / t, 4)
               for tag, t in med.items() if tag != "seg1_raw"},
            "seg1_raw_pps": round(b * n / ref, 1),
        }))


if __name__ == "__main__":
    main()
