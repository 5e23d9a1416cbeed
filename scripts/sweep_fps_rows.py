"""Interleaved A/B: FPS kernel rows-per-program cap for segmented FPS.

Segmented FPS at flagship shapes packs B*S = 64 chain rows of Npad=1024
lanes; with the historical 32-row cap that is TWO sequential grid
programs (2 x 127 dependent iterations). If the per-iteration chain
latency is roughly width-independent across sublane rows (as it is
across lanes — STATUS.md sweep findings), one 64-row program should
halve the sequential cost. This sweep measures the standalone segmented
FPS (and, as a guard, the exact kernel at its usual shapes, which must
not regress).

    python scripts/sweep_fps_rows.py
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np
import jax.numpy as jnp

ROUNDS, ITERS = 6, 16


def main():
    from gspn_tpu import ops
    from gspn_tpu.ops import fps as fps_mod
    from gspn_tpu.utils.timing import time_fn

    rng = np.random.default_rng(0)

    cases = [
        # name, b, n, npoint, segments
        ("flagship seg8 (64 rows x 1024)", 8, 8192, 1024, 8),
        ("flagship seg16 (128 rows x 512)", 8, 8192, 1024, 16),
        ("whole-scene seg8 (8 rows x 8192)", 1, 65536, 1024, 8),
        ("exact flagship (8 rows x 8192)", 8, 8192, 1024, 1),
    ]
    for name, b, n, npoint, segs in cases:
        xyz = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))

        def make_f(npoint=npoint, segs=segs):
            def f(x):
                return ops.farthest_point_sample(
                    npoint, x, impl="pallas", segments=segs
                )

            return jax.jit(f)

        # the cap is read at TRACE time: set it, then trace immediately
        fps_mod._MAX_ROWS_NARROW = 32
        f32 = make_f()
        time_fn(f32, xyz, iters=1, warmup=1)
        fps_mod._MAX_ROWS_NARROW = 64
        f64 = make_f()
        time_fn(f64, xyz, iters=1, warmup=1)
        a_ts, b_ts = [], []
        for _ in range(ROUNDS):
            a_ts.append(time_fn(f32, xyz, iters=ITERS, warmup=0))
            b_ts.append(time_fn(f64, xyz, iters=ITERS, warmup=0))
        a, bt = float(np.median(a_ts)), float(np.median(b_ts))
        print(json.dumps({
            "case": name,
            "cap32_ms": round(a * 1e3, 3),
            "cap64_ms": round(bt * 1e3, 3),
            "speedup": round(a / bt, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
