"""On-chip knob sweep for the fused ball-group kernel: chunk width
(_NC), window width (_NW) and extraction unroll (_UNROLL), at the
pipeline's two hot shapes (backbone sa1 and GSPN context crops).
(Query-tile height _TM was swept separately and measured a loser at
every height above 128 — see STATUS.md sweep table; it is pinned.)

    python scripts/sweep_ballgroup.py [--iters 20]

Prints one line per combo as it completes (flushed — safe to tail from a
background run).
"""

from __future__ import annotations

import argparse
import itertools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from gspn_tpu.data import synthetic
    from gspn_tpu.ops import ball_group
    from gspn_tpu.utils.timing import time_fn

    rng = np.random.default_rng(0)
    batch = synthetic.scene_batch(rng, 8, n_points=8192, max_instances=8)
    xyz = jnp.asarray(batch["xyz"])
    valid = jnp.asarray(batch["valid"])

    shapes = {
        # (radii, nsamples, M): backbone sa1 and GSPN context crops
        "sa1": ((0.1,), (32,), 1024),
        "ctx": ((0.25, 0.5, 1.0), (32, 64, 128), 64),
    }
    queries = {
        name: jnp.asarray(batch["xyz"][:, :m])
        for name, (_, _, m) in shapes.items()
    }

    print(f"backend={jax.default_backend()}", flush=True)
    base = (ball_group._NC, ball_group._NW, ball_group._UNROLL)
    results = []
    for nc, nw, unroll in itertools.product(
        (2048, 4096, 8192), (512, 1024, 2048), (2, 4, 8)
    ):
        if nw > nc:
            continue
        ball_group._NC, ball_group._NW, ball_group._UNROLL = nc, nw, unroll
        row = {"nc": nc, "nw": nw, "unroll": unroll}
        for name, (radii, ks, m) in shapes.items():
            fn = jax.jit(
                lambda x, q, v, radii=radii, ks=ks: ball_group.query_ball_group_multi(
                    radii, ks, x, q, v, impl="pallas"
                )
            )
            try:
                # median of 4 blocks: the tunnel drifts between windows
                # (STATUS.md measurement hygiene) — a single mean ranks
                # knobs by when they ran, not how fast they are
                dt = time_fn(
                    fn, xyz, queries[name], valid,
                    iters=max(args.iters // 4, 2), batches=4, stat="median",
                )
                row[name] = dt * 1e3
            except Exception as e:  # noqa: BLE001 — record and continue
                row[name] = f"FAIL {type(e).__name__}"
        print(
            f"nc={nc:5d} nw={nw:4d} unroll={unroll:3d}  "
            + "  ".join(
                f"{k}={v:.3f}ms" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items()
                if k in shapes
            ),
            flush=True,
        )
        results.append(row)
    ball_group._NC, ball_group._NW, ball_group._UNROLL = base

    for name in shapes:
        ok = [r for r in results if isinstance(r[name], float)]
        if not ok:
            print(f"BEST {name}: every combo failed", flush=True)
            continue
        best = min(ok, key=lambda r: r[name])
        print(
            f"BEST {name}: nc={best['nc']} nw={best['nw']} "
            f"unroll={best['unroll']} -> {best[name]:.3f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
