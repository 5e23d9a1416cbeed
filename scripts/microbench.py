"""Kernel-level microbenchmarks on the real chip: dispatch floor, FPS,
ball query (round-1 kernel vs fused chunked kernel), gathers. Run after
any kernel change; used to apportion the per-stage table in STATUS.md.

    python scripts/microbench.py [--iters 20]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--big", action="store_true", help="add N=65536 rows")
    args = ap.parse_args()

    from gspn_tpu import ops
    from gspn_tpu.ops.ball_group import query_ball_group_multi, query_ball_multi_v2
    from gspn_tpu.utils.timing import time_fn

    B, N, M, K = 8, 8192, 1024, 32
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-1, 1, (B, M, 3)).astype(np.float32))
    seeds = jnp.asarray(rng.uniform(-1, 1, (B, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, N, 64)).astype(np.float32))

    def bench(name, fn, *xs):
        f = jax.jit(fn)
        dt = time_fn(f, *xs, iters=args.iters, warmup=3)
        print(f"{name:<46s} {dt * 1e3:8.3f} ms")
        return dt

    # dispatch floor: trivial program, same harness
    bench("floor: x * 2 (8,128)", lambda x: x * 2.0, jnp.ones((8, 128)))
    bench("floor: sum (8,8192)", lambda x: jnp.sum(x), xyz[..., 0])

    # FPS
    bench(f"fps {64}/{N}", lambda x: ops.farthest_point_sample(64, x), xyz)
    bench(f"fps {M}/{N}", lambda x: ops.farthest_point_sample(M, x), xyz)

    # ball query: round-1 kernel vs fused chunked kernel (SA1 shape)
    bench(
        "ball r1-kernel (M=1024, K=32)",
        lambda a, b: ops.query_ball_point(0.1, K, a, b, impl="pallas"),
        xyz, q,
    )
    bench(
        "ball fused idx-only (M=1024, K=32)",
        lambda a, b: query_ball_multi_v2((0.1,), (K,), a, b, impl="pallas"),
        xyz, q,
    )
    bench(
        "ball fused +coords (M=1024, K=32)",
        lambda a, b: query_ball_group_multi((0.1,), (K,), a, b, impl="pallas"),
        xyz, q,
    )
    bench(
        "ball r1 + XLA gather (composed)",
        lambda a, b: ops.group_point(
            a, ops.query_ball_point(0.1, K, a, b, impl="pallas")[0]
        ) - b[:, :, None, :],
        xyz, q,
    )

    # GSPN context shape: 3 concentric scales at M=64
    bench(
        "gspn ctx r1 multi (64 seeds, 3 scales)",
        lambda a, b: ops.query_ball_point_multi(
            (0.25, 0.5, 1.0), (32, 64, 128), a, b, impl="pallas"
        ),
        xyz, seeds,
    )
    bench(
        "gspn ctx fused (64 seeds, 3 scales)",
        lambda a, b: query_ball_group_multi(
            (0.25, 0.5, 1.0), (32, 64, 128), a, b, impl="pallas"
        ),
        xyz, seeds,
    )

    # gathers
    idx, _ = jax.jit(
        lambda a, b: ops.query_ball_point(0.1, K, a, b, impl="pallas")
    )(xyz, q)
    bench("group_point xyz (1024x32 of 8192)", ops.group_point, xyz, idx)
    bench("group_point C=64 (1024x32 of 8192)", ops.group_point, feats, idx)

    # three_nn (FP4 shape: targets 8192, sources 1024)
    bench(
        "three_nn (N=8192 <- M=1024)",
        lambda a, b: ops.three_nn(a, b, impl="pallas"),
        xyz, q,
    )

    if args.big:
        NB = 65536
        xyzb = jnp.asarray(rng.uniform(-2, 2, (2, NB, 3)).astype(np.float32))
        qb = jnp.asarray(rng.uniform(-2, 2, (2, 1024, 3)).astype(np.float32))
        bench(
            "BIG fps 1024/65536 (B=2)",
            lambda x: ops.farthest_point_sample(1024, x), xyzb,
        )
        bench(
            "BIG ball fused +coords 65536 (B=2)",
            lambda a, b: query_ball_group_multi((0.1,), (K,), a, b, impl="pallas"),
            xyzb, qb,
        )


if __name__ == "__main__":
    main()
