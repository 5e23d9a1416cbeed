"""Whole-scene (large-N) benchmark — SURVEY.md §5's long-context analog
(VERDICT round-1 item #8): fused instance-seg inference on a 65,536-point
masked scene, single chip, plus op-level large-N rows. The spatially
sharded variant of the same scene is validated separately on the virtual
CPU mesh (tests/test_spatial.py) — ICI timing needs real multi-chip.

    python scripts/bench_large.py
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

B, N = 1, 65536


def main():
    from gspn_tpu import ops
    from gspn_tpu.data import synthetic
    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
    )
    from gspn_tpu.ops.ball_group import query_ball_group_multi
    from gspn_tpu.utils.timing import time_fn
    from gspn_tpu.models.presets import set_pipeline_fps_segments
    from __graft_entry__ import _flagship_pipeline_config

    # exact-FPS base so rows stay comparable with the r2-r4 records; the
    # segmented variants are separate labelled rows below
    cfg = set_pipeline_fps_segments(_flagship_pipeline_config(), 1)
    rng = np.random.default_rng(0)
    batch = synthetic.scene_batch(
        rng, B, n_points=N, max_instances=24, extent=8.0
    )
    # mask ~10% to exercise the padded-scene path
    valid = np.asarray(batch["valid"]).copy()
    valid[:, -N // 10:] = False
    xyz = jnp.asarray(batch["xyz"])
    validj = jnp.asarray(valid)

    rows = {}

    def bench(name, fn, *xs, iters=10):
        dt = time_fn(jax.jit(fn), *xs, iters=iters, warmup=2)
        rows[name] = round(dt * 1e3, 3)
        print(f"{name:<44s} {dt * 1e3:9.3f} ms")
        return dt

    # op-level large-N rows
    bench(
        f"fps 1024/{N} masked",
        lambda x, v: ops.farthest_point_sample(1024, x, v), xyz, validj,
    )
    q = ops.gather_point(xyz, ops.farthest_point_sample(1024, xyz, validj))
    bench(
        f"ball fused +coords (M=1024, K=32, N={N})",
        lambda a, b: query_ball_group_multi((0.4,), (32,), a, b, validj),
        xyz, q,
    )
    # Morton-sorted variant: spatially local chunks + sorted queries make
    # the ball-group kernel's exact AABB pruning skip most of the 128
    # chunks per tile (the payoff regime for ops.morton at whole-scene N)
    perm = ops.spatial_order(xyz, validj)
    sxyz = ops.apply_order(perm, xyz)
    svalid = ops.apply_order(perm, validj)
    sq = ops.gather_point(
        sxyz, jnp.sort(ops.farthest_point_sample(1024, sxyz, svalid), axis=-1)
    )
    bench(
        f"ball fused +coords, Morton-sorted scene",
        lambda a, b: query_ball_group_multi((0.4,), (32,), a, b, svalid),
        sxyz, sq,
    )

    bench(
        f"three_nn tiled (N={N} <- M=1024)",
        lambda a, b: ops.three_nn(a, b), xyz, q,
    )
    bench(
        f"three_nn tiled (1024 <- M={N} sources)",
        lambda a, b: ops.three_nn(a, b, validj), q, xyz,
    )

    # fused whole-scene inference
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), N)
    infer = make_inference_fn(cfg)
    dt = bench(
        "FUSED whole-scene inference",
        lambda v_, x, m, k: infer(v_, x, None, m, k),
        variables, xyz, validj, jax.random.PRNGKey(1), iters=5,
    )

    # segmented-FPS variant (ops/fps.py fps_segments=8): S parallel greedy
    # chains cut FPS's sequential latency ~8x — the dominant whole-scene
    # stage (measured 1.36x end-to-end in the interleaved A/B,
    # scripts/ab_fps_segments.py; documented seed-level parity delta)
    from gspn_tpu.models.presets import set_pipeline_fps_segments

    infer8 = make_inference_fn(set_pipeline_fps_segments(cfg, 8))
    dt8 = bench(
        "FUSED whole-scene inference (fps_segments=8)",
        lambda v_, x, m, k: infer8(v_, x, None, m, k),
        variables, xyz, validj, jax.random.PRNGKey(1), iters=5,
    )

    # spatial seg8 (Morton sort inside the op — the flagship preset
    # default since round 4: AP-better than exact AND fast at scale)
    infer8s = make_inference_fn(set_pipeline_fps_segments(cfg, 8, "spatial"))
    bench(
        "FUSED whole-scene inference (fps_segments=8 spatial)",
        lambda v_, x, m, k: infer8s(v_, x, None, m, k),
        variables, xyz, validj, jax.random.PRNGKey(1), iters=5,
    )

    # point-sharded backbone row (parallel/points.py): per-point work and
    # feature maps shard over every local device. On a single chip this
    # measures the sharded path's overhead at n_dev=1 (parity mode); the
    # scaling itself is validated on the virtual 8-CPU mesh
    # (tests/test_points_sharded.py) — ICI timing needs real multi-chip.
    from gspn_tpu.parallel.mesh import make_mesh
    from gspn_tpu.parallel.points import make_sharded_backbone

    ndev = len(jax.devices())
    mesh = make_mesh(ndev, axis="space")
    bb_vars = {
        "params": variables["rpointnet"]["params"]["backbone"],
        "batch_stats": variables["rpointnet"]["batch_stats"]["backbone"],
    }
    sharded_bb = make_sharded_backbone(cfg.rpointnet, mesh, axis="space")
    dt_s = time_fn(sharded_bb, bb_vars, xyz, validj, iters=5, warmup=2)
    rows[f"backbone point-sharded ({ndev} dev)"] = round(dt_s * 1e3, 3)
    print(f"{f'backbone point-sharded ({ndev} dev)':<44s} {dt_s * 1e3:9.3f} ms")
    print(json.dumps({
        "metric": "whole_scene_inference_points_per_sec_per_chip",
        "value": round(B * N / dt, 1),
        "unit": "points/sec",
        "n_points": N,
        "segfps8_value": round(B * N / dt8, 1),
        "rows_ms": rows,
    }))


if __name__ == "__main__":
    main()
