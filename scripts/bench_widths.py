"""bf16/MXU width study (VERDICT r2 item #8): fused inference and
stage-1 train-step throughput at 1x/2x/4x MLP widths, f32 vs bf16, to
locate the width where bf16's MXU advantage overtakes the gather/VPU
costs on this chip.

    python scripts/bench_widths.py [--iters 15]

One line per (width, dtype) combo; STATUS.md carries the table. The
synthetic-AP leg of the study is intentionally not run: the r2 ladder is
saturating (VERDICT weak #4 — schedule/width conclusions drawn on the
16-scene synthetic set do not transfer), so widths stay a throughput
decision until real data exists.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

B, N = 8, 8192


def scaled_pipeline(mult: int, dtype):
    from gspn_tpu.models.presets import scale_pipeline_widths, scannet_pipeline

    # exact FPS: keeps the width/dtype study comparable with the r3 table
    # (the preset defaults to spatial seg8 since round 4)
    return scale_pipeline_widths(
        scannet_pipeline(dtype=dtype, fps_segments=1), mult
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()

    import optax

    from gspn_tpu.data import synthetic
    from gspn_tpu.models.gspn import GSPN
    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
    )
    from gspn_tpu.train.steps import TrainState, make_gspn_loss_fn, make_train_step
    from gspn_tpu.utils.timing import time_fn

    rng = np.random.default_rng(0)
    batch = synthetic.scene_batch(rng, B, n_points=N, max_instances=8)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    tb = {k: jnp.asarray(v[:4, :4096] if v.ndim > 1 else v[:4])
          for k, v in batch.items()}
    key = jax.random.PRNGKey(1)
    print(f"backend={jax.default_backend()}", flush=True)

    for mult in (1, 2, 4):
        for dname, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            cfg = scaled_pipeline(mult, dtype)
            try:
                variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), N)
                infer = jax.jit(make_inference_fn(cfg))
                dt_inf = time_fn(
                    infer, variables, jb["xyz"], None, jb["valid"], key,
                    iters=args.iters,
                ) * 1e3

                gmodel = GSPN(cfg.gspn)
                gvars = init_pipeline_variables(
                    cfg, jax.random.PRNGKey(0), 4096
                )["gspn"]
                tx = optax.adam(1e-3)
                state = TrainState.create(gvars, tx)
                step = make_train_step(
                    make_gspn_loss_fn(gmodel, cfg.num_seeds, 256), tx
                )
                state, _ = step(state, tb, key)  # compile
                dt_tr = time_fn(
                    lambda s, b, k: step(s, b, k)[1], state, tb, key,
                    iters=args.iters,
                ) * 1e3
                print(
                    f"width x{mult} {dname}: inference {dt_inf:7.2f} ms "
                    f"({B * N / dt_inf * 1e3 / 1e6:5.2f} Mpts/s)  "
                    f"stage1-train {dt_tr:7.2f} ms/step",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 — record and continue
                print(f"width x{mult} {dname}: FAIL {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
