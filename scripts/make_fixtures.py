"""(Re)generate frozen parity fixtures for the public entry points
(VERDICT round-1 item #4; SURVEY.md §4 item 5 "parity fixtures").

Each fixture freezes (params, inputs, outputs) for one entry point so
that (a) semantic drift across build rounds fails tests/test_fixtures.py
immediately, and (b) if a real reference mount or reference weights ever
appear, swapping reference outputs in makes parity a one-command check.

Run from the repo root ON CPU (fixtures are backend-pinned to the
hermetic test environment):

    JAX_PLATFORMS=cpu python scripts/make_fixtures.py
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# the point-sharded fixture needs a multi-device CPU mesh; pin the env
# BEFORE jax initializes (as tests/conftest.py does)
os.environ["JAX_PLATFORMS"] = "cpu"  # fixtures are CPU-pinned by design
#                                      (the global env sets axon)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

FIXTURE_DIR = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures"


def _flatten_tree(tree, prefix: str):
    from flax.traverse_util import flatten_dict

    return {
        f"{prefix}/{'/'.join(k)}": np.asarray(v)
        for k, v in flatten_dict(tree).items()
    }


def fixture_inputs():
    """Deterministic tiny scene batch shared by both fixtures."""
    import jax.numpy as jnp

    from gspn_tpu.data import synthetic

    rng = np.random.default_rng(20260816)
    batch = synthetic.scene_batch(rng, 2, n_points=128, max_instances=3, extent=2.0)
    return {k: jnp.asarray(v) for k, v in batch.items()}, batch


def make_proposal_fixture():
    """Entry point 1: GSPN proposal generation (seeds -> CVAE decode)."""
    import jax.numpy as jnp

    from gspn_tpu import ops
    from gspn_tpu.models.gspn import GSPN, proposal_boxes
    from gspn_tpu.train.train_gspn import TINY_GSPN

    jb, batch = fixture_inputs()
    model = GSPN(TINY_GSPN)
    seed_idx = ops.farthest_point_sample(8, jb["xyz"], jb["valid"], impl="xla")
    variables = model.init(
        jax.random.PRNGKey(0), jb["xyz"], seed_idx, valid=jb["valid"],
        z_rng=jax.random.PRNGKey(1), train=False,
    )
    out = model.apply(
        variables, jb["xyz"], seed_idx, valid=jb["valid"],
        z_rng=jax.random.PRNGKey(1), train=False,
    )
    boxes = proposal_boxes(out.generated, margin=0.1)
    payload = {
        "in/xyz": batch["xyz"],
        "in/valid": batch["valid"],
        "in/seed_idx": np.asarray(seed_idx),
        "out/center": np.asarray(out.center),
        "out/generated": np.asarray(out.generated),
        "out/objectness": np.asarray(out.objectness),
        "out/prior_mu": np.asarray(out.prior_mu),
        "out/boxes": np.asarray(boxes),
        **_flatten_tree(variables["params"], "params"),
        **_flatten_tree(variables.get("batch_stats", {}), "batch_stats"),
    }
    np.savez_compressed(FIXTURE_DIR / "proposal_generation.npz", **payload)
    print(f"proposal_generation.npz: {len(payload)} arrays")


def make_inference_fixture():
    """Entry point 2: full instance-seg inference (one fused program)."""
    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
    )
    from tests.test_pipeline_eval import TINY

    jb, batch = fixture_inputs()
    variables = init_pipeline_variables(TINY, jax.random.PRNGKey(0), 128)
    infer = make_inference_fn(TINY)
    preds = infer(variables, jb["xyz"], None, jb["valid"], jax.random.PRNGKey(1))
    payload = {
        "in/xyz": batch["xyz"],
        "in/valid": batch["valid"],
        "out/masks": np.asarray(preds.masks),
        "out/scores": np.asarray(preds.scores),
        "out/classes": np.asarray(preds.classes),
        "out/boxes": np.asarray(preds.boxes),
        "out/valid": np.asarray(preds.valid),
        **_flatten_tree(variables["gspn"]["params"], "gspn/params"),
        **_flatten_tree(variables["gspn"].get("batch_stats", {}), "gspn/batch_stats"),
        **_flatten_tree(variables["rpointnet"]["params"], "rpn/params"),
        **_flatten_tree(
            variables["rpointnet"].get("batch_stats", {}), "rpn/batch_stats"
        ),
    }
    np.savez_compressed(FIXTURE_DIR / "instance_inference.npz", **payload)
    print(f"instance_inference.npz: {len(payload)} arrays")


def make_knob_fixtures():
    """Knobbed-path fixtures (VERDICT r3 #6): every semantics-bearing
    configuration the CLIs expose gets its own frozen outputs —
    fps_segments, bf16 compute, 2x width, and the point-sharded
    inference path (4-device CPU mesh) — so a perf refactor cannot
    silently drift a knobbed path. fps4/bf16/sharded reuse the base
    fixture's params (same shapes); width2 freezes its own."""
    import dataclasses

    import jax.numpy as jnp

    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
    )
    from gspn_tpu.models.presets import (
        scale_pipeline_widths,
        set_pipeline_dtype,
        set_pipeline_fps_segments,
    )
    from tests.test_pipeline_eval import TINY

    jb, batch = fixture_inputs()
    variables = init_pipeline_variables(TINY, jax.random.PRNGKey(0), 128)
    key = jax.random.PRNGKey(1)

    def outs_of(preds):
        return {
            "out/masks": np.asarray(preds.masks),
            "out/scores": np.asarray(preds.scores),
            "out/classes": np.asarray(preds.classes),
            "out/boxes": np.asarray(preds.boxes),
            "out/valid": np.asarray(preds.valid),
        }

    # segmented FPS through the full pipeline. Eligibility requires
    # npoint >= 8*segments for every shared consumer, so the fixture
    # config raises num_seeds to 16 (params are num_seeds-independent)
    # and uses S=2 (16 >= 16, sa1 32 % 2 == 0, N=128 % 2 == 0).
    cfg_s = set_pipeline_fps_segments(
        dataclasses.replace(TINY, num_seeds=16), 2
    )
    preds = make_inference_fn(cfg_s)(variables, jb["xyz"], None, jb["valid"], key)
    np.savez_compressed(FIXTURE_DIR / "inference_segfps.npz", **outs_of(preds))
    print("inference_segfps.npz written")

    # spatial segmented FPS (Morton sort inside the op — the round-4
    # default for the flagship preset) through the full pipeline
    cfg_sp = set_pipeline_fps_segments(
        dataclasses.replace(TINY, num_seeds=16), 2, "spatial"
    )
    preds = make_inference_fn(cfg_sp)(
        variables, jb["xyz"], None, jb["valid"], key
    )
    np.savez_compressed(
        FIXTURE_DIR / "inference_segfps_spatial.npz", **outs_of(preds)
    )
    print("inference_segfps_spatial.npz written")

    # bf16 compute dtype, f32 params
    cfgb = set_pipeline_dtype(TINY, jnp.bfloat16)
    preds = make_inference_fn(cfgb)(variables, jb["xyz"], None, jb["valid"], key)
    np.savez_compressed(FIXTURE_DIR / "inference_bf16.npz", **outs_of(preds))
    print("inference_bf16.npz written")

    # point-sharded inference on a 4-device mesh (num_seeds=12 % 4 == 0)
    from gspn_tpu.parallel.mesh import make_mesh
    from gspn_tpu.parallel.scene import make_point_sharded_inference

    mesh = make_mesh(4, axis="space")
    z_eps = jax.random.normal(
        jax.random.PRNGKey(7), (2, TINY.num_seeds, TINY.gspn.latent_dim),
        jnp.float32,
    )
    sinfer = make_point_sharded_inference(TINY, mesh, axis="space")
    preds = sinfer(variables, jb["xyz"], jb["valid"], z_eps)
    payload = outs_of(preds)
    payload["in/z_eps"] = np.asarray(z_eps)
    np.savez_compressed(FIXTURE_DIR / "inference_sharded.npz", **payload)
    print("inference_sharded.npz written")

    # 2x widths: own params (shapes differ from base)
    cfg2 = scale_pipeline_widths(TINY, 2)
    v2 = init_pipeline_variables(cfg2, jax.random.PRNGKey(0), 128)
    preds = make_inference_fn(cfg2)(v2, jb["xyz"], None, jb["valid"], key)
    payload = outs_of(preds)
    payload.update(_flatten_tree(v2["gspn"]["params"], "gspn/params"))
    payload.update(
        _flatten_tree(v2["gspn"].get("batch_stats", {}), "gspn/batch_stats")
    )
    payload.update(_flatten_tree(v2["rpointnet"]["params"], "rpn/params"))
    payload.update(
        _flatten_tree(
            v2["rpointnet"].get("batch_stats", {}), "rpn/batch_stats"
        )
    )
    np.savez_compressed(FIXTURE_DIR / "inference_width2.npz", **payload)
    print("inference_width2.npz written")


if __name__ == "__main__":
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    make_proposal_fixture()
    make_inference_fixture()
    make_knob_fixtures()
