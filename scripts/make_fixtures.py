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

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

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


if __name__ == "__main__":
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    make_proposal_fixture()
    make_inference_fixture()
