"""Frozen parity fixtures for the public entry points (SURVEY.md §4 item
5): recomputing each entry point from the frozen params + inputs must
reproduce the frozen outputs. This guards against silent semantic drift
across build rounds; when a real reference mount or weight drop appears,
replacing the 'out/*' arrays with reference outputs turns these tests
into the reference-parity check.

Regenerate (only after an INTENTIONAL semantic change, with the change
documented in the commit):  JAX_PLATFORMS=cpu python scripts/make_fixtures.py
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE_DIR = pathlib.Path(__file__).resolve().parent / "fixtures"


def _unflatten(z, prefix: str):
    from flax.traverse_util import unflatten_dict

    flat = {
        tuple(k[len(prefix) + 1:].split("/")): jnp.asarray(z[k])
        for k in z.files
        if k.startswith(prefix + "/")
    }
    return unflatten_dict(flat)


def _load(name: str):
    path = FIXTURE_DIR / name
    if not path.exists():
        pytest.skip(f"fixture {name} missing — run scripts/make_fixtures.py")
    return np.load(path)


def test_proposal_generation_matches_fixture():
    from gspn_tpu.models.gspn import GSPN, proposal_boxes
    from gspn_tpu.train.train_gspn import TINY_GSPN

    z = _load("proposal_generation.npz")
    variables = {
        "params": _unflatten(z, "params"),
        "batch_stats": _unflatten(z, "batch_stats"),
    }
    out = GSPN(TINY_GSPN).apply(
        variables,
        jnp.asarray(z["in/xyz"]),
        jnp.asarray(z["in/seed_idx"]),
        valid=jnp.asarray(z["in/valid"]),
        z_rng=jax.random.PRNGKey(1),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out.center), z["out/center"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.generated), z["out/generated"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.objectness), z["out/objectness"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.prior_mu), z["out/prior_mu"], rtol=1e-4, atol=1e-5
    )
    boxes = proposal_boxes(out.generated, margin=0.1)
    np.testing.assert_allclose(
        np.asarray(boxes), z["out/boxes"], rtol=1e-4, atol=1e-5
    )


def test_instance_inference_matches_fixture():
    from gspn_tpu.models.pipeline import make_inference_fn
    from tests.test_pipeline_eval import TINY

    z = _load("instance_inference.npz")
    variables = {
        "gspn": {
            "params": _unflatten(z, "gspn/params"),
            "batch_stats": _unflatten(z, "gspn/batch_stats"),
        },
        "rpointnet": {
            "params": _unflatten(z, "rpn/params"),
            "batch_stats": _unflatten(z, "rpn/batch_stats"),
        },
    }
    preds = make_inference_fn(TINY)(
        variables,
        jnp.asarray(z["in/xyz"]),
        None,
        jnp.asarray(z["in/valid"]),
        jax.random.PRNGKey(1),
    )
    np.testing.assert_array_equal(np.asarray(preds.valid), z["out/valid"])
    np.testing.assert_array_equal(np.asarray(preds.classes), z["out/classes"])
    np.testing.assert_array_equal(np.asarray(preds.masks), z["out/masks"])
    np.testing.assert_allclose(
        np.asarray(preds.scores), z["out/scores"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(preds.boxes), z["out/boxes"], rtol=1e-4, atol=1e-5
    )


# ---------------------------------------------------------------------------
# Knobbed-path fixtures (VERDICT r3 #6): the semantics-bearing CLI knobs
# — fps_segments, bf16 compute, 2x width, point-sharded inference — each
# guard their own frozen outputs, so a perf refactor cannot silently
# drift a knobbed path without failing here.
# ---------------------------------------------------------------------------


def _base_pipeline_variables(z):
    return {
        "gspn": {
            "params": _unflatten(z, "gspn/params"),
            "batch_stats": _unflatten(z, "gspn/batch_stats"),
        },
        "rpointnet": {
            "params": _unflatten(z, "rpn/params"),
            "batch_stats": _unflatten(z, "rpn/batch_stats"),
        },
    }


def _assert_preds_match(preds, z, bf16=False):
    np.testing.assert_array_equal(np.asarray(preds.valid), z["out/valid"])
    np.testing.assert_array_equal(np.asarray(preds.classes), z["out/classes"])
    np.testing.assert_array_equal(np.asarray(preds.masks), z["out/masks"])
    # bf16 compute wobbles more across compilers/backends
    rtol, atol = (2e-2, 2e-2) if bf16 else (1e-4, 1e-5)
    np.testing.assert_allclose(
        np.asarray(preds.scores), z["out/scores"], rtol=rtol, atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(preds.boxes), z["out/boxes"], rtol=rtol, atol=atol
    )


@pytest.mark.parametrize("knob", ["segfps", "segfps_spatial", "bf16"])
def test_knobbed_inference_matches_fixture(knob):
    import dataclasses

    from gspn_tpu.models.pipeline import make_inference_fn
    from gspn_tpu.models.presets import (
        set_pipeline_dtype,
        set_pipeline_fps_segments,
    )
    from tests.test_pipeline_eval import TINY

    base = _load("instance_inference.npz")
    z = _load(f"inference_{knob}.npz")
    if knob == "segfps":
        cfg = set_pipeline_fps_segments(
            dataclasses.replace(TINY, num_seeds=16), 2
        )
    elif knob == "segfps_spatial":
        cfg = set_pipeline_fps_segments(
            dataclasses.replace(TINY, num_seeds=16), 2, "spatial"
        )
    else:
        cfg = set_pipeline_dtype(TINY, jnp.bfloat16)
    variables = _base_pipeline_variables(base)
    preds = make_inference_fn(cfg)(
        variables,
        jnp.asarray(base["in/xyz"]),
        None,
        jnp.asarray(base["in/valid"]),
        jax.random.PRNGKey(1),
    )
    _assert_preds_match(preds, z, bf16=knob == "bf16")
    if knob in ("segfps", "segfps_spatial"):
        # the approximation must actually engage: the same config with
        # exact FPS (segments=1) picks a different seed set
        exact = make_inference_fn(
            dataclasses.replace(TINY, num_seeds=16)
        )(
            variables,
            jnp.asarray(base["in/xyz"]),
            None,
            jnp.asarray(base["in/valid"]),
            jax.random.PRNGKey(1),
        )
        assert not np.array_equal(np.asarray(exact.boxes), z["out/boxes"])


def test_point_sharded_inference_matches_fixture():
    from gspn_tpu.parallel.mesh import make_mesh
    from gspn_tpu.parallel.scene import make_point_sharded_inference
    from tests.test_pipeline_eval import TINY

    base = _load("instance_inference.npz")
    z = _load("inference_sharded.npz")
    mesh = make_mesh(4, axis="space")
    preds = make_point_sharded_inference(TINY, mesh, axis="space")(
        _base_pipeline_variables(base),
        jnp.asarray(base["in/xyz"]),
        jnp.asarray(base["in/valid"]),
        jnp.asarray(z["in/z_eps"]),
    )
    _assert_preds_match(preds, z)


def test_width2_inference_matches_fixture():
    from gspn_tpu.models.pipeline import make_inference_fn
    from gspn_tpu.models.presets import scale_pipeline_widths
    from tests.test_pipeline_eval import TINY

    base = _load("instance_inference.npz")
    z = _load("inference_width2.npz")
    preds = make_inference_fn(scale_pipeline_widths(TINY, 2))(
        _base_pipeline_variables(z),
        jnp.asarray(base["in/xyz"]),
        None,
        jnp.asarray(base["in/valid"]),
        jax.random.PRNGKey(1),
    )
    _assert_preds_match(preds, z)
