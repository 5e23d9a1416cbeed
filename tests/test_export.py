"""Serving-artifact tests: jax.export round trip of the fused pipeline.

The exported artifact must (a) serialize/deserialize byte-stably through
the single-file zip format, (b) produce BIT-IDENTICAL predictions to the
live ``make_inference_fn`` path it was exported from, and (c) be
self-describing (manifest carries shapes/platforms/config). Runs on the
CPU backend; on-chip export is exercised by scripts/export_serving.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gspn_tpu.data import synthetic
from gspn_tpu.models.pipeline import init_pipeline_variables, make_inference_fn
from gspn_tpu.serve import export_inference, load_artifact, save_artifact
from tests.test_pipeline_eval import TINY

B, N = 2, 192


def _batch(rng):
    return {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, B, n_points=N, max_instances=3, extent=2.0
        ).items()
    }


def test_export_roundtrip_bit_identical(rng, tmp_path):
    batch = _batch(rng)
    variables = init_pipeline_variables(TINY, jax.random.PRNGKey(0), N)
    key = jax.random.PRNGKey(1)

    live = jax.jit(make_inference_fn(TINY))(
        variables, batch["xyz"], None, batch["valid"], key
    )

    exported = export_inference(TINY, variables, N, batch_size=B)
    path = save_artifact(tmp_path / "tiny.gspnx", exported, TINY)
    loaded, manifest = load_artifact(path)

    assert manifest["format_version"] == 1
    assert manifest["pipeline_config"]["num_seeds"] == TINY.num_seeds
    assert loaded.platforms == exported.platforms

    preds = loaded.call(variables, batch["xyz"], batch["valid"], key)
    for name in ("masks", "scores", "classes", "boxes", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(preds, name)),
            np.asarray(getattr(live, name)),
            err_msg=name,
        )


def test_export_spatial_segfps_roundtrip(rng, tmp_path):
    """The flagship preset's spatial segmented FPS (in-op lax.sort) must
    survive jax.export serialization bit-identically — the AOT artifact
    bakes the sort + chains + permutation mapping."""
    import dataclasses

    from gspn_tpu.models.presets import set_pipeline_fps_segments

    cfg = set_pipeline_fps_segments(
        dataclasses.replace(TINY, num_seeds=16), 2, "spatial"
    )
    batch = _batch(rng)
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), N)
    key = jax.random.PRNGKey(1)
    live = jax.jit(make_inference_fn(cfg))(
        variables, batch["xyz"], None, batch["valid"], key
    )
    exported = export_inference(cfg, variables, N, batch_size=B)
    path = save_artifact(tmp_path / "sp.gspnx", exported, cfg)
    loaded, manifest = load_artifact(path)
    saved_rpn = manifest["pipeline_config"]["rpointnet"]
    assert saved_rpn["fps_segment_mode"] == "spatial"
    assert saved_rpn["fps_segments"] == 2
    preds = loaded.call(variables, batch["xyz"], batch["valid"], key)
    for name in ("masks", "scores", "classes", "boxes", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(preds, name)),
            np.asarray(getattr(live, name)),
            err_msg=name,
        )


def test_export_rejects_wrong_shape(rng, tmp_path):
    variables = init_pipeline_variables(TINY, jax.random.PRNGKey(0), N)
    exported = export_inference(TINY, variables, N, batch_size=B)
    path = save_artifact(tmp_path / "tiny.gspnx", exported, TINY)
    loaded, _ = load_artifact(path)
    bad_xyz = jnp.zeros((B, N + 8, 3), jnp.float32)
    with pytest.raises(Exception):
        loaded.call(
            variables, bad_xyz, jnp.ones((B, N + 8), bool), jax.random.PRNGKey(0)
        )


def test_export_feature_dim_signature(rng, tmp_path):
    fdim = 3
    cfg = dataclasses.replace(
        TINY,
        gspn=dataclasses.replace(TINY.gspn, feature_dim=fdim),
        rpointnet=dataclasses.replace(TINY.rpointnet, feature_dim=fdim),
    )
    batch = _batch(rng)
    feats = jnp.asarray(
        np.random.default_rng(7).standard_normal((B, N, fdim)).astype(np.float32)
    )
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), N, feature_dim=fdim)
    key = jax.random.PRNGKey(1)
    live = jax.jit(make_inference_fn(cfg))(
        variables, batch["xyz"], feats, batch["valid"], key
    )
    exported = export_inference(cfg, variables, N, batch_size=B, feature_dim=fdim)
    path = save_artifact(tmp_path / "f.gspnx", exported, cfg)
    loaded, manifest = load_artifact(path)
    preds = loaded.call(variables, batch["xyz"], feats, batch["valid"], key)
    np.testing.assert_array_equal(np.asarray(preds.masks), np.asarray(live.masks))


def test_export_platform_check_and_dual_platform(rng):
    """A 'tpu'-only artifact cross-exported from a CPU host refuses to
    run on cpu (the platform check README advertises); a ('cpu','tpu')
    dual artifact runs on cpu."""
    variables = init_pipeline_variables(TINY, jax.random.PRNGKey(0), N)
    xyz = jnp.zeros((1, N, 3), jnp.float32)
    valid = jnp.ones((1, N), bool)
    key = jax.random.PRNGKey(0)

    e_tpu = export_inference(TINY, variables, N, batch_size=1,
                             platforms=("tpu",))
    assert e_tpu.platforms == ("tpu",)
    with pytest.raises(ValueError, match="exported for platforms"):
        e_tpu.call(variables, xyz, valid, key)

    e_both = export_inference(TINY, variables, N, batch_size=1,
                              platforms=("cpu", "tpu"))
    out = e_both.call(variables, xyz, valid, key)
    assert out.masks.shape == (1, TINY.num_seeds, N)


def test_export_rejects_pallas_for_cpu():
    cfg = dataclasses.replace(
        TINY, gspn=dataclasses.replace(TINY.gspn, ops_impl="pallas")
    )
    with pytest.raises(ValueError, match="pallas"):
        export_inference(
            cfg,
            init_pipeline_variables(TINY, jax.random.PRNGKey(0), N),
            N,
            platforms=("cpu",),
        )


def test_load_rejects_non_artifact(tmp_path):
    import io
    import zipfile

    p = tmp_path / "bogus.gspnx"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("manifest.json", '{"format": "something-else"}')
        z.writestr("module.bin", b"")
    p.write_bytes(buf.getvalue())
    with pytest.raises(ValueError, match="not a gspn_tpu.serving artifact"):
        load_artifact(p)
