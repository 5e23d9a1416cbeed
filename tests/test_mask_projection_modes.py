"""Mask projection modes: 1nn (reference rule) vs 3nn (IDW smoothing)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gspn_tpu.data import synthetic
from gspn_tpu.models.pipeline import (
    init_pipeline_variables,
    make_inference_fn,
    project_roi_masks,
)
from tests.test_pipeline_eval import TINY


def test_3nn_projection_matches_manual(rng):
    b, n, r, s = 1, 60, 2, 6
    xyz = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    roi_idx = rng.integers(0, n, (b, r, s)).astype(np.int32)
    roi_xyz = jnp.asarray(np.asarray(xyz)[0][roi_idx])  # (B,R,S,3) coords
    logits = jnp.asarray(rng.standard_normal((b, r, s)).astype(np.float32))
    boxes = jnp.tile(jnp.asarray([-9.0, -9, -9, 9, 9, 9]), (b, r, 1))  # all inside
    m = project_roi_masks(xyz, boxes, roi_xyz, logits, 0.5, mode="3nn", impl="xla")
    xn = np.asarray(xyz[0])
    for ri in range(r):
        sp = xn[roi_idx[0, ri]]
        for ni in range(0, n, 7):
            d = np.sum((xn[ni] - sp) ** 2, -1)
            top3 = np.argsort(d, kind="stable")[:3]
            w = 1.0 / np.maximum(d[top3], 1e-10)
            w /= w.sum()
            logit = float(np.sum(w * np.asarray(logits)[0, ri, top3]))
            want = 1.0 / (1.0 + np.exp(-logit)) > 0.5
            assert bool(m[0, ri, ni]) == want


def test_pipeline_runs_with_3nn_mode(rng):
    cfg = dataclasses.replace(TINY, mask_project="3nn")
    b, n = 1, 128
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, b, n_points=n, max_instances=3, extent=2.0
        ).items()
    }
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), n)
    infer = jax.jit(make_inference_fn(cfg))
    preds = infer(variables, batch["xyz"], None, batch["valid"], jax.random.PRNGKey(1))
    assert preds.masks.shape == (b, cfg.num_seeds, n)
    assert np.all(np.isfinite(np.asarray(preds.scores)))