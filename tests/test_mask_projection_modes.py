"""Mask projection modes: 1nn (reference rule) vs 3nn (IDW smoothing)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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

# ---------------------------------------------------------------------------
# Box-pruned projection (ops.nearest_sample_logit_boxed + pipeline wiring)
# ---------------------------------------------------------------------------


def _random_proj_case(rng, b=2, n=512, r=10, s=6, masked=True):
    xyz = rng.standard_normal((b, n, 3)).astype(np.float32)
    sampled = rng.standard_normal((b, r, s, 3)).astype(np.float32)
    logits = rng.standard_normal((b, r, s)).astype(np.float32)
    svalid = rng.random((b, r, s)) > 0.2 if masked else np.ones((b, r, s), bool)
    svalid[:, :, 0] = True  # every RoI keeps >= 1 valid sample
    pvalid = rng.random((b, n)) > 0.15 if masked else np.ones((b, n), bool)
    ctr = rng.standard_normal((b, r, 3)).astype(np.float32) * 0.5
    half = rng.random((b, r, 3)).astype(np.float32) * 0.8 + 0.1
    boxes = np.concatenate([ctr - half, ctr + half], -1).astype(np.float32)
    return (jnp.asarray(a) for a in (xyz, sampled, logits, svalid, pvalid, boxes))


@pytest.mark.parametrize("masked", [False, True])
def test_boxed_projection_exact_inside_boxes(rng, masked):
    from gspn_tpu import ops

    xyz, sampled, logits, svalid, pvalid, boxes = _random_proj_case(
        rng, masked=masked
    )
    dense = ops.nearest_sample_logit(xyz, sampled, logits, svalid, impl="xla")
    boxed = ops.nearest_sample_logit_boxed(
        xyz, sampled, logits, boxes, svalid, pvalid,
        impl="pallas", interpret=True, roi_block=8, tile_n=128,
    )
    inside = np.all(
        (np.asarray(xyz)[:, None] >= np.asarray(boxes)[:, :, None, 0:3])
        & (np.asarray(xyz)[:, None] <= np.asarray(boxes)[:, :, None, 3:6]),
        -1,
    ) & np.asarray(pvalid)[:, None, :]
    assert inside.any()  # the contract region is non-trivial
    np.testing.assert_array_equal(
        np.asarray(boxed)[inside], np.asarray(dense)[inside]
    )


def test_boxed_projection_prunes_disjoint_tiles(rng):
    """On a spatially sorted scene, tiles whose AABB misses every box in
    the RoI block must come back as the _NEG fill (proof pruning fires)."""
    from gspn_tpu import ops

    b, n, r, s = 1, 512, 8, 4
    x = np.sort(rng.standard_normal((b, n)).astype(np.float32) * 4.0, axis=1)
    xyz = np.stack([x, np.zeros_like(x), np.zeros_like(x)], -1)
    lo, hi = float(x[0, 0]), float(x[0, -1])
    # all boxes huddle at the low-x end: the high-x tiles are irrelevant
    boxes = np.tile(
        np.asarray([lo, -1, -1, lo + 0.05 * (hi - lo), 1, 1], np.float32),
        (b, r, 1),
    )
    sampled = rng.standard_normal((b, r, s, 3)).astype(np.float32)
    logits = rng.standard_normal((b, r, s)).astype(np.float32)
    boxed = np.asarray(
        ops.nearest_sample_logit_boxed(
            jnp.asarray(xyz), jnp.asarray(sampled), jnp.asarray(logits),
            jnp.asarray(boxes),
            impl="pallas", interpret=True, roi_block=8, tile_n=128,
        )
    )
    assert np.all(boxed[:, :, -128:] == -1e10)  # top tile pruned
    dense = np.asarray(
        ops.nearest_sample_logit(
            jnp.asarray(xyz), jnp.asarray(sampled), jnp.asarray(logits),
            impl="xla",
        )
    )
    np.testing.assert_array_equal(boxed[:, :, :26], dense[:, :, :26])


def _spatial_tiny(num_seeds=16, segments=2):
    return dataclasses.replace(
        TINY,
        num_seeds=num_seeds,
        gspn=dataclasses.replace(
            TINY.gspn, fps_segments=segments, fps_segment_mode="spatial"
        ),
        rpointnet=dataclasses.replace(
            TINY.rpointnet, fps_segments=segments, fps_segment_mode="spatial"
        ),
    )


def test_pipeline_pruned_projection_masks_bit_identical(rng):
    """prune="auto" (sorted-view boxed projection) vs "off" (dense raw):
    every output field bit-equal — pruning is mask-exact by contract."""
    # untrained logits rarely clear 0.5 — lower the threshold so the
    # bit-equality claim covers a non-empty mask set
    cfg_on = dataclasses.replace(
        _spatial_tiny(), mask_thresh=0.05, mask_project_prune="auto"
    )
    cfg_off = dataclasses.replace(cfg_on, mask_project_prune="off")
    b, n = 2, 256
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, b, n_points=n, max_instances=3, extent=2.0
        ).items()
    }
    valid = batch["valid"].at[1, -40:].set(False)
    variables = init_pipeline_variables(cfg_on, jax.random.PRNGKey(0), n)
    p_on = jax.jit(make_inference_fn(cfg_on))(
        variables, batch["xyz"], None, valid, jax.random.PRNGKey(1)
    )
    p_off = jax.jit(make_inference_fn(cfg_off))(
        variables, batch["xyz"], None, valid, jax.random.PRNGKey(1)
    )
    assert np.asarray(p_on.masks).any()  # non-degenerate case
    for field in ("masks", "scores", "classes", "boxes", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(p_on, field)), np.asarray(getattr(p_off, field))
        )


def test_shared_fps_view_path_bit_equals_spatial_op(rng):
    """The hoisted-sort shared pass (spatial_sorted_view + contiguous)
    must reproduce farthest_point_sample(segment_mode="spatial") exactly
    — same composition as the op's own spatial branch."""
    from gspn_tpu import ops
    from gspn_tpu.models.pipeline import shared_fps_indices_view

    cfg = _spatial_tiny()
    b, n = 2, 256
    xyz = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    valid = jnp.asarray(rng.random((b, n)) > 0.1)
    seed_idx, sa1_idx, view = shared_fps_indices_view(cfg, xyz, valid)
    assert view is not None
    sa1_n = cfg.rpointnet.sa_layers[0].npoint
    segs = ops.shared_eligible_fps_segments(2, (cfg.num_seeds, sa1_n), n)
    direct = ops.farthest_point_sample(
        max(cfg.num_seeds, sa1_n), xyz, valid, impl="xla",
        segments=segs, segment_mode="spatial",
    )
    np.testing.assert_array_equal(
        np.asarray(seed_idx), np.asarray(direct[:, : cfg.num_seeds])
    )
    np.testing.assert_array_equal(
        np.asarray(sa1_idx), np.asarray(direct[:, :sa1_n])
    )
