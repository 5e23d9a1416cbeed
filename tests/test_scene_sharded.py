"""Fully point-sharded whole-scene inference (parallel/scene.py) vs the
single-device pipeline: classes/validity/masks must match exactly on the
test scenes (mask bits ride the float-tolerance feature map — see the
module docstring), scores to float tolerance."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gspn_tpu.data import synthetic
from gspn_tpu.models.pipeline import init_pipeline_variables
from gspn_tpu.parallel.mesh import make_mesh
from gspn_tpu.parallel.scene import make_point_sharded_inference
from tests.test_pipeline_eval import TINY


def _single_device_fn(cfg, z_eps):
    from gspn_tpu import ops
    from gspn_tpu.models.gspn import GSPN, proposal_boxes
    from gspn_tpu.models.pipeline import project_roi_masks, shared_fps_indices
    from gspn_tpu.models.rpointnet import RPointNet, apply_box_deltas

    def single(variables, xyz, valid, features=None):
        seed_idx, sa1_idx = shared_fps_indices(cfg, xyz, valid)
        gout = GSPN(cfg.gspn).apply(
            variables["gspn"], xyz, seed_idx, features=features, valid=valid,
            z_eps=z_eps, train=False,
        )
        boxes = proposal_boxes(
            gout.generated, cfg.rpointnet.box_margin, cfg.box_percentile
        )
        obj = jax.nn.sigmoid(gout.objectness)
        keep = ops.nms_3d_batched(boxes, obj, cfg.rpointnet.nms_iou)
        out = RPointNet(cfg.rpointnet).apply(
            variables["rpointnet"], xyz, boxes, features=features,
            valid=valid, train=False, sa1_fps_idx=sa1_idx,
        )
        cls_prob = jax.nn.softmax(out.cls_logits, axis=-1)[..., 1:]
        cls = (jnp.argmax(cls_prob, axis=-1) + 1).astype(jnp.int32)
        score = obj * jnp.max(cls_prob, axis=-1)
        refined = apply_box_deltas(boxes, out.box_deltas)
        pvalid = (keep & out.roi_valid) & (score > cfg.score_thresh)
        masks = project_roi_masks(
            xyz, refined, out.roi_xyz, out.mask_logits, cfg.mask_thresh,
            valid, mode=cfg.mask_project,
        )
        return (
            masks & pvalid[..., None],
            jnp.where(pvalid, score, 0.0),
            cls,
            pvalid,
        )

    return single


def _compare(cfg, b, n, rng, feature_dim=0):
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, b, n_points=n, max_instances=3, extent=2.0
        ).items()
    }
    feats = None
    if feature_dim:
        feats = jnp.asarray(
            np.random.default_rng(3)
            .random((b, n, feature_dim))
            .astype(np.float32)
        )
    variables = init_pipeline_variables(
        cfg, jax.random.PRNGKey(0), n, feature_dim=feature_dim
    )
    z_eps = jax.random.normal(
        jax.random.PRNGKey(5), (b, cfg.num_seeds, cfg.gspn.latent_dim)
    )
    m1, s1, c1, v1 = jax.jit(_single_device_fn(cfg, z_eps))(
        variables, batch["xyz"], batch["valid"], feats
    )
    mesh = make_mesh(8, axis="space")
    infer = make_point_sharded_inference(cfg, mesh, axis="space")
    if feature_dim:
        preds = infer(variables, batch["xyz"], feats, batch["valid"], z_eps)
    else:
        preds = infer(variables, batch["xyz"], batch["valid"], z_eps)
    np.testing.assert_array_equal(np.asarray(preds.valid), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(preds.classes), np.asarray(c1))
    np.testing.assert_allclose(
        np.asarray(preds.scores), np.asarray(s1), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(preds.masks), np.asarray(m1))


@pytest.mark.parametrize("mask_project", ["1nn", "3nn"])
@pytest.mark.parametrize("roi_sample", ["inbox", "grid"])
def test_point_sharded_inference_matches(rng, mask_project, roi_sample):
    cfg = dataclasses.replace(
        TINY,
        num_seeds=16,
        mask_project=mask_project,
        rpointnet=dataclasses.replace(TINY.rpointnet, roi_sample=roi_sample),
    )
    _compare(cfg, b=2, n=192, rng=rng)


def test_point_sharded_hybrid_2d_matches_single(rng):
    """2x4 hybrid mesh (scenes over 'data', intra-scene work over
    'space'): outputs must equal the single-device pipeline exactly —
    the per-scene math never crosses the data axis, so hybrid == 1-D
    sharded == single-device, scene for scene."""
    from gspn_tpu.parallel.mesh import make_mesh_2d

    cfg = dataclasses.replace(TINY, num_seeds=16)
    b, n = 2, 192
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, b, n_points=n, max_instances=3, extent=2.0
        ).items()
    }
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), n)
    z_eps = jax.random.normal(
        jax.random.PRNGKey(5), (b, cfg.num_seeds, cfg.gspn.latent_dim)
    )
    m1, s1, c1, v1 = jax.jit(_single_device_fn(cfg, z_eps))(
        variables, batch["xyz"], batch["valid"], None
    )
    infer = make_point_sharded_inference(
        cfg, make_mesh_2d(2, 4), axis="space", data_axis="data"
    )
    preds = infer(variables, batch["xyz"], batch["valid"], z_eps)
    np.testing.assert_array_equal(np.asarray(preds.valid), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(preds.classes), np.asarray(c1))
    np.testing.assert_allclose(
        np.asarray(preds.scores), np.asarray(s1), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(preds.masks), np.asarray(m1))


def test_point_sharded_whole_scene(rng):
    """One larger masked scene: N and sa1 queries shard 8 ways while the
    seed/RoI stages shard the proposal axis — the full composition."""
    cfg = dataclasses.replace(TINY, num_seeds=16)
    _compare(cfg, b=1, n=2048, rng=rng)


def test_point_sharded_spatial_segfps_matches(rng):
    """The flagship preset's spatial segmented FPS (Morton sort inside
    the op, ops/fps.py) under the fully sharded pipeline: the in-op
    lax.sort runs on the replicated xyz inside shard_map and the sharded
    outputs must still equal single-device exactly."""
    from gspn_tpu.models.presets import set_pipeline_fps_segments

    cfg = set_pipeline_fps_segments(
        dataclasses.replace(TINY, num_seeds=16), 2, "spatial"
    )
    _compare(cfg, b=2, n=192, rng=rng)


def test_point_sharded_with_features(rng):
    """Feature-carrying configs (e.g. RGB) shard the same way: features
    are replicated inputs (small), the feature-conditioned backbone map
    still shards on points — and the result matches single-device
    exactly, like the coordinate-only cases."""
    fdim = 3
    cfg = dataclasses.replace(
        TINY,
        num_seeds=16,
        gspn=dataclasses.replace(TINY.gspn, feature_dim=fdim),
        rpointnet=dataclasses.replace(TINY.rpointnet, feature_dim=fdim),
    )
    _compare(cfg, b=2, n=192, rng=rng, feature_dim=fdim)


def test_point_sharded_rejects_indivisible():
    cfg = dataclasses.replace(TINY, num_seeds=12)
    mesh = make_mesh(8, axis="space")
    with pytest.raises(ValueError, match="not divisible"):
        make_point_sharded_inference(cfg, mesh)
