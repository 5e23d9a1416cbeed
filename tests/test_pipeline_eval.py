"""End-to-end inference pipeline + AP evaluator tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gspn_tpu.data import synthetic
from gspn_tpu.eval import instance_eval as ie
from gspn_tpu.models import rpointnet as rp
from gspn_tpu.models.gspn import GSPNConfig
from gspn_tpu.models.pipeline import (
    PipelineConfig,
    init_pipeline_variables,
    make_inference_fn,
)

TINY = PipelineConfig(
    gspn=GSPNConfig(
        context_radii=(0.3, 0.6),
        context_nsample=(8, 16),
        encoder_mlp=(8, 16),
        center_mlp=(8, 16),
        center_fc=(16,),
        latent_dim=4,
        cond_dim=16,
        generator_fc=(32,),
        num_gen_points=16,
        objectness_fc=(8,),
        ops_impl="xla",
    ),
    rpointnet=rp.RPointNetConfig(
        sa_layers=(
            rp.SALayerSpec(32, 0.4, 8, (8, 16)),
            rp.SALayerSpec(8, 0.8, 8, (16, 16)),
        ),
        fp_mlps=((16,), (16, 16)),
        roi_samples=8,
        roi_mlp=(16,),
        cls_fc=(16,),
        box_fc=(16,),
        mask_mlp=(16,),
        num_classes=3,
        ops_impl="xla",
    ),
    num_seeds=12,
    score_thresh=0.0,
)


def test_pipeline_inference_shapes(rng):
    b, n = 2, 192
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, b, n_points=n, max_instances=3, extent=2.0
        ).items()
    }
    variables = init_pipeline_variables(TINY, jax.random.PRNGKey(0), n)
    infer = jax.jit(make_inference_fn(TINY))
    preds = infer(variables, batch["xyz"], None, batch["valid"], jax.random.PRNGKey(1))
    r = TINY.num_seeds
    assert preds.masks.shape == (b, r, n)
    assert preds.scores.shape == (b, r)
    assert preds.classes.shape == (b, r)
    assert preds.boxes.shape == (b, r, 6)
    assert np.all(np.asarray(preds.scores) >= 0)
    assert np.all((np.asarray(preds.classes) >= 1))
    # invalid slots have empty masks and zero scores
    pv = np.asarray(preds.valid)
    pm = np.asarray(preds.masks)
    assert not pm[~pv].any()

    # host-side conversion round trip
    scenes = ie.predictions_from_device(preds, batch["valid"])
    assert len(scenes) == b
    assert scenes[0].masks.shape[1] == int(np.asarray(batch["valid"])[0].sum())


def test_streamed_inference_matches_per_call(rng):
    """make_streamed_inference_fn scans T batches in one dispatch; every
    field must equal the corresponding per-call make_inference_fn output
    bit-for-bit (the scan only amortizes dispatch, never changes math)."""
    from gspn_tpu.models.pipeline import make_streamed_inference_fn

    b, n, t = 2, 192, 3
    batches = [
        {
            k: jnp.asarray(v)
            for k, v in synthetic.scene_batch(
                rng, b, n_points=n, max_instances=3, extent=2.0
            ).items()
        }
        for _ in range(t)
    ]
    variables = init_pipeline_variables(TINY, jax.random.PRNGKey(0), n)
    infer = jax.jit(make_inference_fn(TINY))
    streamed = jax.jit(make_streamed_inference_fn(TINY))
    rngs = jax.random.split(jax.random.PRNGKey(7), t)
    xyz_s = jnp.stack([bt["xyz"] for bt in batches])
    valid_s = jnp.stack([bt["valid"] for bt in batches])
    out_s = streamed(variables, xyz_s, valid_s, rngs)
    for i, bt in enumerate(batches):
        out_i = infer(variables, bt["xyz"], None, bt["valid"], rngs[i])
        for a, bb in zip(
            jax.tree_util.tree_leaves(out_i),
            [np.asarray(leaf)[i] for leaf in jax.tree_util.tree_leaves(out_s)],
            strict=True,
        ):
            np.testing.assert_array_equal(np.asarray(a), bb)


def test_ap_evaluator_perfect_predictions(rng):
    # GT masks as predictions with high scores -> AP = 1 everywhere
    sc = synthetic.scene(rng, n_points=256, max_instances=3, extent=2.0)
    gt = ie.gt_from_labels(sc.inst_label, sc.sem_label)
    masks = []
    classes = []
    for iid, cls in gt.inst_class.items():
        masks.append(sc.inst_label == iid)
        classes.append(cls)
    pred = ie.ScenePredictions(
        masks=np.stack(masks),
        scores=np.linspace(0.9, 0.99, len(masks)),
        classes=np.asarray(classes),
    )
    res = ie.evaluate_instances([pred], [gt], class_ids=[1, 2, 3])
    assert res["ap_50"] == 1.0
    assert res["ap_25"] == 1.0
    assert res["ap"] == 1.0


def test_ap_evaluator_mixed(rng):
    sc = synthetic.scene(rng, n_points=256, max_instances=4, extent=2.0)
    gt = ie.gt_from_labels(sc.inst_label, sc.sem_label)
    ids = sorted(gt.inst_class)
    # predict only the first instance correctly + one garbage blob
    good = sc.inst_label == ids[0]
    garbage = np.zeros_like(good)
    garbage[:20] = True
    pred = ie.ScenePredictions(
        masks=np.stack([good, garbage]),
        scores=np.asarray([0.9, 0.8]),
        classes=np.asarray([gt.inst_class[ids[0]], gt.inst_class[ids[0]]]),
    )
    res = ie.evaluate_instances([pred], [gt], class_ids=sorted({*gt.inst_class.values()}))
    assert 0.0 < res["ap_50"] <= 1.0
    # garbage-only prediction scores 0
    pred0 = ie.ScenePredictions(
        masks=np.stack([garbage]), scores=np.asarray([0.9]),
        classes=np.asarray([gt.inst_class[ids[0]]]),
    )
    res0 = ie.evaluate_instances([pred0], [gt], class_ids=sorted({*gt.inst_class.values()}))
    assert res0["ap_50"] == 0.0
