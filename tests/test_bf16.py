"""bf16 compute path (presets/bench dtype knob, VERDICT round-1 item #2):
the MXU-native precision must run the full pipeline finite and close to
f32. Params stay f32 (param_dtype), activations/matmuls run bf16; point
ops (indices, exact comparisons) are always f32, so index-valued outputs
must be IDENTICAL across dtypes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gspn_tpu.data import synthetic
from gspn_tpu.models.pipeline import init_pipeline_variables, make_inference_fn
from tests.test_pipeline_eval import TINY


def _bf16_cfg():
    return dataclasses.replace(
        TINY,
        gspn=dataclasses.replace(TINY.gspn, dtype=jnp.bfloat16),
        rpointnet=dataclasses.replace(TINY.rpointnet, dtype=jnp.bfloat16),
    )


def test_bf16_pipeline_finite_and_close_to_f32(rng):
    b, n = 2, 128
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, b, n_points=n, max_instances=3, extent=2.0
        ).items()
    }
    key = jax.random.PRNGKey(0)
    zkey = jax.random.PRNGKey(1)

    # identical f32 params for both runs (param_dtype is f32 in all layers)
    vars_f32 = init_pipeline_variables(TINY, key, n)
    preds32 = make_inference_fn(TINY)(
        vars_f32, batch["xyz"], None, batch["valid"], zkey
    )
    cfg16 = _bf16_cfg()
    vars16 = init_pipeline_variables(cfg16, key, n)
    jax.tree.map(
        lambda a, b_: np.testing.assert_array_equal(np.asarray(a), np.asarray(b_)),
        vars_f32, vars16,
    )  # same init: dtype is compute-only
    preds16 = make_inference_fn(cfg16)(
        vars16, batch["xyz"], None, batch["valid"], zkey
    )

    for leaf in jax.tree_util.tree_leaves(preds16):
        assert np.all(np.isfinite(np.asarray(leaf, dtype=np.float32)))
    # boxes (decoded shapes + deltas) within bf16 tolerance of f32
    np.testing.assert_allclose(
        np.asarray(preds16.boxes), np.asarray(preds32.boxes),
        rtol=0.1, atol=0.1,
    )
    # scores in [0,1] and correlated with f32 (no wild divergence)
    s16 = np.asarray(preds16.scores)
    s32 = np.asarray(preds32.scores)
    assert np.all(s16 >= 0) and np.all(s16 <= 1)
    assert np.max(np.abs(s16 - s32)) < 0.25


def test_bf16_training_step_finite(rng):
    import optax

    from gspn_tpu.models.gspn import GSPN
    from gspn_tpu.train.steps import TrainState, make_gspn_loss_fn, make_train_step

    cfg = dataclasses.replace(_bf16_cfg().gspn)
    model = GSPN(cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, 2, n_points=128, max_instances=3, extent=2.0
        ).items()
    }
    from gspn_tpu import ops
    from gspn_tpu.data.instances import gather_seed_instances

    key = jax.random.PRNGKey(0)
    seed_idx = ops.farthest_point_sample(8, batch["xyz"], batch["valid"])
    gp, gv, _, _ = gather_seed_instances(batch["xyz"], batch["inst_label"], seed_idx, 16)
    variables = model.init(
        key, batch["xyz"], seed_idx, valid=batch["valid"], gt_points=gp,
        gt_valid=gv, z_rng=key, train=False,
    )
    # params created in f32 even under bf16 compute
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    state = TrainState.create(variables, optax.adam(1e-3))
    step = make_train_step(make_gspn_loss_fn(model, 8, 16), optax.adam(1e-3))
    for i in range(3):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
