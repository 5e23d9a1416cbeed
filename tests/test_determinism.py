"""Reproducibility guarantees: same inputs + same keys -> identical
outputs; dropout path works when enabled."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gspn_tpu.data import synthetic
from gspn_tpu.models.pipeline import init_pipeline_variables, make_inference_fn
from tests.test_pipeline_eval import TINY


def test_inference_is_deterministic(rng):
    b, n = 2, 192
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, b, n_points=n, max_instances=3, extent=2.0
        ).items()
    }
    variables = init_pipeline_variables(TINY, jax.random.PRNGKey(0), n)
    infer = jax.jit(make_inference_fn(TINY))
    k = jax.random.PRNGKey(9)
    p1 = infer(variables, batch["xyz"], None, batch["valid"], k)
    p2 = infer(variables, batch["xyz"], None, batch["valid"], k)
    np.testing.assert_array_equal(np.asarray(p1.masks), np.asarray(p2.masks))
    np.testing.assert_array_equal(np.asarray(p1.scores), np.asarray(p2.scores))
    # different key -> different proposals (z ~ prior changes)
    p3 = infer(variables, batch["xyz"], None, batch["valid"], jax.random.PRNGKey(10))
    assert not np.array_equal(np.asarray(p1.boxes), np.asarray(p3.boxes))


def test_rpointnet_head_dropout(rng):
    from gspn_tpu.models import rpointnet as rp
    from gspn_tpu.train.steps import TrainState, make_rpointnet_loss_fn, make_train_step
    from tests.test_rpointnet import CFG, make_batch

    cfg = dataclasses.replace(CFG, head_dropout=0.5)
    batch = make_batch(rng, b=1, n=128)
    model = rp.RPointNet(cfg)
    boxes = jnp.tile(
        jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0], jnp.float32), (1, 4, 1)
    )
    variables = model.init(
        jax.random.PRNGKey(0), batch["xyz"], boxes, valid=batch["valid"],
        train=False,
    )
    tx = optax.adam(1e-3)
    state = TrainState.create(variables, tx)
    step = make_train_step(make_rpointnet_loss_fn(model, 4), tx)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
