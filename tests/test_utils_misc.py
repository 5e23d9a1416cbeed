"""Smaller subsystems: config serialization, debug helpers, random seed
sampling in the GSPN loss, profiling timer."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gspn_tpu.data import synthetic
from gspn_tpu.train.config_io import load_config, save_config
from gspn_tpu.utils.debug import checked
from gspn_tpu.utils.profiling import StepTimer


def test_config_io_roundtrip(tmp_path):
    from gspn_tpu.models.gspn import GSPNConfig
    from gspn_tpu.models.rpointnet import RPointNetConfig

    p = save_config(
        tmp_path / "config.json",
        gspn=GSPNConfig(),
        rpointnet=RPointNetConfig(),
        extra={"lr": 1e-3},
    )
    data = load_config(p)
    assert data["gspn"]["latent_dim"] == 128
    assert data["rpointnet"]["sa_layers"][0]["npoint"] == 1024
    assert data["extra"]["lr"] == 1e-3
    json.dumps(data)  # fully serializable


def test_checked_catches_nan():
    def f(x):
        return jnp.log(x)

    wrapped = checked(f)
    err, out = wrapped(jnp.asarray([-1.0]))
    try:
        err.throw()
        raised = False
    except Exception:
        raised = True
    assert raised


def test_gspn_random_seed_method(rng):
    from gspn_tpu.models.gspn import GSPN
    from gspn_tpu.train.steps import (
        TrainState,
        make_gspn_loss_fn,
        make_train_step,
    )
    from tests.test_parallel_train import TINY, init_state

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, 2, n_points=128, max_instances=3, extent=2.0
        ).items()
    }
    tx = optax.adam(1e-3)
    model, state = init_state(batch, tx)
    step = make_train_step(
        make_gspn_loss_fn(model, 8, 16, seed_method="random"), tx
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_step_timer():
    t = StepTimer(points_per_step=1000)
    for _ in range(3):
        t.start()
        x = jnp.ones((8, 8)) * 2
        t.stop(x)
    assert t.points_per_sec > 0
    assert t.mean_step_s > 0
