"""Point-sharded TRAINING vs the single-device steps (8-device virtual
CPU mesh): one train step of parallel/train_points.py must produce the
same loss, updated params and batch stats as train/steps.py — seeds,
points and RoIs shard; normalizers, BN statistics and gradients are
psum-ed back to the exact global reduction (tolerances as in
test_parallel_train.py: fp reassociation only)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gspn_tpu import ops
from gspn_tpu.data import synthetic
from gspn_tpu.data.instances import gather_seed_instances
from gspn_tpu.models.gspn import GSPN, GSPNConfig
from gspn_tpu.models.rpointnet import RPointNet
from gspn_tpu.parallel import make_mesh
from gspn_tpu.parallel.train_points import (
    make_point_sharded_gspn_train_step,
    make_point_sharded_rpointnet_train_step,
)
from gspn_tpu.train.steps import (
    TrainState,
    make_gspn_loss_fn,
    make_rpointnet_loss_fn,
    make_train_step,
)
from gspn_tpu.train.train_rpointnet import tiny_rpointnet

TINY_G = GSPNConfig(
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
)
S, G = 16, 16  # seeds divisible by the 8-device mesh


def _batch(rng, b=2, n=128):
    return {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, b, n_points=n, max_instances=3, extent=2.0
        ).items()
    }


def _assert_tree_close(t1, t2, rtol=3e-4, atol=5e-4):
    l1 = jax.tree_util.tree_leaves(t1)
    l2 = jax.tree_util.tree_leaves(t2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol
        )


def _gspn_state(batch, tx, cfg=TINY_G, num_seeds=S):
    key = jax.random.PRNGKey(0)
    model = GSPN(cfg)
    seed_idx = ops.farthest_point_sample(
        num_seeds, batch["xyz"], batch["valid"], impl="xla"
    )
    gp, gv, _, _ = gather_seed_instances(
        batch["xyz"], batch["inst_label"], seed_idx, G
    )
    variables = model.init(
        key, batch["xyz"], seed_idx, valid=batch["valid"], gt_points=gp,
        gt_valid=gv, z_rng=key, train=False,
    )
    return model, variables, TrainState.create(variables, tx)


def test_sharded_gspn_step_equals_single(rng):
    """Stage 1: the seed-sharded step == the single-device step (same
    batch, same rng -> same z noise via the replicated full-shape draw)."""
    assert jax.device_count() >= 8
    mesh = make_mesh(8, axis="space")
    batch = _batch(rng)
    # sgd(1.0): the param delta IS the gradient (see test_parallel_train)
    tx = optax.sgd(1.0)
    model, _, state = _gspn_state(batch, tx)
    key = jax.random.PRNGKey(3)

    single = make_train_step(make_gspn_loss_fn(model, S, G), tx)
    s1, m1 = single(state, batch, key)

    sharded = make_point_sharded_gspn_train_step(TINY_G, tx, mesh, S, G)
    s8, m8 = sharded(state, batch, key)

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    _assert_tree_close(s1.params, s8.params)
    _assert_tree_close(s1.batch_stats, s8.batch_stats)
    assert int(s8.step) == 1


def test_sharded_gspn_random_seeds_match(rng):
    """seed_method='random' draws the seed set replicated (same key) so
    sharded and single still see identical seeds."""
    mesh = make_mesh(8, axis="space")
    batch = _batch(rng)
    tx = optax.sgd(1.0)
    model, _, state = _gspn_state(batch, tx)
    key = jax.random.PRNGKey(11)

    single = make_train_step(
        make_gspn_loss_fn(model, S, G, seed_method="random"), tx
    )
    s1, m1 = single(state, batch, key)
    sharded = make_point_sharded_gspn_train_step(
        TINY_G, tx, mesh, S, G, seed_method="random"
    )
    s8, m8 = sharded(state, batch, key)
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    _assert_tree_close(s1.params, s8.params)


@pytest.mark.parametrize("roi_sample", ["inbox", "grid"])
def test_sharded_rpointnet_step_equals_single(rng, roi_sample):
    """Stage 2 with a frozen GSPN: seeds shard (proposals all_gather),
    the backbone shards on points, RoIs shard across align+heads; one
    step matches the single-device step for both RoIAlign modes."""
    mesh = make_mesh(8, axis="space")
    batch = _batch(rng)
    tx = optax.sgd(1.0)
    max_inst = 16  # proposals(16) + GT(16) = 32 RoIs / 8 shards

    gmodel, gvars, _ = _gspn_state(batch, tx)
    rcfg = dataclasses.replace(
        tiny_rpointnet(3), ops_impl="xla", roi_sample=roi_sample
    )
    rmodel = RPointNet(rcfg)
    boxes0 = jnp.tile(
        jnp.asarray([[-0.5, -0.5, -0.5, 0.5, 0.5, 0.5]], jnp.float32),
        (batch["xyz"].shape[0], 1, 1),
    )
    rvars = rmodel.init(
        jax.random.PRNGKey(1), batch["xyz"], boxes0, valid=batch["valid"],
        train=False,
    )
    state = TrainState.create(rvars, tx)
    key = jax.random.PRNGKey(5)

    single = make_train_step(
        make_rpointnet_loss_fn(
            rmodel, max_inst, frozen_gspn=(gmodel, gvars, S)
        ),
        tx,
    )
    s1, m1 = single(state, batch, key)

    sharded = make_point_sharded_rpointnet_train_step(
        rcfg, tx, mesh, max_inst, frozen_gspn=(TINY_G, gvars, S)
    )
    s8, m8 = sharded(state, batch, key)

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    assert float(m8["num_fg"]) == float(m1["num_fg"])
    assert float(m8["num_bg"]) == float(m1["num_bg"])
    _assert_tree_close(s1.params, s8.params)
    _assert_tree_close(s1.batch_stats, s8.batch_stats)


def test_sharded_rpointnet_gt_boxes_only(rng):
    """No frozen GSPN: jittered-GT-box training (isolated stage-2 heads)
    shards on the GT RoIs alone."""
    mesh = make_mesh(8, axis="space")
    batch = _batch(rng)
    tx = optax.sgd(1.0)
    max_inst = 8
    rcfg = dataclasses.replace(tiny_rpointnet(3), ops_impl="xla")
    rmodel = RPointNet(rcfg)
    boxes0 = jnp.tile(
        jnp.asarray([[-0.5, -0.5, -0.5, 0.5, 0.5, 0.5]], jnp.float32),
        (batch["xyz"].shape[0], 1, 1),
    )
    rvars = rmodel.init(
        jax.random.PRNGKey(1), batch["xyz"], boxes0, valid=batch["valid"],
        train=False,
    )
    state = TrainState.create(rvars, tx)
    key = jax.random.PRNGKey(9)

    single = make_train_step(make_rpointnet_loss_fn(rmodel, max_inst), tx)
    s1, m1 = single(state, batch, key)
    sharded = make_point_sharded_rpointnet_train_step(
        rcfg, tx, mesh, max_inst
    )
    s8, m8 = sharded(state, batch, key)
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    _assert_tree_close(s1.params, s8.params)


def test_hybrid_2d_gspn_step_equals_single_full_batch(rng):
    """2x4 hybrid mesh (scenes over 'data', seeds over 'space'): the
    step equals THE single-device FULL-batch step — normalizers, BN
    stats and rng draws are all global, a stronger contract than dp.py's
    per-shard-normalized mean."""
    from gspn_tpu.parallel.mesh import make_mesh_2d

    mesh = make_mesh_2d(2, 4)
    batch = _batch(rng, b=4)  # 2 scenes per data row
    tx = optax.sgd(1.0)
    model, _, state = _gspn_state(batch, tx)
    key = jax.random.PRNGKey(3)

    single = make_train_step(make_gspn_loss_fn(model, S, G), tx)
    s1, m1 = single(state, batch, key)

    hybrid = make_point_sharded_gspn_train_step(
        TINY_G, tx, mesh, S, G, data_axis="data"
    )
    s2, m2 = hybrid(state, batch, key)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    _assert_tree_close(s1.params, s2.params)
    _assert_tree_close(s1.batch_stats, s2.batch_stats)


def test_hybrid_2d_rpointnet_step_equals_single_full_batch(rng):
    from gspn_tpu.parallel.mesh import make_mesh_2d

    mesh = make_mesh_2d(2, 4)
    batch = _batch(rng, b=4)
    tx = optax.sgd(1.0)
    max_inst = 16
    gmodel, gvars, _ = _gspn_state(batch, tx)
    rcfg = dataclasses.replace(tiny_rpointnet(3), ops_impl="xla")
    rmodel = RPointNet(rcfg)
    boxes0 = jnp.tile(
        jnp.asarray([[-0.5, -0.5, -0.5, 0.5, 0.5, 0.5]], jnp.float32),
        (batch["xyz"].shape[0], 1, 1),
    )
    rvars = rmodel.init(
        jax.random.PRNGKey(1), batch["xyz"], boxes0, valid=batch["valid"],
        train=False,
    )
    state = TrainState.create(rvars, tx)
    key = jax.random.PRNGKey(5)

    single = make_train_step(
        make_rpointnet_loss_fn(
            rmodel, max_inst, frozen_gspn=(gmodel, gvars, S)
        ),
        tx,
    )
    s1, m1 = single(state, batch, key)

    hybrid = make_point_sharded_rpointnet_train_step(
        rcfg, tx, mesh, max_inst, frozen_gspn=(TINY_G, gvars, S),
        axis="space", data_axis="data",
    )
    s2, m2 = hybrid(state, batch, key)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    assert float(m2["num_fg"]) == float(m1["num_fg"])
    _assert_tree_close(s1.params, s2.params)
    _assert_tree_close(s1.batch_stats, s2.batch_stats)


def test_trainer_cli_point_sharded_end_to_end(tmp_path):
    """The --point-sharded / --data-rows CLI wiring in both trainers:
    stage 1 seed-sharded on the 1-D mesh, then stage 2 restoring that
    checkpoint as the frozen GSPN on a hybrid 2x4 mesh (covers passing
    the GSPN *model* through frozen_gspn — the factory's isinstance
    shim)."""
    from gspn_tpu.train import train_gspn, train_rpointnet

    s1 = train_gspn.main([
        "--steps", "2", "--batch", "2", "--num-points", "128",
        "--num-seeds", "8", "--gt-size", "16", "--preset", "tiny",
        "--log-every", "100", "--ckpt-every", "2", "--point-sharded",
        "--log-dir", str(tmp_path / "s1"),
    ])
    assert int(s1.step) == 2
    s2 = train_rpointnet.main([
        "--steps", "2", "--batch", "2", "--num-points", "128",
        "--num-seeds", "8", "--max-instances", "4", "--num-classes", "3",
        "--preset", "tiny", "--log-every", "100", "--ckpt-every", "2",
        "--point-sharded", "--data-rows", "2",
        "--gspn-ckpt", str(tmp_path / "s1" / "ckpt"),
        "--log-dir", str(tmp_path / "s2"),
    ])
    assert int(s2.step) == 2


def test_sharded_train_rejects_bad_configs():
    mesh = make_mesh(8, axis="space")
    tx = optax.sgd(1.0)
    with pytest.raises(ValueError, match="not divisible"):
        make_point_sharded_gspn_train_step(TINY_G, tx, mesh, 12, G)
    rcfg = dataclasses.replace(tiny_rpointnet(3), head_dropout=0.5)
    with pytest.raises(ValueError, match="head_dropout"):
        make_point_sharded_rpointnet_train_step(rcfg, tx, mesh, 16)
    rcfg = dataclasses.replace(tiny_rpointnet(3), roi_randomize=True)
    with pytest.raises(ValueError, match="roi_randomize"):
        make_point_sharded_rpointnet_train_step(rcfg, tx, mesh, 16)
    with pytest.raises(ValueError, match="total RoIs"):
        make_point_sharded_rpointnet_train_step(
            tiny_rpointnet(3), tx, mesh, 12
        )
