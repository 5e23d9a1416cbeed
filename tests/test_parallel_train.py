"""Data parallelism on the 8-device virtual CPU mesh, checkpoint round
trips, and CLI trainer smoke runs (SURVEY.md §4.4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gspn_tpu.data import synthetic
from gspn_tpu.models.gspn import GSPN, GSPNConfig
from gspn_tpu.parallel import make_mesh, make_dp_train_step, replicate, shard_batch
from gspn_tpu.train.steps import TrainState, make_gspn_loss_fn, make_train_step

TINY = GSPNConfig(
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
S, G = 8, 16


def init_state(batch, tx):
    from gspn_tpu import ops
    from gspn_tpu.data.instances import gather_seed_instances

    key = jax.random.PRNGKey(0)
    model = GSPN(TINY)
    seed_idx = ops.farthest_point_sample(S, batch["xyz"], batch["valid"], impl="xla")
    gp, gv, _, _ = gather_seed_instances(batch["xyz"], batch["inst_label"], seed_idx, G)
    variables = model.init(
        key, batch["xyz"], seed_idx, valid=batch["valid"], gt_points=gp,
        gt_valid=gv, z_rng=key, train=False,
    )
    return model, TrainState.create(variables, tx)


def test_dp_training_on_8_device_mesh(rng):
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(8)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, 8, n_points=128, max_instances=3, extent=2.0
        ).items()
    }
    tx = optax.adam(3e-3)
    model, state = init_state(batch, tx)
    loss_fn = make_gspn_loss_fn(model, S, G, dp_axis="data", dp_size=8)
    dp_step = make_dp_train_step(loss_fn, tx, mesh)

    state = replicate(mesh, state)
    sbatch = shard_batch(mesh, batch)
    losses = []
    key = jax.random.PRNGKey(7)
    for i in range(10):
        state, metrics = dp_step(state, sbatch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # params stay fully replicated and finite
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))
    assert int(state.step) == 10


def _assert_tree_close(t1, t2, rtol=5e-5, atol=2e-5):
    l1 = jax.tree_util.tree_leaves(t1)
    l2 = jax.tree_util.tree_leaves(t2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol
        )


def _ragged_batch(rng, b=8, n=128):
    """Scenes with strongly UNEQUAL valid-point counts per scene — under
    batch sharding each shard sees a different masked count, which the
    old per-shard-normalized DP semantics mis-weighted."""
    batch = synthetic.scene_batch(rng, b, n_points=n, max_instances=3, extent=2.0)
    valid = np.asarray(batch["valid"]).copy()
    for i in range(b):
        keep = n // 2 + (i * n // (2 * b))  # 64..120 of 128
        valid[i, keep:] = False
    batch["valid"] = valid
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.parametrize("ragged", [False, True])
def test_dp_step_equals_single_chip(rng, ragged):
    """THE exactness contract (SURVEY.md §2.3 / VERDICT r3 #4): the DP
    train step IS the single-device full-batch step — global psum-ed loss
    normalizers, cross-shard BN statistics, full-batch-shaped rng draws
    sliced per shard. Checked on distinct scenes per shard, including
    ragged validity masks (where per-shard-normalized means would
    diverge); only fp reassociation tolerance remains."""
    mesh = make_mesh(8)
    batch = (
        _ragged_batch(rng)
        if ragged
        else {
            k: jnp.asarray(v)
            for k, v in synthetic.scene_batch(
                rng, 8, n_points=128, max_instances=3, extent=2.0
            ).items()
        }
    )

    # sgd(1.0): the param delta IS the (pmean-ed) gradient, so this compares
    # gradients directly (adam would amplify fp noise on ~0 grads to ±lr)
    tx = optax.sgd(1.0)
    model, state = init_state(batch, tx)
    key = jax.random.PRNGKey(3)

    single = make_train_step(make_gspn_loss_fn(model, S, G), tx)
    s1, m1 = single(state, batch, key)

    dp = make_dp_train_step(
        make_gspn_loss_fn(model, S, G, dp_axis="data", dp_size=8), tx, mesh
    )
    s8, m8 = dp(replicate(mesh, state), shard_batch(mesh, batch), key)

    np.testing.assert_allclose(
        float(m8["loss"]), float(m1["loss"]), rtol=1e-6
    )
    _assert_tree_close(s1.params, s8.params)
    _assert_tree_close(s1.batch_stats, s8.batch_stats)


def test_dp_stage2_step_equals_single_chip(rng):
    """Stage-2 DP exactness: frozen-GSPN proposals + jittered-GT mixing +
    RoI heads — the sliced full-batch jitter/z draws and psum-ed
    rpointnet_loss normalizers reproduce the single-device step."""
    from gspn_tpu.models.rpointnet import RPointNet
    from gspn_tpu.train.steps import make_rpointnet_loss_fn
    from gspn_tpu.train.train_rpointnet import tiny_rpointnet

    mesh = make_mesh(8)
    batch = _ragged_batch(rng)
    tx = optax.sgd(1.0)
    gmodel, gstate = init_state(batch, tx)
    frozen = (
        gmodel,
        {"params": gstate.params, "batch_stats": gstate.batch_stats},
        S,
    )
    rcfg = dataclasses.replace(tiny_rpointnet(num_classes=3), ops_impl="xla")
    rmodel = RPointNet(rcfg)
    key = jax.random.PRNGKey(5)
    boxes = jnp.tile(
        jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0], jnp.float32),
        (batch["xyz"].shape[0], 4, 1),
    )
    rvars = rmodel.init(
        key, batch["xyz"], boxes, valid=batch["valid"], train=False
    )
    rstate = TrainState.create(rvars, tx)

    single = make_train_step(
        make_rpointnet_loss_fn(rmodel, 4, frozen_gspn=frozen), tx
    )
    s1, m1 = single(rstate, batch, key)

    dp = make_dp_train_step(
        make_rpointnet_loss_fn(
            rmodel, 4, frozen_gspn=frozen, dp_axis="data", dp_size=8
        ),
        tx, mesh,
    )
    s8, m8 = dp(replicate(mesh, rstate), shard_batch(mesh, batch), key)

    np.testing.assert_allclose(
        float(m8["loss"]), float(m1["loss"]), rtol=1e-6
    )
    _assert_tree_close(s1.params, s8.params)
    _assert_tree_close(s1.batch_stats, s8.batch_stats)


def test_dp_requires_dp_aware_loss(rng):
    """A plain (per-shard-normalized) loss_fn is rejected up front — one
    DP semantics in the tree (VERDICT r3 weak #2)."""
    mesh = make_mesh(8)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, 8, n_points=128, max_instances=3, extent=2.0
        ).items()
    }
    tx = optax.sgd(1.0)
    model, _ = init_state(batch, tx)
    with np.testing.assert_raises(ValueError):
        make_dp_train_step(make_gspn_loss_fn(model, S, G), tx, mesh)
    # dp_size mismatching the mesh is SILENTLY wrong if allowed through
    # (dp_slice's dynamic_slice clamps, duplicating noise slices) — it
    # must be rejected just as loudly as a non-DP loss
    with np.testing.assert_raises(ValueError):
        make_dp_train_step(
            make_gspn_loss_fn(model, S, G, dp_axis="data", dp_size=4),
            tx, mesh,
        )


def test_checkpoint_roundtrip(tmp_path, rng):
    import optax

    from gspn_tpu.train.checkpoint import CheckpointManager

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, 2, n_points=128, max_instances=3, extent=2.0
        ).items()
    }
    tx = optax.adam(1e-3)
    model, state = init_state(batch, tx)
    step = make_train_step(make_gspn_loss_fn(model, S, G), tx)
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    mgr = CheckpointManager(tmp_path / "ckpt")
    assert mgr.save(int(state.step), state)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    restored = mgr.restore(abstract)
    mgr.close()
    assert restored is not None
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues from the restored state
    state2, m = step(restored, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == int(state.step) + 1
    assert np.isfinite(float(m["loss"]))


def test_trainer_cli_smoke(tmp_path):
    from gspn_tpu.train import train_gspn

    state = train_gspn.main([
        "--steps", "3", "--batch", "2", "--num-points", "128",
        "--num-seeds", "8", "--gt-size", "16", "--preset", "tiny",
        "--log-dir", str(tmp_path / "run"), "--log-every", "1",
        "--ckpt-every", "100",
    ])
    assert int(state.step) == 3
    assert (tmp_path / "run" / "train.jsonl").exists()
    assert (tmp_path / "run" / "ckpt").exists()


def test_trainer_stage2_cli_smoke(tmp_path):
    from gspn_tpu.train import train_rpointnet

    state = train_rpointnet.main([
        "--steps", "3", "--batch", "2", "--num-points", "128",
        "--max-instances", "4", "--num-classes", "3", "--preset", "tiny",
        "--gt-boxes", "--log-dir", str(tmp_path / "run2"), "--log-every", "1",
        "--ckpt-every", "100",
    ])
    assert int(state.step) == 3
