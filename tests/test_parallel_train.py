"""Data parallelism on the 8-device virtual CPU mesh, checkpoint round
trips, and CLI trainer smoke runs (SURVEY.md §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

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
    loss_fn = make_gspn_loss_fn(model, S, G)
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


def _deterministic_loss_fn(model):
    """GSPN loss with z noise read from the batch (``z_eps``), so the rng
    argument is unused and per-shard/single-chip runs see identical noise."""
    from gspn_tpu import ops
    from gspn_tpu.data.instances import gather_seed_instances
    from gspn_tpu.models.gspn import gspn_loss

    def loss_fn(params, batch_stats, batch, rng):
        del rng
        xyz, valid = batch["xyz"], batch["valid"]
        seed_idx = ops.farthest_point_sample(S, xyz, valid, impl="xla")
        gt_points, gt_valid, gt_center, is_fg = gather_seed_instances(
            xyz, batch["inst_label"], seed_idx, G
        )
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            xyz, seed_idx, valid=valid, gt_points=gt_points,
            gt_valid=gt_valid, z_eps=batch["z_eps"], train=True,
            mutable=["batch_stats"],
        )
        total, metrics = gspn_loss(
            out, gt_points, gt_valid, gt_center, is_fg, impl="xla"
        )
        return total, (metrics, mutated["batch_stats"])

    return loss_fn


def test_dp_step_equals_single_chip(rng):
    """A DP train step on a replicated global batch (same scene + same z
    noise on every shard) must produce the SAME updated params, batch
    stats, and loss as the single-chip step — per-shard grads/stats pmean
    to the single-chip values exactly up to fp reassociation (SURVEY.md
    §2.3 DP contract; tolerance documented at 3e-4 relative, 5e-4 absolute for noise-dominated small grads)."""
    mesh = make_mesh(8)
    one = synthetic.scene_batch(rng, 1, n_points=128, max_instances=3, extent=2.0)
    batch = {k: jnp.asarray(np.tile(v, (8,) + (1,) * (v.ndim - 1))) for k, v in one.items()}
    z1 = rng.standard_normal((1, S, TINY.latent_dim)).astype(np.float32)
    batch["z_eps"] = jnp.asarray(np.tile(z1, (8, 1, 1)))

    # sgd(1.0): the param delta IS the (pmean-ed) gradient, so this compares
    # gradients directly (adam would amplify fp noise on ~0 grads to ±lr)
    tx = optax.sgd(1.0)
    model, state = init_state(batch, tx)
    loss_fn = _deterministic_loss_fn(model)
    key = jax.random.PRNGKey(3)

    single = make_train_step(loss_fn, tx)
    s1, m1 = single(state, batch, key)

    dp = make_dp_train_step(loss_fn, tx, mesh)
    s8, m8 = dp(replicate(mesh, state), shard_batch(mesh, batch), key)

    np.testing.assert_allclose(
        float(m8["loss"]), float(m1["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s8.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=5e-4
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.batch_stats),
        jax.tree_util.tree_leaves(s8.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=5e-4
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
