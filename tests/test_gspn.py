"""GSPN CVAE: forward shapes, loss sanity, GT pairing, and an e2e
train-for-a-few-steps loss-decrease check (BASELINE config 1 slice)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gspn_tpu import ops
from gspn_tpu.data import synthetic
from gspn_tpu.data.instances import gather_seed_instances
from gspn_tpu.models.gspn import GSPN, GSPNConfig, gspn_loss, proposal_boxes
from gspn_tpu.train.steps import TrainState, make_gspn_train_step

CFG = GSPNConfig(
    context_radii=(0.3, 0.6),
    context_nsample=(16, 32),
    encoder_mlp=(16, 32),
    center_mlp=(16, 32),
    center_fc=(32,),
    latent_dim=8,
    cond_dim=32,
    generator_fc=(64,),
    num_gen_points=32,
    objectness_fc=(16,),
    ops_impl="xla",
)


def make_batch(rng, b=2, n=256):
    return {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, b, n_points=n, max_instances=3, extent=2.0
        ).items()
    }


def test_gather_seed_instances(rng):
    batch = make_batch(rng)
    seed_idx = jnp.asarray(rng.integers(0, 256, (2, 8)).astype(np.int32))
    gt_pts, gt_valid, gt_center, is_fg = gather_seed_instances(
        batch["xyz"], batch["inst_label"], seed_idx, 16
    )
    assert gt_pts.shape == (2, 8, 16, 3)
    inst = np.asarray(batch["inst_label"])
    xyzn = np.asarray(batch["xyz"])
    sidx = np.asarray(seed_idx)
    for bi in range(2):
        for si in range(8):
            lab = inst[bi, sidx[bi, si]]
            if lab == 0:
                assert not np.asarray(is_fg)[bi, si]
                assert not np.any(np.asarray(gt_valid)[bi, si])
                continue
            members = np.where(inst[bi] == lab)[0]
            g = min(16, len(members))
            assert np.asarray(gt_valid)[bi, si, :g].all()
            np.testing.assert_allclose(
                np.asarray(gt_pts)[bi, si, :g], xyzn[bi][members[:g]], atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(gt_center)[bi, si],
                xyzn[bi][members].mean(0),
                atol=1e-5,
            )


def test_gspn_forward_train_and_infer(rng):
    batch = make_batch(rng)
    model = GSPN(CFG)
    s, g = 8, 16
    seed_idx = ops.farthest_point_sample(s, batch["xyz"], batch["valid"], impl="xla")
    gt_pts, gt_valid, gt_center, is_fg = gather_seed_instances(
        batch["xyz"], batch["inst_label"], seed_idx, g
    )
    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, batch["xyz"], seed_idx, valid=batch["valid"],
        gt_points=gt_pts, gt_valid=gt_valid, z_rng=key, train=False,
    )
    # training-mode forward (recognition path)
    out, _ = model.apply(
        variables, batch["xyz"], seed_idx, valid=batch["valid"],
        gt_points=gt_pts, gt_valid=gt_valid, z_rng=key, train=True,
        mutable=["batch_stats"],
    )
    assert out.generated.shape == (2, s, CFG.num_gen_points, 3)
    assert out.center.shape == (2, s, 3)
    assert out.objectness.shape == (2, s)
    assert out.q_mu is not None
    total, metrics = gspn_loss(out, gt_pts, gt_valid, gt_center, is_fg, impl="xla")
    assert np.isfinite(float(total))
    assert set(metrics) == {"loss", "chamfer", "kl", "center", "objectness"}

    # inference-mode forward (prior path, no GT)
    out_inf = model.apply(
        variables, batch["xyz"], seed_idx, valid=batch["valid"],
        z_rng=jax.random.PRNGKey(1), train=False,
    )
    assert out_inf.q_mu is None
    assert out_inf.generated.shape == (2, s, CFG.num_gen_points, 3)
    boxes = proposal_boxes(out_inf.generated)
    assert boxes.shape == (2, s, 6)
    assert np.all(np.asarray(boxes[..., 3:] >= boxes[..., :3]))


def test_gspn_training_reduces_loss(rng):
    batch = make_batch(rng, b=2, n=256)
    model = GSPN(CFG)
    tx = optax.adam(3e-3)
    s, g = 8, 16
    key = jax.random.PRNGKey(0)
    seed_idx = ops.farthest_point_sample(s, batch["xyz"], batch["valid"], impl="xla")
    gt_pts, gt_valid, _, _ = gather_seed_instances(
        batch["xyz"], batch["inst_label"], seed_idx, g
    )
    variables = model.init(
        key, batch["xyz"], seed_idx, valid=batch["valid"],
        gt_points=gt_pts, gt_valid=gt_valid, z_rng=key, train=False,
    )
    state = TrainState.create(variables, tx)
    step = make_gspn_train_step(model, tx, num_seeds=s, gt_size=g)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses
    assert int(state.step) == 30
