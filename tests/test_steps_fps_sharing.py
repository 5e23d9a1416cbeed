"""Stage-2 training shares one FPS pass between the frozen-GSPN seeds and
the backbone's first SA layer (greedy-FPS prefix consistency), exactly as
the fused inference pipeline does — outputs must be bit-identical to the
two-independent-passes formulation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gspn_tpu.data import synthetic
from gspn_tpu.data.instances import gather_seed_instances
from gspn_tpu.models import rpointnet as rp
from gspn_tpu.models.gspn import GSPN, GSPNConfig
from gspn_tpu.train.steps import make_rpointnet_loss_fn
from tests.test_rpointnet import CFG


def _setup(rng):
    b, n, num_seeds = 2, 256, 8
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, b, n_points=n, max_instances=3, extent=2.0
        ).items()
    }
    gcfg = GSPNConfig(
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
    gmodel = GSPN(gcfg)
    key = jax.random.PRNGKey(0)
    sidx = jnp.zeros((b, num_seeds), jnp.int32)
    gp, gv, _, _ = gather_seed_instances(
        batch["xyz"], batch["inst_label"], sidx, 16
    )
    gvars = gmodel.init(
        key, batch["xyz"], sidx, valid=batch["valid"], gt_points=gp,
        gt_valid=gv, z_rng=key, train=False,
    )
    model = rp.RPointNet(CFG)
    boxes = jnp.tile(
        jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0], jnp.float32),
        (b, num_seeds + 4, 1),  # proposals + mixed GT rois
    )
    variables = model.init(
        jax.random.PRNGKey(1), batch["xyz"], boxes, valid=batch["valid"],
        train=False,
    )
    frozen = (gmodel, gvars, num_seeds)
    return model, variables, frozen, batch


def test_stage2_shared_fps_is_bit_identical(rng):
    model, variables, frozen, batch = _setup(rng)
    step_rng = jax.random.PRNGKey(7)

    def run(share):
        loss_fn = make_rpointnet_loss_fn(
            model, 4, frozen, share_fps=share
        )
        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        (loss, (metrics, stats)), grads = grad_fn(
            variables["params"], variables["batch_stats"], batch, step_rng
        )
        return loss, metrics, grads

    l1, m1, g1 = run(True)
    l2, m2, g2 = run(False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        g1,
        g2,
    )


def test_stage2_shared_fps_single_sampling_pass(rng, monkeypatch):
    """With share_fps (the default), the traced loss contains exactly ONE
    farthest_point_sample call serving both seeds and sa1."""
    from gspn_tpu import ops
    from gspn_tpu.train import steps as steps_mod

    model, variables, frozen, batch = _setup(rng)
    calls = []
    real = ops.farthest_point_sample

    def counting(npoint, *a, **kw):
        calls.append(npoint)
        return real(npoint, *a, **kw)

    monkeypatch.setattr(steps_mod.ops, "farthest_point_sample", counting)
    import gspn_tpu.nn.pointnet2 as pn2

    monkeypatch.setattr(pn2.ops, "farthest_point_sample", counting)
    loss_fn = make_rpointnet_loss_fn(model, 4, frozen)
    loss_fn(variables["params"], variables["batch_stats"], batch,
            jax.random.PRNGKey(3))
    # one shared pass at max(num_seeds=8, sa1 npoint=64) serves seeds AND
    # sa1; the only other sampling is sa2's (npoint=16) over sa1's OUTPUT
    # points — a different point set, correctly not shared
    assert calls == [64, 16], calls
