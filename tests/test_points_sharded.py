"""Point-sharded backbone (parallel/points.py) vs the single-device
Backbone: per-point feature maps must match to float tolerance (indices
and pooling are exact; per-shard MLP batch shapes may reassociate matmul
reductions), including the whole-scene N=65536 long-context regime the
survey names (SURVEY.md §2.3 / VERDICT r2 #3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gspn_tpu.data import synthetic
from gspn_tpu.models import rpointnet as rp
from gspn_tpu.models.rpointnet import Backbone
from gspn_tpu.parallel.mesh import make_mesh
from gspn_tpu.parallel.points import make_sharded_backbone

CFG = rp.RPointNetConfig(
    sa_layers=(
        rp.SALayerSpec(64, 0.4, 16, (16, 32)),
        rp.SALayerSpec(16, 0.8, 16, (32, 64)),
    ),
    fp_mlps=((32,), (32, 32)),
    num_classes=3,
    ops_impl="xla",
)


def _run(cfg, b, n, rng):
    batch = synthetic.scene_batch(rng, b, n_points=n, max_instances=4, extent=3.0)
    xyz = jnp.asarray(batch["xyz"])
    valid = jnp.asarray(batch["valid"])
    bb = Backbone(cfg)
    variables = bb.init(jax.random.PRNGKey(0), xyz, None, valid, False)
    ref = jax.jit(lambda v, x, m: bb.apply(v, x, None, m, False))(
        variables, xyz, valid
    )
    mesh = make_mesh(8, axis="space")
    sharded = make_sharded_backbone(cfg, mesh, axis="space")
    out = sharded(variables, xyz, valid)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5
    )


def test_sharded_backbone_matches_single_device(rng):
    _run(CFG, b=2, n=512, rng=rng)


def test_sharded_backbone_whole_scene_65536(rng):
    """The long-context regime: one 65536-point scene sharded over the
    8-device mesh; sa1 npoint=1024 so queries shard 128/device."""
    cfg = rp.RPointNetConfig(
        sa_layers=(
            rp.SALayerSpec(1024, 0.15, 16, (16, 32)),
            rp.SALayerSpec(64, 0.8, 16, (32, 64)),
        ),
        fp_mlps=((32,), (32, 32)),
        num_classes=3,
        ops_impl="xla",
    )
    _run(cfg, b=1, n=65536, rng=rng)


def test_sharded_backbone_rejects_indivisible():
    cfg = rp.RPointNetConfig(
        sa_layers=(rp.SALayerSpec(12, 0.4, 8, (8,)),),
        fp_mlps=((8,),),
        num_classes=3,
        ops_impl="xla",
    )
    mesh = make_mesh(8, axis="space")
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_backbone(cfg, mesh)
