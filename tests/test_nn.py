"""Tests for PointNet++ modules: shapes, masking invariance (padded points
must not change valid outputs), BN stats hygiene, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gspn_tpu import nn as gnn


def cloud(rng, b, n, c=None):
    xyz = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    if c is None:
        return xyz
    feats = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    return xyz, feats


def test_sa_module_shapes(rng):
    xyz, feats = cloud(rng, 2, 128, 16)
    mod = gnn.PointNetSAModule(
        npoint=32, radius=0.6, nsample=8, mlp=(32, 64), ops_impl="xla"
    )
    vars_ = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    new_xyz, pooled, _ = mod.apply(vars_, xyz, feats, train=False)
    assert new_xyz.shape == (2, 32, 3)
    assert pooled.shape == (2, 32, 64)
    assert "batch_stats" in vars_


def test_sa_module_group_all(rng):
    xyz, feats = cloud(rng, 2, 64, 8)
    mod = gnn.PointNetSAModule(mlp=(32,), group_all=True, ops_impl="xla")
    vars_ = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    new_xyz, pooled, _ = mod.apply(vars_, xyz, feats, train=False)
    assert new_xyz.shape == (2, 1, 3)
    assert pooled.shape == (2, 1, 32)


@pytest.mark.parametrize("pooling", ["max", "avg", "weighted_avg", "max_and_avg"])
def test_sa_module_poolings(rng, pooling):
    xyz, feats = cloud(rng, 1, 64, 4)
    mod = gnn.PointNetSAModule(
        npoint=16, radius=0.8, nsample=8, mlp=(16,), pooling=pooling,
        ops_impl="xla",
    )
    vars_ = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    _, pooled, _ = mod.apply(vars_, xyz, feats, train=False)
    want_c = 32 if pooling == "max_and_avg" else 16
    assert pooled.shape == (1, 16, want_c)
    assert np.all(np.isfinite(np.asarray(pooled)))


def test_msg_module(rng):
    xyz, feats = cloud(rng, 2, 128, 8)
    mod = gnn.PointNetSAModuleMSG(
        npoint=32,
        radius_list=(0.4, 0.8),
        nsample_list=(8, 16),
        mlp_list=((16, 16), (16, 32)),
        ops_impl="xla",
    )
    vars_ = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    new_xyz, out, _ = mod.apply(vars_, xyz, feats, train=False)
    assert out.shape == (2, 32, 48)


def test_fp_module(rng):
    xyz1, skip = cloud(rng, 2, 96, 8)  # dense targets
    xyz2, feats = cloud(rng, 2, 24, 16)  # sparse sources
    mod = gnn.PointNetFPModule(mlp=(32, 32))
    vars_ = mod.init(jax.random.PRNGKey(0), xyz1, xyz2, skip, feats, train=False)
    out = mod.apply(vars_, xyz1, xyz2, skip, feats, train=False)
    assert out.shape == (2, 96, 32)


def test_masking_invariance_sa(rng):
    """Appending padded garbage points must not change outputs for the
    valid prefix — the core static-shape design invariant."""
    b, n, pad, c = 1, 96, 32, 8
    xyz, feats = cloud(rng, b, n, c)
    mod = gnn.PointNetSAModule(
        npoint=24, radius=0.7, nsample=8, mlp=(16, 32), ops_impl="xla"
    )
    valid_full = jnp.ones((b, n), bool)
    vars_ = mod.init(jax.random.PRNGKey(0), xyz, feats, valid_full, train=False)
    nx1, p1, _ = mod.apply(vars_, xyz, feats, valid_full, train=False)

    garbage = jnp.full((b, pad, 3), 7.7, xyz.dtype)
    xyz_p = jnp.concatenate([xyz, garbage], 1)
    feats_p = jnp.concatenate([feats, jnp.ones((b, pad, c), feats.dtype)], 1)
    valid_p = jnp.concatenate([valid_full, jnp.zeros((b, pad), bool)], 1)
    nx2, p2, v2 = mod.apply(vars_, xyz_p, feats_p, valid_p, train=False)

    np.testing.assert_allclose(np.asarray(nx1), np.asarray(nx2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
    assert np.all(np.asarray(v2))


def test_masking_invariance_fp(rng):
    b, m, pad = 1, 24, 16
    xyz1, skip = cloud(rng, b, 48, 4)
    xyz2, feats = cloud(rng, b, m, 8)
    mod = gnn.PointNetFPModule(mlp=(16,))
    v2_full = jnp.ones((b, m), bool)
    vars_ = mod.init(jax.random.PRNGKey(0), xyz1, xyz2, skip, feats, train=False)
    out1 = mod.apply(vars_, xyz1, xyz2, skip, feats, None, v2_full, train=False)

    xyz2_p = jnp.concatenate([xyz2, jnp.zeros((b, pad, 3))], 1)
    feats_p = jnp.concatenate([feats, jnp.full((b, pad, 8), 9.0)], 1)
    v2_p = jnp.concatenate([v2_full, jnp.zeros((b, pad), bool)], 1)
    out2 = mod.apply(vars_, xyz1, xyz2_p, skip, feats_p, None, v2_p, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_masked_bn_ignores_padding(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    mask = jnp.ones((2, 10), bool)
    bn = gnn.MaskedBatchNorm()
    vars_ = bn.init(jax.random.PRNGKey(0), x, mask, train=True)
    y1, m1 = bn.apply(vars_, x, mask, train=True, mutable=["batch_stats"])

    x_p = jnp.concatenate([x, jnp.full((2, 5, 4), 100.0)], 1)
    mask_p = jnp.concatenate([mask, jnp.zeros((2, 5), bool)], 1)
    y2, m2 = bn.apply(vars_, x_p, mask_p, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2[:, :10]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m1["batch_stats"]["mean"]),
        np.asarray(m2["batch_stats"]["mean"]),
        atol=1e-6,
    )


def test_gradients_flow_through_sa_fp(rng):
    xyz, feats = cloud(rng, 1, 64, 8)
    sa = gnn.PointNetSAModule(npoint=16, radius=0.8, nsample=8, mlp=(16,), ops_impl="xla")
    fp = gnn.PointNetFPModule(mlp=(8,))
    k = jax.random.PRNGKey(0)
    sa_vars = sa.init(k, xyz, feats, train=False)
    new_xyz, pooled, _ = sa.apply(sa_vars, xyz, feats, train=False)
    fp_vars = fp.init(k, xyz, new_xyz, feats, pooled, train=False)

    def loss(sv, fv):
        nx, pl_, _ = sa.apply(sv, xyz, feats, train=False)
        out = fp.apply(fv, xyz, nx, feats, pl_, train=False)
        return jnp.sum(out**2)

    gs, gf = jax.grad(loss, argnums=(0, 1))(sa_vars, fp_vars)
    leaves = jax.tree_util.tree_leaves((gs["params"], gf["params"]))
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_fp_module_mm_matches_exact(rng):
    """The MXU interpolation path ("mm", the TPU production default) must
    match the reference-exact path within fp32 summation-order tolerance,
    masked and unmasked — the documented, intentional deviation from
    bit-exactness (see PointNetFPModule.interp)."""
    import numpy as np

    xyz1, skip = cloud(rng, 2, 96, 8)
    xyz2, feats = cloud(rng, 2, 24, 16)
    valid2 = jnp.asarray(np.random.default_rng(5).random((2, 24)) > 0.3)
    for v2 in (None, valid2):
        exact = gnn.PointNetFPModule(mlp=(32, 32), interp="exact")
        mm = gnn.PointNetFPModule(mlp=(32, 32), interp="mm")
        vars_ = exact.init(
            jax.random.PRNGKey(0), xyz1, xyz2, skip, feats, None, v2,
            train=False,
        )
        a = exact.apply(vars_, xyz1, xyz2, skip, feats, None, v2, train=False)
        b = mm.apply(vars_, xyz1, xyz2, skip, feats, None, v2, train=False)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6
        )
