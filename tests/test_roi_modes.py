"""Point RoIAlign modes: "inbox" (TPU-first default: in-box dataset
points, gather == interpolation) vs "grid" (reference-faithful: free
canonical-grid points + three_nn feature interpolation — SURVEY.md §2.2
R-PointNet row (c)), and randomized in-box sampling (the reference's
random RoI subset)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gspn_tpu.models.rpointnet import (
    RPointNet,
    _grid_factors,
    interpolate_roi_features,
    point_roi_align,
    roi_grid_points,
)
from gspn_tpu.train.train_rpointnet import tiny_rpointnet


def test_grid_factors_near_cubic():
    assert _grid_factors(64) == (4, 4, 4)
    assert _grid_factors(8) == (2, 2, 2)
    assert _grid_factors(27) == (3, 3, 3)
    gx, gy, gz = _grid_factors(16)
    assert gx * gy * gz == 16


def test_roi_grid_points_geometry():
    boxes = jnp.asarray([[[0.0, 0.0, 0.0, 2.0, 4.0, 8.0]]])  # (1,1,6)
    world, canon = roi_grid_points(boxes, 8)  # 2x2x2
    assert world.shape == (1, 1, 8, 3) and canon.shape == (1, 1, 8, 3)
    w = np.asarray(world[0, 0])
    # 2-cell centers along each axis at +-0.25 of the extent around center
    np.testing.assert_allclose(sorted(set(w[:, 0])), [0.5, 1.5])
    np.testing.assert_allclose(sorted(set(w[:, 1])), [1.0, 3.0])
    np.testing.assert_allclose(sorted(set(w[:, 2])), [2.0, 6.0])
    assert np.all(np.abs(np.asarray(canon)) <= 0.5)


def test_interpolate_roi_features_matches_manual(rng):
    b, n, r, s, c = 1, 40, 2, 8, 5
    xyz = rng.standard_normal((b, n, 3)).astype(np.float32)
    feat = rng.standard_normal((b, n, c)).astype(np.float32)
    world = rng.standard_normal((b, r, s, 3)).astype(np.float32)
    got, nn_idx = interpolate_roi_features(
        jnp.asarray(xyz), jnp.asarray(feat), jnp.asarray(world), impl="xla"
    )
    got = np.asarray(got)
    for ri in range(r):
        for si in range(s):
            d = np.sum((world[0, ri, si] - xyz[0]) ** 2, -1)
            top3 = np.argsort(d, kind="stable")[:3]
            assert int(nn_idx[0, ri, si]) == int(top3[0])
            w = 1.0 / np.maximum(d[top3], 1e-10)
            w /= w.sum()
            want = (w[:, None] * feat[0, top3]).sum(0)
            np.testing.assert_allclose(got[0, ri, si], want, rtol=1e-4, atol=1e-5)


def test_rpointnet_grid_mode_forward(rng):
    cfg = dataclasses.replace(
        tiny_rpointnet(num_classes=3), roi_sample="grid", roi_samples=8
    )
    model = RPointNet(cfg)
    b, n = 1, 128
    xyz = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.stack([
            np.concatenate([x - 0.5, x + 0.5])
            for x in rng.standard_normal((4, 3)).astype(np.float32)
        ])[None]
    )
    variables = model.init(jax.random.PRNGKey(0), xyz, boxes, train=False)
    out = model.apply(variables, xyz, boxes, train=False)
    assert out.roi_xyz.shape == (b, 4, 8, 3)
    assert out.mask_logits.shape == (b, 4, 8)
    # grid sample points lie inside their boxes
    w = np.asarray(out.roi_xyz)
    bx = np.asarray(boxes)
    assert np.all(w >= bx[..., None, 0:3] - 1e-5)
    assert np.all(w <= bx[..., None, 3:6] + 1e-5)
    # roi_idx points at each sample's nearest dataset point
    xn = np.asarray(xyz[0])
    for ri in range(4):
        for si in range(8):
            d = np.sum((w[0, ri, si] - xn) ** 2, -1)
            assert int(out.roi_idx[0, ri, si]) == int(np.argmin(d))
    for leaf in (out.cls_logits, out.box_deltas, out.mask_logits):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_point_roi_align_impls_bit_identical(rng):
    """The deterministic path's fused kernel (ops.box_group, interpret
    mode off-TPU) must match the mask+top_k XLA formulation exactly —
    idx, canon, validity, and counts."""
    b, n, s = 2, 300, 8
    xyz = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    valid = jnp.asarray(rng.random((b, n)) > 0.2)
    c = rng.uniform(-1, 1, (b, 6, 3)).astype(np.float32)
    e = rng.uniform(0.05, 0.8, (b, 6, 3)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([c - e, c + e], axis=-1))
    outs_p = point_roi_align(xyz, boxes, s, valid, impl="pallas")
    outs_x = point_roi_align(xyz, boxes, s, valid, impl="xla")
    for a, bb in zip(outs_p, outs_x, strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_rpointnet_grad_through_pallas_roi_path(rng):
    """Training-time grads must flow with the pallas (interpret) box_group
    kernel in the RoI path: the kernel's inputs (scene coords, frozen/GT
    boxes) carry no parameters, so autodiff never linearizes the
    pallas_call — this pins that property against refactors that would
    put trainable tensors upstream of the kernel."""
    from gspn_tpu.data import synthetic
    from gspn_tpu.models import rpointnet as rp

    cfg = dataclasses.replace(tiny_rpointnet(3), ops_impl="pallas")
    b = synthetic.scene_batch(np.random.default_rng(0), 2, n_points=192,
                              max_instances=3)
    xyz = jnp.asarray(b["xyz"])
    valid = jnp.asarray(b["valid"])
    boxes = jnp.tile(
        jnp.asarray([-0.4, -0.4, -0.4, 0.4, 0.4, 0.4], jnp.float32),
        (2, 6, 1),
    )
    m = RPointNet(cfg)
    vs = m.init(jax.random.PRNGKey(0), xyz, boxes, valid=valid, train=False)

    def loss(params):
        out, _ = m.apply(
            {"params": params, "batch_stats": vs["batch_stats"]},
            xyz, boxes, valid=valid, train=True, mutable=["batch_stats"],
        )
        return (
            jnp.sum(out.cls_logits**2)
            + jnp.sum(out.mask_logits**2)
            + jnp.sum(out.box_deltas**2)
        )

    g = jax.grad(loss)(vs["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_point_roi_align_random_subset(rng):
    b, n, s = 1, 64, 8
    xyz = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    boxes = jnp.asarray([[[-1.0, -1, -1, 1, 1, 1]]])  # all points inside
    idx, canon, roi_valid, cnt = point_roi_align(
        xyz, boxes, s, rng=jax.random.PRNGKey(0)
    )
    assert bool(roi_valid[0, 0]) and int(cnt[0, 0]) == s
    picked = np.asarray(idx[0, 0])
    assert len(set(picked.tolist())) == s  # without replacement
    # different key -> (almost surely) different subset
    idx2, *_ = point_roi_align(xyz, boxes, s, rng=jax.random.PRNGKey(1))
    assert set(np.asarray(idx2[0, 0]).tolist()) != set(picked.tolist())
    # canon coords consistent with the picked points
    want = (np.asarray(xyz[0])[picked] - 0.0) / 2.0
    np.testing.assert_allclose(np.asarray(canon[0, 0]), want, rtol=1e-5)


def test_point_roi_align_random_cycles_small_boxes(rng):
    b, n, s = 1, 64, 8
    pts = rng.uniform(0.4, 0.6, (3, 3)).astype(np.float32)
    rest = rng.uniform(-1, -0.2, (n - 3, 3)).astype(np.float32)
    xyz = jnp.asarray(np.concatenate([pts, rest])[None])
    boxes = jnp.asarray([[[0.3, 0.3, 0.3, 0.7, 0.7, 0.7]]])  # only first 3
    idx, _, roi_valid, cnt = point_roi_align(
        xyz, boxes, s, rng=jax.random.PRNGKey(0)
    )
    assert int(cnt[0, 0]) == 3 and bool(roi_valid[0, 0])
    assert set(np.asarray(idx[0, 0]).tolist()) <= {0, 1, 2}


def test_pipeline_grid_mode_end_to_end(rng):
    from gspn_tpu.data import synthetic
    from gspn_tpu.models.pipeline import init_pipeline_variables, make_inference_fn
    from tests.test_pipeline_eval import TINY

    cfg = dataclasses.replace(
        TINY,
        rpointnet=dataclasses.replace(
            TINY.rpointnet, roi_sample="grid", roi_samples=8
        ),
    )
    b, n = 1, 128
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, b, n_points=n, max_instances=3, extent=2.0
        ).items()
    }
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), n)
    infer = jax.jit(make_inference_fn(cfg))
    preds = infer(variables, batch["xyz"], None, batch["valid"], jax.random.PRNGKey(1))
    assert preds.masks.shape == (b, cfg.num_seeds, n)
    assert np.all(np.isfinite(np.asarray(preds.scores)))
