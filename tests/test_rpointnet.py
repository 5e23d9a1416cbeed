"""R-PointNet: backbone, Point RoIAlign semantics, matching, losses, and a
short train-step loss-decrease check with GT-jittered proposal boxes."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gspn_tpu.data import synthetic
from gspn_tpu.models import rpointnet as rp

CFG = rp.RPointNetConfig(
    sa_layers=(
        rp.SALayerSpec(64, 0.4, 16, (16, 32)),
        rp.SALayerSpec(16, 0.8, 16, (32, 64)),
    ),
    fp_mlps=((32,), (32, 32)),
    roi_samples=16,
    roi_mlp=(32, 32),
    cls_fc=(32,),
    box_fc=(32,),
    mask_mlp=(32,),
    num_classes=3,
    ops_impl="xla",
)


def make_batch(rng, b=2, n=256):
    return {
        k: jnp.asarray(v)
        for k, v in synthetic.scene_batch(
            rng, b, n_points=n, max_instances=3, extent=2.0
        ).items()
    }


def test_instance_gt_boxes(rng):
    batch = make_batch(rng)
    boxes, cls, present = rp.instance_gt_boxes(
        batch["xyz"], batch["inst_label"], batch["sem_label"], 8
    )
    inst = np.asarray(batch["inst_label"])
    xyz = np.asarray(batch["xyz"])
    sem = np.asarray(batch["sem_label"])
    for bi in range(2):
        for i in range(8):
            members = inst[bi] == i + 1
            assert bool(present[bi, i]) == bool(members.any())
            if members.any():
                np.testing.assert_allclose(
                    np.asarray(boxes)[bi, i, 0:3], xyz[bi][members].min(0), atol=1e-6
                )
                np.testing.assert_allclose(
                    np.asarray(boxes)[bi, i, 3:6], xyz[bi][members].max(0), atol=1e-6
                )
                assert int(cls[bi, i]) == int(sem[bi][members].max())


def test_point_roi_align(rng):
    batch = make_batch(rng)
    xyz = batch["xyz"]
    boxes, _, present = rp.instance_gt_boxes(
        xyz, batch["inst_label"], batch["sem_label"], 4
    )
    idx, canon, roi_valid, cnt = rp.point_roi_align(xyz, boxes, 16, batch["valid"])
    assert idx.shape == (2, 4, 16)
    assert canon.shape == (2, 4, 16, 3)
    # canonical coords of sampled points lie in [-0.5, 0.5] for valid rois
    cn = np.asarray(canon)
    rv = np.asarray(roi_valid)
    assert np.all(np.abs(cn[rv]) <= 0.5 + 1e-5)
    # every sampled point is inside its box
    xn, bn, idxn = np.asarray(xyz), np.asarray(boxes), np.asarray(idx)
    for bi in range(2):
        for ri in range(4):
            if not rv[bi, ri]:
                continue
            pts = xn[bi][idxn[bi, ri]]
            assert np.all(pts >= bn[bi, ri, 0:3] - 1e-6)
            assert np.all(pts <= bn[bi, ri, 3:6] + 1e-6)
    # empty box -> invalid
    far = jnp.full((2, 1, 6), 50.0).at[..., 3:].add(1.0)
    _, _, rv2, cnt2 = rp.point_roi_align(xyz, far, 8, batch["valid"])
    assert not np.any(np.asarray(rv2))
    assert np.all(np.asarray(cnt2) == 0)


def test_box_delta_roundtrip(rng):
    src = jnp.asarray(rng.random((2, 5, 6)).astype(np.float32))
    src = src.at[..., 3:6].set(src[..., 0:3] + 0.5 + src[..., 3:6])
    dst = src + jnp.asarray(rng.random((2, 5, 6)).astype(np.float32) * 0.2)
    deltas = rp.box_deltas_between(src, dst)
    rec = rp.apply_box_deltas(src, deltas)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(dst), rtol=1e-4, atol=1e-5)


def test_match_and_forward_and_loss(rng):
    batch = make_batch(rng)
    xyz = batch["xyz"]
    gt_boxes, gt_cls, present = rp.instance_gt_boxes(
        xyz, batch["inst_label"], batch["sem_label"], 4
    )
    # proposals = GT boxes jittered + one garbage box
    jitter = jnp.asarray(rng.standard_normal((2, 4, 6)).astype(np.float32) * 0.02)
    rois = jnp.concatenate([gt_boxes + jitter, jnp.full((2, 1, 6), 30.0)], axis=1)
    model = rp.RPointNet(CFG)
    variables = model.init(
        jax.random.PRNGKey(0), xyz, rois, valid=batch["valid"], train=False
    )
    out, _ = model.apply(
        variables, xyz, rois, valid=batch["valid"], train=True,
        mutable=["batch_stats"],
    )
    assert out.cls_logits.shape == (2, 5, CFG.num_classes + 1)
    assert out.box_deltas.shape == (2, 5, 6)
    assert out.mask_logits.shape == (2, 5, CFG.roi_samples)

    match = rp.match_rois(
        rois, out.roi_valid, gt_boxes, gt_cls, present, CFG.fg_iou, CFG.bg_iou
    )
    # jittered GT boxes must match their own instance as fg
    pres = np.asarray(present)
    isfg = np.asarray(match.is_fg)
    for bi in range(2):
        for i in range(4):
            if pres[bi, i]:
                assert isfg[bi, i]
                assert int(match.matched_inst[bi, i]) == i
    total, metrics = rp.rpointnet_loss(out, match, batch["inst_label"])
    assert np.isfinite(float(total))
    assert float(metrics["num_fg"]) >= 1


def test_rpointnet_training_reduces_loss(rng):
    batch = make_batch(rng, b=1, n=192)
    xyz = batch["xyz"]
    gt_boxes, gt_cls, present = rp.instance_gt_boxes(
        xyz, batch["inst_label"], batch["sem_label"], 4
    )
    rois = gt_boxes + 0.02
    model = rp.RPointNet(CFG)
    variables = model.init(
        jax.random.PRNGKey(0), xyz, rois, valid=batch["valid"], train=False
    )
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, bstats, opt_state):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bstats}, xyz, rois,
                valid=batch["valid"], train=True, mutable=["batch_stats"],
            )
            match = rp.match_rois(
                rois, out.roi_valid, gt_boxes, gt_cls, present,
                CFG.fg_iou, CFG.bg_iou,
            )
            total, m = rp.rpointnet_loss(out, match, batch["inst_label"])
            return total, (m, mut["batch_stats"])

        (_, (m, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        upd, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_stats, new_opt, m

    params, bstats = variables["params"], variables["batch_stats"]
    losses = []
    for _ in range(25):
        params, bstats, opt_state, m = step(params, bstats, opt_state)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.85, losses


def test_remat_backbone_with_shared_fps_idx(rng):
    """cfg.remat=True must accept the threaded sa1_fps_idx (the remat
    wrapper's static_argnums indexes `train`; fps_idx rides after it) and
    stay differentiable."""
    import jax
    import numpy as np

    from gspn_tpu import ops

    cfg = rp.RPointNetConfig(
        sa_layers=(
            rp.SALayerSpec(32, 0.4, 8, (8, 16)),
            rp.SALayerSpec(8, 0.8, 8, (16, 16)),
        ),
        fp_mlps=((16,), (16, 16)),
        roi_samples=8, roi_mlp=(16,), cls_fc=(16,), box_fc=(16,),
        mask_mlp=(16,), num_classes=3, remat=True,
    )
    m = rp.RPointNet(cfg)
    xyz = jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32))
    boxes = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0]), (2, 4, 1))
    v = m.init(jax.random.PRNGKey(0), xyz, boxes, train=False)
    fi = ops.farthest_point_sample(32, xyz)
    out = m.apply(v, xyz, boxes, train=False, sa1_fps_idx=fi)
    assert out.cls_logits.shape == (2, 4, 4)

    def loss(p):
        o = m.apply(
            {"params": p, "batch_stats": v["batch_stats"]},
            xyz, boxes, train=False, sa1_fps_idx=fi,
        )
        return jnp.sum(o.cls_logits)

    g = jax.grad(loss)(v["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
