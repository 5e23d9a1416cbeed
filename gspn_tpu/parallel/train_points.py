"""Point-sharded TRAINING — the whole-scene/long-context analog of
sequence-parallel training (SURVEY.md §2.3 "shard N points across
chips"), extending ``parallel/points.py`` / ``parallel/scene.py`` from
inference to the train step.

Unlike ``parallel/dp.py`` (batch shards, every device sees different
scenes), here the BATCH IS REPLICATED and the *work inside one scene*
shards over the mesh axis:

- stage 1 (GSPN CVAE): the SEEDS shard — each device crops/encodes/
  decodes its ``num_seeds / n_devices`` seeds (the context-crop
  extraction and per-seed encoders are the entire stage-1 cost).
- stage 2 (R-PointNet): the frozen-GSPN seeds shard, the backbone
  shards on POINTS (``sharded_backbone_body``: sa1 queries + large FP
  targets), and the RoI align + heads shard on RoIs.

Exactness contract (the same one the sharded-inference modules carry):
the sharded step computes the *identical global loss and gradients* as
the single-device ``train.steps`` step, up to float reassociation —

- loss normalizers (fg/valid counts) and numerators are ``psum``-ed
  (``gspn_loss(axis_name=...)`` / ``rpointnet_loss(axis_name=...)``);
- BatchNorm train statistics are computed over the full cross-shard
  reduction set via ``MaskedBatchNorm(axis_name=...)`` (configs are
  rebuilt with ``bn_axis=axis`` inside the step), so the updated
  ``batch_stats`` equal the single-device ones;
- per-shard gradients are partial derivatives of the (identical)
  global loss through this shard's slice only; ``psum`` restores the
  full gradient;
- rng draws that shape results (z noise, GT-box jitter) are made
  REPLICATED at full shape and sliced per shard, so they bit-match the
  single-device draws.

Stochastic layers whose draw shapes depend on the shard (head dropout,
randomized RoI sampling) cannot bit-match a single device; the
factories reject configs that enable them rather than silently diverge.

**Hybrid 2-D meshes** (``data_axis=...``, mesh from
``parallel.mesh.make_mesh_2d``): the batch additionally shards scenes
over ``data_axis`` while each scene's work shards over ``axis`` —
DP x intra-scene parallelism in one ``shard_map``. The exactness
contract is *stronger* than ``parallel/dp.py``'s: because every
normalizer, BN statistic and rng draw is global (psum over BOTH axes;
full-batch-shaped draws sliced per shard), the hybrid step equals THE
single-device full-batch step — not merely a mean of per-shard-
normalized steps.

Verified vs ``make_train_step`` on the virtual 8-device CPU mesh
(1-D and 2x4 hybrid) in tests/test_train_points.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from gspn_tpu import ops
from gspn_tpu.data.instances import gather_seed_instances
from gspn_tpu.models.gspn import GSPN, GSPNConfig, gspn_loss, proposal_boxes
from gspn_tpu.models.rpointnet import (
    RoIHeads,
    RPointNetConfig,
    gather_roi_features,
    instance_gt_boxes,
    interpolate_roi_features,
    match_rois,
    point_roi_align,
    roi_grid_points,
    rpointnet_loss,
)
from gspn_tpu.parallel.points import sharded_backbone_body
from gspn_tpu.train.schedules import resolve_bn_momentum
from gspn_tpu.train.steps import TrainState


def _check_div(name, value, nshards):
    if value % nshards:
        raise ValueError(f"{name}={value} not divisible by {nshards} shards")


def _axes(axis, data_axis):
    """The full reduction-axis spec: intra-scene axis (+ data axis)."""
    return axis if data_axis is None else (data_axis, axis)


def _data_slice(a, data_axis, n_data):
    """This data-shard's slice of a full-batch-shaped replicated draw."""
    if data_axis is None:
        return a
    di = jax.lax.axis_index(data_axis)
    per = a.shape[0] // n_data
    return jax.lax.dynamic_slice_in_dim(a, di * per, per, 0)


def _wrap_step(shard_loss_and_stats, tx, mesh, axis, bn_momentum_fn,
               model_bn_momentum, data_axis=None):
    """shard_loss_and_stats(params, batch_stats, batch, rng) ->
    (loss, (metrics, new_stats)) run per shard; returns the jitted train
    step — state/rng replicated, batch replicated (1-D) or scene-sharded
    over ``data_axis`` (hybrid 2-D)."""
    _model_bn_momentum = resolve_bn_momentum(model_bn_momentum)
    red_axes = _axes(axis, data_axis)

    def shard_step(state: TrainState, batch, rng):
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            shard_loss_and_stats, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        # The loss is the (identical, psum-ed) GLOBAL loss on every
        # shard. Under shard_map autodiff (check_vma=False), collective
        # transposes sum every device's output cotangent, i.e. the
        # per-shard backward differentiates sum-over-devices(L) =
        # nshards * L through this shard's local paths only — so the
        # per-shard grads carry a uniform nshards factor on 1/nshards of
        # the paths, and their *mean* is exactly the global gradient
        # (verified against the single-device step in
        # tests/test_train_points.py, incl. BN-psum and all_gather
        # paths). On hybrid meshes the mean runs over both axes.
        grads = jax.lax.pmean(grads, red_axes)
        if bn_momentum_fn is not None:
            from gspn_tpu.train.schedules import reblend_batch_stats

            new_stats = reblend_batch_stats(
                state.batch_stats, new_stats,
                bn_momentum_fn(state.step), _model_bn_momentum,
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    batch_spec = P() if data_axis is None else P(data_axis)
    sharded = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# Stage 1: GSPN CVAE, seeds sharded
# ---------------------------------------------------------------------------


def make_point_sharded_gspn_train_step(
    cfg: GSPNConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    num_seeds: int,
    gt_size: int,
    axis: str = "space",
    loss_weights: dict | None = None,
    seed_method: str = "fps",
    bn_momentum_fn=None,
    model_bn_momentum: float | None = None,
    data_axis: str | None = None,
):
    """Seed-sharded stage-1 train step: ``step(state, batch, rng) ->
    (state, metrics)`` with state/rng replicated and the batch
    replicated — or, with ``data_axis`` on a 2-D mesh
    (``make_mesh_2d``), scenes sharded over ``data_axis`` while seeds
    shard over ``axis``. Matches ``make_train_step(make_gspn_loss_fn(
    ...))`` on the FULL batch to float tolerance either way.
    ``num_seeds`` must be divisible by the ``axis`` size; the batch by
    the ``data_axis`` size."""
    nshards = mesh.shape[axis]
    n_data = mesh.shape[data_axis] if data_axis is not None else 1
    _check_div("num_seeds", num_seeds, nshards)
    per_s = num_seeds // nshards
    if seed_method not in ("fps", "random"):
        raise ValueError(f"seed_method must be fps|random, got {seed_method}")
    if seed_method == "random" and data_axis is not None:
        raise ValueError(
            "seed_method='random' draws over the full batch and cannot "
            "bit-match with scenes sharded over a data axis; use 'fps' "
            "or a 1-D mesh"
        )
    lw = loss_weights or {}
    model = GSPN(dataclasses.replace(cfg, bn_axis=_axes(axis, data_axis)))

    def loss_fn(params, batch_stats, batch, rng):
        i = jax.lax.axis_index(axis)
        seed_rng, z_rng = jax.random.split(rng)
        xyz, valid = batch["xyz"], batch["valid"]
        # replicated full-shape draws, sliced per shard -> bit-match the
        # single-device sampling (steps.make_gspn_loss_fn)
        if seed_method == "random":
            weights = valid.astype(jnp.float32)
            seed_idx = ops.random_prob_sample(seed_rng, weights, num_seeds)
        else:
            seed_idx = ops.farthest_point_sample(
                num_seeds, xyz, valid, impl=cfg.ops_impl,
                segments=ops.eligible_fps_segments(
                    cfg.fps_segments, num_seeds, xyz.shape[1]
                ),
                segment_mode=cfg.fps_segment_mode,
            )
        eps = _data_slice(
            jax.random.normal(
                z_rng,
                (xyz.shape[0] * n_data, num_seeds, cfg.latent_dim),
                jnp.float32,
            ),
            data_axis, n_data,
        )
        my_seeds = jax.lax.dynamic_slice_in_dim(seed_idx, i * per_s, per_s, 1)
        my_eps = jax.lax.dynamic_slice_in_dim(eps, i * per_s, per_s, 1)
        gt_points, gt_valid, gt_center, is_fg = gather_seed_instances(
            xyz, batch["inst_label"], my_seeds, gt_size
        )
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            xyz,
            my_seeds,
            features=batch.get("features"),
            valid=valid,
            gt_points=gt_points,
            gt_valid=gt_valid,
            z_eps=my_eps,
            train=True,
            mutable=["batch_stats"],
        )
        total, metrics = gspn_loss(
            out, gt_points, gt_valid, gt_center, is_fg,
            impl=cfg.ops_impl, axis_name=_axes(axis, data_axis), **lw,
        )
        return total, (metrics, mutated["batch_stats"])

    return _wrap_step(
        loss_fn, tx, mesh, axis, bn_momentum_fn, model_bn_momentum,
        data_axis=data_axis,
    )


# ---------------------------------------------------------------------------
# Stage 2: R-PointNet — seeds, points and RoIs sharded
# ---------------------------------------------------------------------------


def make_point_sharded_rpointnet_train_step(
    cfg: RPointNetConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    max_instances: int,
    frozen_gspn: tuple | None = None,  # (GSPNConfig, variables, num_seeds)
    axis: str = "space",
    loss_weights: dict | None = None,
    gt_box_jitter: float = 0.05,
    mix_gt_boxes: bool = True,
    bn_momentum_fn=None,
    model_bn_momentum: float | None = None,
    data_axis: str | None = None,
):
    """Fully sharded stage-2 train step (mirrors
    ``steps.make_rpointnet_loss_fn`` semantics; see the module docstring
    for the sharding layout). ``frozen_gspn`` takes the GSPN *config*
    (not model — it is rebuilt with the sharded-BN axis internally),
    its variables, and its seed count. ``data_axis``: 2-D hybrid mesh,
    scenes shard over it in addition to the intra-scene sharding.

    Divisibility: N, ``sa_layers[0].npoint``, ``num_seeds`` and the
    total RoI count (``num_seeds + max_instances`` with GT mixing, else
    ``max_instances``) by the ``axis`` size; the batch by the
    ``data_axis`` size. Rejects ``head_dropout`` / ``roi_randomize``
    (shard-shaped draws cannot match single-device).
    """
    nshards = mesh.shape[axis]
    n_data = mesh.shape[data_axis] if data_axis is not None else 1
    if cfg.head_dropout > 0:
        raise ValueError(
            "point-sharded training does not support head_dropout>0 "
            "(per-shard dropout shapes cannot match the single-device "
            "draw); set head_dropout=0"
        )
    if cfg.roi_randomize:
        raise ValueError(
            "point-sharded training does not support roi_randomize "
            "(per-shard Gumbel shapes cannot match the single-device "
            "draw); use the deterministic first-S RoI sampling"
        )
    _check_div("sa1 npoint", cfg.sa_layers[0].npoint, nshards)
    lw = loss_weights or {}
    scfg = dataclasses.replace(cfg, bn_axis=_axes(axis, data_axis))
    heads = RoIHeads(scfg)
    if frozen_gspn is not None:
        gcfg, gvars, num_seeds = frozen_gspn
        if isinstance(gcfg, GSPN):  # accept a model for steps.py symmetry
            gcfg = gcfg.config
        gmodel = GSPN(gcfg)  # frozen => eval mode => bn_axis irrelevant
        _check_div("num_seeds", num_seeds, nshards)
        r_total = num_seeds + (max_instances if mix_gt_boxes else 0)
    else:
        r_total = max_instances
    _check_div("total RoIs", r_total, nshards)
    per_r = r_total // nshards

    def loss_fn(params, batch_stats, batch, rng):
        i = jax.lax.axis_index(axis)
        xyz, valid = batch["xyz"], batch["valid"]
        features = batch.get("features")
        gt_boxes, gt_cls, present = instance_gt_boxes(
            xyz, batch["inst_label"], batch["sem_label"], max_instances
        )
        # identical split + full-BATCH-shape draws as the single-device
        # loss (sliced to this data shard's scenes on hybrid meshes)
        jitter_rng, drop_rng, roi_rng, rng = jax.random.split(rng, 4)
        del drop_rng, roi_rng  # rejected configs above
        noise = _data_slice(
            jax.random.normal(
                jitter_rng,
                (gt_boxes.shape[0] * n_data,) + gt_boxes.shape[1:],
                jnp.float32,
            ),
            data_axis, n_data,
        ) * gt_box_jitter
        gt_rois = jnp.where(present[..., None], gt_boxes + noise, 0.0)
        sa1_fps_idx = None
        if frozen_gspn is not None:
            sa1_n = cfg.sa_layers[0].npoint
            # ONE shared FPS pass (prefix consistency), as in steps.py
            fps_all = ops.farthest_point_sample(
                max(num_seeds, sa1_n), xyz, valid, impl=cfg.ops_impl,
                segments=ops.shared_eligible_fps_segments(
                    cfg.fps_segments, (num_seeds, sa1_n), xyz.shape[1]
                ),
                segment_mode=cfg.fps_segment_mode,
            )
            seed_idx = fps_all[:, :num_seeds]
            sa1_fps_idx = fps_all[:, :sa1_n]
            per_seed = num_seeds // nshards
            my_seeds = jax.lax.dynamic_slice_in_dim(
                seed_idx, i * per_seed, per_seed, 1
            )
            eps = _data_slice(
                jax.random.normal(
                    rng,
                    (xyz.shape[0] * n_data, num_seeds, gcfg.latent_dim),
                    jnp.float32,
                ),
                data_axis, n_data,
            )
            my_eps = jax.lax.dynamic_slice_in_dim(
                eps, i * per_seed, per_seed, 1
            )
            gout = gmodel.apply(
                gvars,
                jax.lax.stop_gradient(xyz),
                my_seeds,
                features=features,
                valid=valid,
                z_eps=my_eps,
                train=False,
            )
            props_l = jax.lax.stop_gradient(
                proposal_boxes(gout.generated, cfg.box_margin)
            )
            props = jax.lax.all_gather(props_l, axis, axis=1, tiled=True)
            rois = (
                jnp.concatenate([props, gt_rois], axis=1)
                if mix_gt_boxes
                else props
            )
        else:
            rois = gt_rois

        # ---- backbone: point-sharded, train-mode (cross-shard BN)
        feat_l, bb_stats = sharded_backbone_body(
            scfg, axis, nshards,
            {"params": params["backbone"],
             "batch_stats": batch_stats.get("backbone", {})},
            xyz, valid, sa1_fps_idx=sa1_fps_idx, features=features,
            train=True,
        )
        feat = jax.lax.all_gather(feat_l, axis, axis=1, tiled=True)

        # ---- RoI align + heads on this shard's RoI slice (mirrors
        # RPointNet.__call__ post-backbone / parallel.scene)
        my_rois = jax.lax.dynamic_slice_in_dim(rois, i * per_r, per_r, 1)
        if cfg.roi_sample == "grid":
            world, canon = roi_grid_points(my_rois, cfg.roi_samples)
            roi_feats, idx = interpolate_roi_features(
                xyz, feat, world, valid, impl=cfg.ops_impl
            )
            inside = jnp.all(
                jnp.logical_and(
                    xyz[:, None, :, :] >= my_rois[..., None, 0:3],
                    xyz[:, None, :, :] <= my_rois[..., None, 3:6],
                ),
                axis=-1,
            )
            if valid is not None:
                inside = jnp.logical_and(inside, valid[:, None, :])
            roi_valid = jnp.any(inside, axis=-1)
        else:  # "inbox"
            idx, canon, roi_valid, _ = point_roi_align(
                xyz, my_rois, cfg.roi_samples, valid, impl=cfg.ops_impl
            )
            roi_feats = gather_roi_features(feat, idx)
        (cls_logits, box_deltas, mask_logits), head_mut = heads.apply(
            {"params": params["heads"],
             "batch_stats": batch_stats.get("heads", {})},
            canon, roi_feats, roi_valid, True, mutable=["batch_stats"],
        )
        neg = jnp.asarray(-1e4, jnp.float32)
        cls_logits = jnp.where(roi_valid[..., None], cls_logits, 0.0)
        mask_logits = jnp.where(roi_valid[..., None], mask_logits, neg)

        my_present = jax.lax.dynamic_slice_in_dim(
            present, i * per_r, per_r, 1
        ) if frozen_gspn is None else None
        roi_valid_t = (
            jnp.logical_and(roi_valid, my_present)
            if frozen_gspn is None
            else roi_valid
        )
        match = match_rois(
            my_rois, roi_valid_t, gt_boxes, gt_cls, present,
            cfg.fg_iou, cfg.bg_iou,
        )
        # local slice of RoIOutputs is all the loss consumes
        from gspn_tpu.models.rpointnet import RoIOutputs

        out = RoIOutputs(
            cls_logits=cls_logits,
            box_deltas=box_deltas,
            mask_logits=mask_logits,
            roi_idx=idx,
            roi_xyz=jnp.zeros(idx.shape + (3,), jnp.float32),  # unused
            roi_valid=roi_valid,
        )
        total, metrics = rpointnet_loss(
            out, match, batch["inst_label"],
            axis_name=_axes(axis, data_axis), **lw,
        )
        new_stats = dict(batch_stats)
        if bb_stats or "backbone" in batch_stats:
            new_stats["backbone"] = bb_stats
        if "batch_stats" in head_mut and (
            head_mut["batch_stats"] or "heads" in batch_stats
        ):
            new_stats["heads"] = head_mut["batch_stats"]
        return total, (metrics, new_stats)

    return _wrap_step(
        loss_fn, tx, mesh, axis, bn_momentum_fn, model_bn_momentum,
        data_axis=data_axis,
    )
