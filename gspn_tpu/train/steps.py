"""Jitted train/eval step factories — the reference's ``sess.run(train_op)``
loop bodies (SURVEY.md §3.1/§3.2) as pure functions over a TrainState.

Structure: each stage exposes a ``loss_fn(params, batch_stats, batch, rng)
-> (loss, (metrics, new_batch_stats))``; :func:`make_train_step` turns any
such loss_fn into a single-chip jitted update, and
``gspn_tpu.parallel.dp.make_dp_train_step`` turns the same loss code into a
multi-chip data-parallel update — build the loss with ``dp_axis=`` /
``dp_size=`` for that path and it computes the GLOBAL full-batch loss on
every shard (psum-ed normalizers via the models' ``axis_name`` hooks,
cross-shard BatchNorm statistics via ``bn_axis``, and full-batch-shaped
rng draws sliced per shard), so the DP step equals THE single-device
full-batch step — the same exactness contract
``parallel/train_points.py`` carries (SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from gspn_tpu import ops
from gspn_tpu.data.instances import gather_seed_instances
from gspn_tpu.models.gspn import GSPN, gspn_loss, proposal_boxes
from gspn_tpu.train.schedules import resolve_bn_momentum
from gspn_tpu.models.rpointnet import (
    RPointNet,
    instance_gt_boxes,
    match_rois,
    rpointnet_loss,
)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


# ---------------------------------------------------------------------------
# DP-aware loss plumbing (used by ``parallel/dp.py``)
# ---------------------------------------------------------------------------


def dp_slice(a, dp_axis: str | None, dp_size: int):
    """This data shard's slice of a full-batch-shaped replicated rng draw
    (leading dim = local_batch * dp_size). Identity when ``dp_axis`` is
    None. Shared with ``parallel/train_points.py``'s hybrid meshes."""
    if dp_axis is None:
        return a
    i = jax.lax.axis_index(dp_axis)
    per = a.shape[0] // dp_size
    return jax.lax.dynamic_slice_in_dim(a, i * per, per, 0)


# ---------------------------------------------------------------------------
# Stage 1: GSPN CVAE
# ---------------------------------------------------------------------------


def make_gspn_loss_fn(
    model: GSPN,
    num_seeds: int,
    gt_size: int,
    loss_weights: dict | None = None,
    seed_method: str = "fps",
    dp_axis: str | None = None,
    dp_size: int = 1,
):
    """``batch``: xyz (B,N,3), valid (B,N) bool, inst_label (B,N) i32,
    optional features (B,N,F). Seed sampling, GT pairing, forward and
    loss are all inside the traced function — no host round-trips.

    seed_method: "fps" (deterministic farthest-point coverage, reference
    default) or "random" (uniform over valid points via the prob_sample
    inverse-CDF op, the reference's randomized alternative).

    dp_axis/dp_size: build the DP-aware variant for
    ``parallel.dp.make_dp_train_step`` — scenes shard over the mesh axis
    ``dp_axis`` (size ``dp_size``) and the per-shard loss is the GLOBAL
    full-batch loss: normalizers psum over the axis
    (``gspn_loss(axis_name=...)``), BatchNorm uses cross-shard statistics
    (model rebuilt with ``bn_axis``), and the z noise / seed uniforms are
    drawn at FULL batch shape from the replicated rng and sliced per
    shard, bit-matching the single-device draws. Only traceable inside a
    ``shard_map`` that binds ``dp_axis``."""
    lw = loss_weights or {}
    if seed_method not in ("fps", "random"):
        raise ValueError(f"seed_method must be fps|random, got {seed_method}")
    if dp_axis is not None:
        model = GSPN(dataclasses.replace(model.config, bn_axis=dp_axis))

    def loss_fn(params, batch_stats, batch, rng):
        seed_rng, z_rng = jax.random.split(rng)
        xyz, valid = batch["xyz"], batch["valid"]
        if seed_method == "random":
            weights = valid.astype(jnp.float32)
            if dp_axis is None:
                seed_idx = ops.random_prob_sample(
                    seed_rng, weights, num_seeds
                )
            else:
                r = jax.random.uniform(
                    seed_rng,
                    (xyz.shape[0] * dp_size, num_seeds),
                    dtype=jnp.float32,
                )
                seed_idx = ops.prob_sample(
                    weights, dp_slice(r, dp_axis, dp_size)
                )
        else:
            seed_idx = ops.farthest_point_sample(
                num_seeds, xyz, valid, impl=model.config.ops_impl,
                segments=ops.eligible_fps_segments(
                    model.config.fps_segments, num_seeds, xyz.shape[1]
                ),
                segment_mode=model.config.fps_segment_mode,
            )
        gt_points, gt_valid, gt_center, is_fg = gather_seed_instances(
            xyz, batch["inst_label"], seed_idx, gt_size
        )
        if dp_axis is None:
            z_kwargs = {"z_rng": z_rng}
        else:
            eps = jax.random.normal(
                z_rng,
                (xyz.shape[0] * dp_size, num_seeds, model.config.latent_dim),
                jnp.float32,
            )
            z_kwargs = {"z_eps": dp_slice(eps, dp_axis, dp_size)}
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            xyz,
            seed_idx,
            features=batch.get("features"),
            valid=valid,
            gt_points=gt_points,
            gt_valid=gt_valid,
            train=True,
            mutable=["batch_stats"],
            **z_kwargs,
        )
        total, metrics = gspn_loss(
            out,
            gt_points,
            gt_valid,
            gt_center,
            is_fg,
            impl=model.config.ops_impl,
            axis_name=dp_axis,
            **lw,
        )
        return total, (metrics, mutated["batch_stats"])

    loss_fn.dp_axis = dp_axis
    loss_fn.dp_size = dp_size
    return loss_fn


# ---------------------------------------------------------------------------
# Stage 2: R-PointNet (proposals from frozen GSPN or jittered GT boxes)
# ---------------------------------------------------------------------------


def make_rpointnet_loss_fn(
    model: RPointNet,
    max_instances: int,
    frozen_gspn: tuple | None = None,  # (GSPN model, variables, num_seeds)
    loss_weights: dict | None = None,
    gt_box_jitter: float = 0.05,
    mix_gt_boxes: bool = True,
    share_fps: bool = True,
    dp_axis: str | None = None,
    dp_size: int = 1,
):
    """Stage-2 loss. If ``frozen_gspn`` is given, proposal boxes come from
    the frozen stage-1 network inside the same program (reference stage-2
    training, SURVEY.md §3.2); otherwise GT boxes jittered with noise from
    ``rng`` stand in (useful for isolated head training and tests).

    mix_gt_boxes (with frozen_gspn): append jittered GT boxes to the
    proposal set so the heads always see positives even while stage-1
    proposals are coarse — the standard two-stage-detector trick.

    share_fps (with frozen_gspn): greedy FPS is prefix-consistent
    (fps(k) == fps(n)[:, :k] on the same masked point set + impl), so ONE
    sampling pass serves both the frozen-GSPN seeds and the backbone's
    first SA layer — exactly as the fused inference pipeline does
    (models/pipeline.py::shared_fps_indices), keeping train and inference
    on the same sampling path. False forces the round-2 behavior of two
    independent (bit-identical) FPS passes; outputs are unchanged either
    way (tested), only the step cost differs. With ``cfg.fps_segments > 1``
    the bit-identity between the two modes additionally requires the
    shared eligibility (ops.shared_eligible_fps_segments over both
    consumer lengths) to equal the backbone's own per-layer eligibility —
    true for the shipped configs (seeds and sa1 sizes are multiples of
    the segment count); mixed-eligibility configs should keep
    share_fps=True.

    dp_axis/dp_size: DP-aware variant for
    ``parallel.dp.make_dp_train_step`` (global full-batch loss per shard;
    see ``make_gspn_loss_fn``). Rejects ``head_dropout``/``roi_randomize``
    — their per-shard draw shapes cannot bit-match the single-device
    draws (same rule as ``parallel/train_points.py``)."""
    lw = loss_weights or {}
    cfg = model.config
    if dp_axis is not None:
        if cfg.head_dropout > 0:
            raise ValueError(
                "DP-aware stage-2 loss does not support head_dropout>0 "
                "(per-shard dropout shapes cannot bit-match the "
                "single-device full-batch draw); set head_dropout=0"
            )
        if cfg.roi_randomize:
            raise ValueError(
                "DP-aware stage-2 loss does not support roi_randomize "
                "(per-shard Gumbel shapes cannot bit-match the "
                "single-device full-batch draw); use deterministic "
                "first-S RoI sampling"
            )
        cfg = dataclasses.replace(cfg, bn_axis=dp_axis)
        model = RPointNet(cfg)

    def loss_fn(params, batch_stats, batch, rng):
        xyz, valid = batch["xyz"], batch["valid"]
        gt_boxes, gt_cls, present = instance_gt_boxes(
            xyz, batch["inst_label"], batch["sem_label"], max_instances
        )
        jitter_rng, drop_rng, roi_rng, rng = jax.random.split(rng, 4)
        noise = dp_slice(
            jax.random.normal(
                jitter_rng,
                (gt_boxes.shape[0] * dp_size,) + gt_boxes.shape[1:],
                jnp.float32,
            ),
            dp_axis, dp_size,
        ) * gt_box_jitter
        gt_rois = jnp.where(present[..., None], gt_boxes + noise, 0.0)
        sa1_fps_idx = None
        if frozen_gspn is not None:
            gmodel, gvars, num_seeds = frozen_gspn
            sa1_n = cfg.sa_layers[0].npoint
            if share_fps:
                fps_all = ops.farthest_point_sample(
                    max(num_seeds, sa1_n), xyz, valid, impl=cfg.ops_impl,
                    segments=ops.shared_eligible_fps_segments(
                        cfg.fps_segments, (num_seeds, sa1_n), xyz.shape[1]
                    ),
                    segment_mode=cfg.fps_segment_mode,
                )
                seed_idx = fps_all[:, :num_seeds]
                sa1_fps_idx = fps_all[:, :sa1_n]
            else:
                seed_idx = ops.farthest_point_sample(
                    num_seeds, xyz, valid, impl=cfg.ops_impl,
                    segments=ops.shared_eligible_fps_segments(
                        cfg.fps_segments, (num_seeds, sa1_n), xyz.shape[1]
                    ),
                    segment_mode=cfg.fps_segment_mode,
                )
            if dp_axis is None:
                gz_kwargs = {"z_rng": rng}
            else:
                geps = jax.random.normal(
                    rng,
                    (xyz.shape[0] * dp_size, num_seeds,
                     gmodel.config.latent_dim),
                    jnp.float32,
                )
                gz_kwargs = {"z_eps": dp_slice(geps, dp_axis, dp_size)}
            gout = gmodel.apply(
                gvars,
                jax.lax.stop_gradient(xyz),
                seed_idx,
                features=batch.get("features"),
                valid=valid,
                train=False,
                **gz_kwargs,
            )
            rois = jax.lax.stop_gradient(
                proposal_boxes(gout.generated, cfg.box_margin)
            )
            if mix_gt_boxes:
                rois = jnp.concatenate([rois, gt_rois], axis=1)
        else:
            rois = gt_rois

        rngs = {}
        if cfg.head_dropout > 0:
            rngs["dropout"] = drop_rng
        if cfg.roi_randomize:
            rngs["roi"] = roi_rng
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            xyz,
            rois,
            features=batch.get("features"),
            valid=valid,
            train=True,
            mutable=["batch_stats"],
            rngs=rngs,
            sa1_fps_idx=sa1_fps_idx,
        )
        roi_valid = (
            jnp.logical_and(out.roi_valid, present)
            if frozen_gspn is None
            else out.roi_valid
        )
        match = match_rois(
            rois, roi_valid, gt_boxes, gt_cls, present, cfg.fg_iou, cfg.bg_iou
        )
        total, metrics = rpointnet_loss(
            out, match, batch["inst_label"], axis_name=dp_axis, **lw
        )
        return total, (metrics, mutated["batch_stats"])

    loss_fn.dp_axis = dp_axis
    loss_fn.dp_size = dp_size
    return loss_fn


# ---------------------------------------------------------------------------
# Generic single-chip step
# ---------------------------------------------------------------------------


def make_train_step(
    loss_fn,
    tx: optax.GradientTransformation,
    bn_momentum_fn=None,
    model_bn_momentum: float | None = None,  # default: nn.layers.BN_MOMENTUM
):
    """loss_fn(params, batch_stats, batch, rng) -> jitted
    step(state, batch, rng) -> (state, metrics).

    bn_momentum_fn: optional ``step -> momentum`` schedule (the reference's
    dynamic ``bn_decay``); the mutated batch_stats are exactly re-blended
    from the model's static momentum to the scheduled one (see
    ``gspn_tpu.train.schedules``). ``model_bn_momentum`` must equal the
    momentum the model's BatchNorm layers actually applied; it defaults
    to the shared ``nn.layers.BN_MOMENTUM`` constant."""
    _model_bn_momentum = resolve_bn_momentum(model_bn_momentum)

    @jax.jit
    def step(state: TrainState, batch, rng):
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
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

    return step


def make_gspn_train_step(model, tx, num_seeds, gt_size, loss_weights=None):
    return make_train_step(
        make_gspn_loss_fn(model, num_seeds, gt_size, loss_weights), tx
    )
