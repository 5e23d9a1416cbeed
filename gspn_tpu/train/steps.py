"""Jitted train/eval step factories — the reference's ``sess.run(train_op)``
loop bodies (SURVEY.md §3.1/§3.2) as pure functions over a TrainState.

Structure: each stage exposes a ``loss_fn(params, batch_stats, batch, rng)
-> (loss, (metrics, new_batch_stats))``; :func:`make_train_step` turns any
such loss_fn into a single-chip jitted update, and
``gspn_tpu.parallel.dp.make_dp_train_step`` turns the same loss_fn into a
multi-chip data-parallel update (grad psum over the mesh) — the loss code
is shared verbatim between the two.
"""

from __future__ import annotations

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
# Stage 1: GSPN CVAE
# ---------------------------------------------------------------------------


def make_gspn_loss_fn(
    model: GSPN,
    num_seeds: int,
    gt_size: int,
    loss_weights: dict | None = None,
    seed_method: str = "fps",
):
    """``batch``: xyz (B,N,3), valid (B,N) bool, inst_label (B,N) i32,
    optional features (B,N,F). Seed sampling, GT pairing, forward and
    loss are all inside the traced function — no host round-trips.

    seed_method: "fps" (deterministic farthest-point coverage, reference
    default) or "random" (uniform over valid points via the prob_sample
    inverse-CDF op, the reference's randomized alternative)."""
    lw = loss_weights or {}
    if seed_method not in ("fps", "random"):
        raise ValueError(f"seed_method must be fps|random, got {seed_method}")

    def loss_fn(params, batch_stats, batch, rng):
        seed_rng, z_rng = jax.random.split(rng)
        xyz, valid = batch["xyz"], batch["valid"]
        if seed_method == "random":
            weights = valid.astype(jnp.float32)
            seed_idx = ops.random_prob_sample(seed_rng, weights, num_seeds)
        else:
            seed_idx = ops.farthest_point_sample(
                num_seeds, xyz, valid, impl=model.config.ops_impl,
                segments=ops.eligible_fps_segments(
                    model.config.fps_segments, num_seeds, xyz.shape[1]
                ),
            )
        gt_points, gt_valid, gt_center, is_fg = gather_seed_instances(
            xyz, batch["inst_label"], seed_idx, gt_size
        )
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            xyz,
            seed_idx,
            features=batch.get("features"),
            valid=valid,
            gt_points=gt_points,
            gt_valid=gt_valid,
            z_rng=z_rng,
            train=True,
            mutable=["batch_stats"],
        )
        total, metrics = gspn_loss(
            out,
            gt_points,
            gt_valid,
            gt_center,
            is_fg,
            impl=model.config.ops_impl,
            **lw,
        )
        return total, (metrics, mutated["batch_stats"])

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
    share_fps=True."""
    lw = loss_weights or {}
    cfg = model.config

    def loss_fn(params, batch_stats, batch, rng):
        xyz, valid = batch["xyz"], batch["valid"]
        gt_boxes, gt_cls, present = instance_gt_boxes(
            xyz, batch["inst_label"], batch["sem_label"], max_instances
        )
        jitter_rng, drop_rng, roi_rng, rng = jax.random.split(rng, 4)
        noise = (
            jax.random.normal(jitter_rng, gt_boxes.shape, jnp.float32)
            * gt_box_jitter
        )
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
                )
                seed_idx = fps_all[:, :num_seeds]
                sa1_fps_idx = fps_all[:, :sa1_n]
            else:
                seed_idx = ops.farthest_point_sample(
                    num_seeds, xyz, valid, impl=cfg.ops_impl,
                    segments=ops.shared_eligible_fps_segments(
                        cfg.fps_segments, (num_seeds, sa1_n), xyz.shape[1]
                    ),
                )
            gout = gmodel.apply(
                gvars,
                jax.lax.stop_gradient(xyz),
                seed_idx,
                features=batch.get("features"),
                valid=valid,
                z_rng=rng,
                train=False,
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
        total, metrics = rpointnet_loss(out, match, batch["inst_label"], **lw)
        return total, (metrics, mutated["batch_stats"])

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
