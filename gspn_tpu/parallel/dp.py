"""Data-parallel training over a device mesh (BASELINE.json config 5).

Wraps any stage loss_fn (see ``gspn_tpu.train.steps``) in ``shard_map``:
batch sharded on the ``data`` axis, params/state replicated, gradients and
batch-stats ``pmean``-ed over ICI before the optimizer update, so every
device holds identical state — absent from the single-GPU reference,
first-class here (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P

from gspn_tpu.train.steps import TrainState


def make_dp_train_step(
    loss_fn,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
    bn_momentum_fn=None,
    model_bn_momentum: float | None = None,  # default: nn.layers.BN_MOMENTUM
):
    """loss_fn(params, batch_stats, batch, rng) -> jitted SPMD
    step(state, batch, rng) -> (state, metrics).

    ``batch`` leading dims must be divisible by the mesh size; ``rng`` is a
    single key, decorrelated per shard with ``fold_in(axis_index)``.
    ``bn_momentum_fn``: optional dynamic BN-momentum schedule, applied to
    the pmean-ed batch stats (see ``gspn_tpu.train.schedules``);
    ``model_bn_momentum`` defaults to the shared ``nn.layers.BN_MOMENTUM``.
    """
    from gspn_tpu.train.schedules import resolve_bn_momentum

    _model_bn_momentum = resolve_bn_momentum(model_bn_momentum)

    def shard_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        grads = jax.lax.pmean(grads, axis)
        new_stats = jax.lax.pmean(new_stats, axis)
        metrics = jax.lax.pmean(metrics, axis)
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

    sharded = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_inference(infer_fn, mesh: Mesh, axis: str = "data"):
    """Shard ``infer_fn(variables, xyz, features, valid, rng)`` (see
    ``gspn_tpu.models.pipeline.make_inference_fn``) over the mesh: scenes
    split on the batch dim, variables replicated."""

    def shard_infer(variables, xyz, features, valid, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        return infer_fn(variables, xyz, features, valid, rng)

    sharded = jax.shard_map(
        shard_infer,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)
