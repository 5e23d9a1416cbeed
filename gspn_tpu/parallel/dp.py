"""Data-parallel training over a device mesh (BASELINE.json config 5).

Wraps a DP-aware stage loss_fn (``gspn_tpu.train.steps`` factories built
with ``dp_axis=``/``dp_size=``) in ``shard_map``: batch sharded on the
``data`` axis, params/state/rng replicated, gradients ``pmean``-ed over
ICI before the optimizer update, so every device holds identical state —
absent from the single-GPU reference, first-class here (SURVEY.md §2.3).

Exactness contract (same as ``parallel/train_points.py``): the DP step
computes THE single-device full-batch step, up to float reassociation —
not a mean of per-shard-normalized steps. The DP-aware loss psums its
masked-loss normalizers (``axis_name``) and BatchNorm train statistics
(``bn_axis``) over the axis, and draws rng noise at FULL batch shape from
the replicated key, sliced per shard — so ragged validity masks across
shards cannot skew the loss, and a DP run is bit-comparable to a
single-device run of the same batch (tests/test_parallel_train.py).

Under ``check_vma=False`` autodiff, collective transposes make each
shard's gradient ``nshards ×`` its local-path share of the global loss's
gradient; their ``pmean`` is exactly the global gradient (the same
argument documented at ``train_points._wrap_step``).
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

    ``loss_fn`` must be DP-aware for ``axis`` — built with
    ``make_*_loss_fn(..., dp_axis=axis, dp_size=mesh.shape[axis])`` — so
    each shard computes the GLOBAL full-batch loss (see module
    docstring). ``batch`` leading dims must be divisible by the mesh
    size; ``rng`` is a single key, kept REPLICATED (the loss draws
    full-batch-shaped noise and slices its shard, bit-matching the
    single-device step). ``bn_momentum_fn``: optional dynamic BN-momentum
    schedule, applied to the (cross-shard, identical) batch stats (see
    ``gspn_tpu.train.schedules``); ``model_bn_momentum`` defaults to the
    shared ``nn.layers.BN_MOMENTUM``.
    """
    from gspn_tpu.train.schedules import resolve_bn_momentum

    if getattr(loss_fn, "dp_axis", None) != axis:
        raise ValueError(
            "make_dp_train_step requires a DP-aware loss_fn computing the "
            f"GLOBAL loss over axis '{axis}': build it with "
            f"make_gspn_loss_fn/make_rpointnet_loss_fn(..., "
            f"dp_axis='{axis}', dp_size=mesh.shape['{axis}']). A custom "
            "loss_fn that already psums its normalizers/BN stats over the "
            "axis can opt in with `loss_fn.dp_axis = axis`."
        )
    mesh_size = mesh.shape[axis]
    loss_size = getattr(loss_fn, "dp_size", None)
    if loss_size is not None and loss_size != mesh_size:
        # a mismatch is SILENTLY wrong, not a shape error: dp_slice's
        # dynamic_slice clamps out-of-range starts, so extra shards would
        # quietly reuse the last noise slice and break the full-batch
        # exactness contract — fail loudly instead
        raise ValueError(
            f"loss_fn was built with dp_size={loss_size} but the mesh's "
            f"'{axis}' axis has {mesh_size} devices; full-batch-shaped "
            "rng draws would be mis-sliced. Rebuild the loss with "
            f"dp_size={mesh_size}."
        )

    _model_bn_momentum = resolve_bn_momentum(model_bn_momentum)

    def shard_step(state: TrainState, batch, rng):
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        # pmean of per-shard partials of the global loss == global grad
        # (collective-transpose argument, module docstring); metrics and
        # cross-shard BN stats are identical per shard — pmean is a
        # replication-safe no-op there.
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
