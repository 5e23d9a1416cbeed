"""LR / batch-norm-momentum schedules — the reference trainer family's
``tf.train.exponential_decay`` learning-rate and ``bn_decay`` idioms
(SURVEY.md §2.2 stage-1/stage-2 trainer rows; the pointnet2 trainer that
GSPN's scripts follow schedules BOTH), rebuilt on optax schedules and a
step-indexed momentum function.

BN-momentum scheduling is applied OUTSIDE the model: the train step
receives the mutated ``batch_stats`` (computed with the model's static
momentum ``m0``), algebraically recovers this step's raw batch statistics,
and re-blends them with the scheduled momentum ``m(step)``::

    stats_m0 = m0 * old + (1 - m0) * batch       (what the model returns)
    batch    = (stats_m0 - m0 * old) / (1 - m0)  (exact recovery)
    new      = m(step) * old + (1 - m(step)) * batch

This is bit-for-bit the same recurrence the reference's in-graph dynamic
``bn_decay`` placeholder computes, without threading a traced scalar
through every module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from gspn_tpu.nn.layers import BN_MOMENTUM


def resolve_bn_momentum(model_bn_momentum=None) -> float:
    """The momentum the model's BatchNorm layers actually applied —
    defaults to the shared ``nn.layers.BN_MOMENTUM`` so the exact
    re-blend in the train steps cannot drift from the layers."""
    return BN_MOMENTUM if model_bn_momentum is None else model_bn_momentum


def build_lr_schedule(args) -> optax.Schedule | float:
    """Learning-rate schedule from trainer CLI flags.

    ``constant`` reproduces round-1 behavior; ``exp`` is the reference
    idiom (staircase exponential decay with a floor); ``cosine`` is the
    modern alternative.
    """
    kind = getattr(args, "lr_schedule", "constant")
    if kind == "constant":
        return args.lr
    if kind == "exp":
        return optax.exponential_decay(
            init_value=args.lr,
            transition_steps=args.lr_decay_steps,
            decay_rate=args.lr_decay_rate,
            staircase=True,
            end_value=args.lr_min,
        )
    if kind == "cosine":
        return optax.cosine_decay_schedule(
            init_value=args.lr,
            decay_steps=max(args.steps, 1),
            alpha=args.lr_min / args.lr,
        )
    raise ValueError(f"unknown lr schedule {kind!r}")


def bn_momentum_schedule(
    init_decay: float = 0.5,
    decay_steps: int = 10000,
    decay_rate: float = 0.5,
    clip: float = 0.99,
):
    """The reference's ``get_bn_decay``: momentum(step) =
    min(clip, 1 - init_decay * decay_rate^(step // decay_steps)) —
    moving averages trust the running estimate more as training settles.
    Returns a function of the (traced) step scalar."""

    def momentum(step):
        step = jnp.asarray(step, jnp.float32)
        exponent = jnp.floor(step / decay_steps)
        m = 1.0 - init_decay * jnp.power(decay_rate, exponent)
        return jnp.minimum(m, clip)

    return momentum


def reblend_batch_stats(old_stats, mutated_stats, m_new, m_model: float):
    """Exactly rewrite a momentum-``m_model`` moving-average update as a
    momentum-``m_new`` update (see module docstring). ``m_new`` may be a
    traced scalar."""
    inv = 1.0 / (1.0 - m_model)

    def blend(o, s):
        batch = (s - m_model * o) * inv
        return m_new * o + (1.0 - m_new) * batch

    return jax.tree.map(blend, old_stats, mutated_stats)
