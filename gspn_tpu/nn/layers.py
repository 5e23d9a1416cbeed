"""Layer helpers — replaces the reference's ``utils/tf_util.py``.

The reference's ``conv2d`` with 1x1 kernels over ``(B, npoint, nsample, C)``
is a per-point shared MLP, i.e. a matmul in disguise; here it is written as
``nn.Dense`` on the last axis so XLA maps it straight onto the MXU and fuses
the bias/BN/ReLU epilogue. Batch norm follows the reference's conv-BN idiom
(stats over all non-channel axes, moving averages for inference) extended
with an optional validity mask so padded points never pollute statistics —
the reference has no padding, so with a full mask this reduces exactly to
its behavior.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# The single source of truth for the model-level BatchNorm momentum. The
# trainers' bn-decay reblend (train/schedules.py, train/steps.py) must
# invert exactly this value to recover raw batch statistics — import it
# there rather than repeating the literal.
BN_MOMENTUM = 0.9


class MaskedBatchNorm(nn.Module):
    """Batch norm over all non-channel axes with optional validity mask.

    Mirrors ``tf_util.batch_norm_for_conv2d`` (moving-average inference
    stats); ``momentum`` plays the role of the reference's ``bn_decay``.

    ``axis_name``: name of a mapped/sharded mesh axis (inside
    ``shard_map``) to compute train statistics over — partial sums and
    counts are ``psum``-ed so sharded training sees exactly the
    single-device reduction set (same convention as
    ``flax.linen.BatchNorm(axis_name=...)``). Inference stats are the
    stored running averages either way.
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = 1e-3  # TF1 batch_norm default, as tf_util used it
    axis_name: str | tuple[str, ...] | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        xf = x.astype(jnp.float32)
        if train:
            red = tuple(range(x.ndim - 1))
            if mask is None:
                w = None
                tot = jnp.asarray(float(x.size // c), jnp.float32)
                s1 = jnp.sum(xf, axis=red)
                s2 = jnp.sum(xf * xf, axis=red)
            else:
                w = mask.astype(jnp.float32)[..., None]
                tot = jnp.sum(w)
                s1 = jnp.sum(xf * w, axis=red)
                s2 = jnp.sum(xf * xf * w, axis=red)
            if self.axis_name is not None:
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
                tot = jax.lax.psum(tot, self.axis_name)
            tot = jnp.maximum(tot, 1.0)
            mean = s1 / tot
            mean2 = s2 / tot
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class PointMLP(nn.Module):
    """Shared per-point MLP: stack of Dense(+BN)+ReLU on the channel axis.

    Replaces the reference's ``for ch in mlp: tf_util.conv2d(1x1)`` stacks
    (``pointnet_util.py``). Works on any ``(..., C)`` input.
    """

    features: Sequence[int]
    use_bn: bool = True
    bn_momentum: float = BN_MOMENTUM
    bn_axis: str | tuple[str, ...] | None = None  # cross-shard BN stats (see MaskedBatchNorm)
    last_activation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        # Flatten leading dims so XLA sees one plain (M, C) matmul per
        # layer instead of a rank-4 dot_general over (B, P, K, C)
        # (measured on v5e: sa1's MLP+max 2.22 -> ~1.5 ms standalone).
        # BN reductions cover the same element set either way, so eval
        # numerics are bit-identical and train stats equal up to f32
        # reduction order.
        lead = x.shape[:-1]
        x = x.reshape(-1, x.shape[-1])
        if mask is not None:
            mask = jnp.broadcast_to(mask, lead).reshape(-1)
        n = len(self.features)
        for i, ch in enumerate(self.features):
            x = nn.Dense(
                ch,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.glorot_uniform(),
                name=f"dense_{i}",
            )(x)
            last = i == n - 1
            if self.use_bn:
                x = MaskedBatchNorm(
                    momentum=self.bn_momentum, axis_name=self.bn_axis,
                    dtype=self.dtype, name=f"bn_{i}",
                )(x, mask=mask, train=train)
            if not last or self.last_activation:
                x = nn.relu(x)
        return x.reshape(*lead, x.shape[-1])


class FCLayers(nn.Module):
    """Fully-connected head: Dense(+BN)+ReLU stack, then a linear output.

    Replaces ``tf_util.fully_connected`` chains in the reference heads.
    ``hidden`` layers get activation; ``out`` is linear (logits/regression).
    """

    hidden: Sequence[int]
    out: int
    use_bn: bool = False
    bn_axis: str | tuple[str, ...] | None = None  # cross-shard BN stats (see MaskedBatchNorm)
    dropout: float = 0.0  # reference: tf_util.dropout before head outputs
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate(self.hidden):
            x = nn.Dense(
                ch,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.glorot_uniform(),
                name=f"fc_{i}",
            )(x)
            if self.use_bn:
                x = MaskedBatchNorm(
                    axis_name=self.bn_axis, dtype=self.dtype, name=f"bn_{i}"
                )(x, train=train)
            x = nn.relu(x)
            if self.dropout > 0.0:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return nn.Dense(
            self.out,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.glorot_uniform(),
            name="fc_out",
        )(x)


def masked_max(x, mask, axis: int):
    """Max-pool that ignores masked-out entries.

    ``mask`` broadcasts against x without the channel dim. Rows with no
    valid entry return 0 (matching a maxpool over all-replicated padding).
    """
    neg = jnp.asarray(-1e10, x.dtype)
    m = mask[..., None]  # expand to x's rank so `axis` means the same thing
    ax = axis % x.ndim
    xm = jnp.where(m, x, neg)
    out = jnp.max(xm, axis=ax)
    any_valid = jnp.any(m, axis=ax)  # (..., 1), broadcasts over channels
    return jnp.where(any_valid, out, jnp.zeros_like(out))


def masked_mean(x, mask, axis: int):
    w = mask.astype(x.dtype)[..., None]
    ax = axis % x.ndim
    tot = jnp.maximum(jnp.sum(w, axis=ax), 1.0)
    return jnp.sum(x * w, axis=ax) / tot
