"""Probability (inverse-CDF) sampling — ``prob_sample``.

Reference parity (``tf_ops/sampling/tf_sampling.cpp::ProbSample`` with
``cumsumKernel`` + ``binarysearchKernel`` — reconstructed, SURVEY.md §2.1):

``prob_sample(inps, inp_r)``: per-row categorical sampling by inverse CDF.
``inps (B, N)`` are non-negative weights (need not be normalized — the
search target is scaled by the row total, matching the reference's cumsum
over unnormalized inputs), ``inp_r (B, M)`` are uniforms in ``[0, 1)``.
Returns ``(B, M) i32``: the first index whose inclusive cumsum reaches
``r * total``.

``random_prob_sample`` is the convenience wrapper that draws the uniforms
from a JAX PRNG key (the reference drew them host-side; parity is "up to
sampling seeds" per BASELINE.json).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def prob_sample(inps: jax.Array, inp_r: jax.Array) -> jax.Array:
    """Inverse-CDF categorical sampling. inps (B,N) weights, inp_r (B,M)
    uniforms in [0,1) -> (B,M) int32 indices."""
    cdf = jnp.cumsum(inps.astype(jnp.float32), axis=-1)  # (B, N)
    total = cdf[..., -1:]
    target = inp_r.astype(jnp.float32) * total  # (B, M)
    # first index with cdf >= target  (binary search in the reference)
    idx = jax.vmap(
        lambda c, t: jnp.searchsorted(c, t, side="left", method="scan_unrolled")
    )(cdf, target)
    return jnp.minimum(idx, inps.shape[-1] - 1).astype(jnp.int32)


def random_prob_sample(key: jax.Array, inps: jax.Array, m: int) -> jax.Array:
    """Draw m samples per row from weights ``inps (B, N)`` -> (B, m) i32."""
    r = jax.random.uniform(key, (inps.shape[0], m), dtype=jnp.float32)
    return prob_sample(inps, r)
