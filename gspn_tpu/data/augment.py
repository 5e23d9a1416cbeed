"""Train-time augmentation, on-device (the reference augments host-side in
NumPy per batch — rotation about z, jitter, flip; SURVEY.md §2.2). Running
it inside the jitted step keeps the host out of the hot loop."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def augment_scene(rng, xyz, valid=None, *, rot_z=True, flip=True,
                  jitter_sigma=0.01, jitter_clip=0.05, scale_range=(0.9, 1.1)):
    """Random z-rotation + axis flips + anisotropic-free scale + point jitter.

    xyz (B, N, 3) -> augmented (B, N, 3); per-batch-element transforms.
    Padded points get transformed too (harmless — they stay masked).
    """
    b = xyz.shape[0]
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    out = xyz

    if rot_z:
        theta = jax.random.uniform(k1, (b,), minval=0.0, maxval=2 * jnp.pi)
        c, s = jnp.cos(theta), jnp.sin(theta)
        x, y, z = out[..., 0], out[..., 1], out[..., 2]
        out = jnp.stack(
            [
                c[:, None] * x - s[:, None] * y,
                s[:, None] * x + c[:, None] * y,
                z,
            ],
            axis=-1,
        )
    if flip:
        fl = jax.random.bernoulli(k2, 0.5, (b, 1, 2)).astype(out.dtype)
        sign = 1.0 - 2.0 * fl  # ±1 for x and y
        out = out.at[..., 0:2].multiply(sign)
    if scale_range is not None:
        sc = jax.random.uniform(
            k3, (b, 1, 1), minval=scale_range[0], maxval=scale_range[1]
        )
        out = out * sc
    if jitter_sigma:
        noise = jnp.clip(
            jax.random.normal(k4, out.shape) * jitter_sigma,
            -jitter_clip,
            jitter_clip,
        )
        out = out + noise
    if valid is not None:
        out = jnp.where(valid[..., None], out, 0.0)
    return out
