"""GSPN — Generative Shape Proposal Network (CVAE), TPU-native.

Re-implements the reference's proposal model (``models/model_gspn.py``-
equivalent; reconstructed from the paper method section + SURVEY.md §2.2,
[K-PAPER]): per seed point,

(a) multi-scale context cropping — concentric spherical crops around the
    seed at ``context_radii``, each a fixed ``context_nsample`` points in
    the seed frame (ball query with replicate-first padding);
(b) center prediction — PointNet over the contexts regresses the instance
    center ``t``; contexts are re-centered at ``t``;
(c) CVAE — prior ``p(z|c)`` from the concatenated per-scale PointNet
    encodings ``c``; recognition ``q(z|x,c)`` additionally encodes the GT
    instance point set (training only); the generator decodes ``z (+) c``
    through FC layers into a fixed-size point cloud in the ``t`` frame;
(d) per-proposal objectness score.

Losses: chamfer(generated, GT instance) + KL(q || p) + center huber +
objectness BCE — see :func:`gspn_loss`.

Everything is batched over (scene, seed) with static shapes, so one XLA
program handles proposal generation for a whole scene with no host trips
(the BASELINE.json north-star fusion requirement).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence
from typing import Any

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from gspn_tpu import ops
from gspn_tpu.nn.layers import FCLayers, PointMLP, masked_max


@dataclasses.dataclass(frozen=True)
class GSPNConfig:
    """Architecture + cropping hyperparameters.

    Defaults are the ScanNet-scale setup; ShapeNet single-object pretrain
    uses :func:`shapenet_config`.
    """

    context_radii: tuple[float, ...] = (0.25, 0.5, 1.0)
    context_nsample: tuple[int, ...] = (64, 128, 256)
    encoder_mlp: tuple[int, ...] = (64, 128, 256)
    center_mlp: tuple[int, ...] = (64, 128, 256)
    center_fc: tuple[int, ...] = (256, 128)
    latent_dim: int = 128
    cond_dim: int = 256
    generator_fc: tuple[int, ...] = (256, 512)
    num_gen_points: int = 256
    objectness_fc: tuple[int, ...] = (128,)
    feature_dim: int = 0  # extra per-point input features (e.g. RGB)
    use_bn: bool = True
    # mesh-axis name for cross-shard BN train statistics (set by the
    # point/seed-sharded trainer, parallel/train_points.py; None = local)
    bn_axis: str | tuple[str, ...] | None = None
    ops_impl: str = "auto"
    # >1: segmented FPS approximation for SEED sampling where eligible
    # (the GSPN model itself never runs FPS — trainers and the fused
    # pipeline read this when drawing proposal seeds; see
    # ops.eligible_fps_segments and pipeline.shared_fps_indices)
    fps_segments: int = 1
    # how fps_segments partitions the scene: contiguous|strided|spatial
    # ("spatial" Morton-sorts inside the op — spatially tiled segments on
    # any data layout; see ops/fps.py)
    fps_segment_mode: str = "contiguous"
    # context-crop K-selection: "first" (reference first-K-in-input-order;
    # default) | "strided" (subsample-robust systematic sample of the full
    # candidate list — for spatially-coherent raw layouts where first-K
    # collapses a ball's crop to its z-lowest corner; ops/ball_query.py)
    group_select: str = "first"
    dtype: Any = jnp.float32


def shapenet_config(num_points: int = 1024, num_gen_points: int = 1024):
    """Single-object CVAE pretrain config (BASELINE.json config 1):
    the whole normalized object is one context at one centroid seed."""
    return GSPNConfig(
        context_radii=(2.0,),  # object is unit-normalized: one crop = all
        context_nsample=(num_points,),
        num_gen_points=num_gen_points,
    )


class _PointNetEncoder(nn.Module):
    """Shared-MLP + masked max-pool encoder over (..., K, C) groups."""

    mlp: Sequence[int]
    use_bn: bool
    dtype: Any
    bn_axis: str | tuple[str, ...] | None = None

    @nn.compact
    def __call__(self, pts, mask=None, train: bool = False):
        h = PointMLP(
            self.mlp, use_bn=self.use_bn, bn_axis=self.bn_axis,
            dtype=self.dtype, name="mlp",
        )(pts.astype(self.dtype), mask=mask, train=train)
        if mask is not None:
            return masked_max(h, mask, axis=-2)
        return jnp.max(h, axis=-2)


class _GaussianHead(nn.Module):
    """FC -> (mu, logvar)."""

    hidden: Sequence[int]
    latent: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = FCLayers(self.hidden, 2 * self.latent, dtype=self.dtype)(x, train)
        mu, logvar = jnp.split(out, 2, axis=-1)
        # clamp for numerical stability of exp/KL early in training
        return mu, jnp.clip(logvar, -10.0, 10.0)


@flax.struct.dataclass
class GSPNOutputs:
    center: jax.Array  # (B, S, 3) predicted instance centers (world frame)
    generated: jax.Array  # (B, S, G, 3) proposal shapes (world frame)
    objectness: jax.Array  # (B, S) logits
    prior_mu: jax.Array  # (B, S, L)
    prior_logvar: jax.Array
    q_mu: jax.Array | None  # present when GT was given (training)
    q_logvar: jax.Array | None
    cond: jax.Array  # (B, S, cond_dim) context encoding c


class GSPN(nn.Module):
    """The proposal network. ``apply`` signature mirrors the reference's
    ``get_model``: scene points + seed indices (+ GT instances when
    training) -> proposals."""

    config: GSPNConfig = GSPNConfig()

    @nn.compact
    def __call__(
        self,
        xyz,  # (B, N, 3) scene points
        seed_idx,  # (B, S) i32 indices into N
        features=None,  # (B, N, F) optional per-point features
        valid=None,  # (B, N) scene padding mask
        gt_points=None,  # (B, S, G, 3) GT instance points per seed (train)
        gt_valid=None,  # (B, S, G) mask
        z_rng=None,  # PRNG key for sampling z
        z_eps=None,  # (B, S, latent) pre-drawn N(0,1) noise (overrides z_rng;
        #              lets sharded and unsharded runs use identical noise)
        train: bool = False,
    ) -> GSPNOutputs:
        cfg = self.config
        nscales = len(cfg.context_radii)
        seed_xyz = ops.gather_point(xyz, seed_idx)  # (B, S, 3)

        # ---- (a) multi-scale context crops in the seed frame; the fused
        # kernel shares one distance pass across concentric radii and
        # emits local coordinates directly (query + gather + re-center)
        per_scale = ops.query_ball_group_multi(
            cfg.context_radii,
            cfg.context_nsample,
            xyz,
            seed_xyz,
            valid,
            impl=cfg.ops_impl,
            select=cfg.group_select,
        )
        crops = []  # per scale: (B, S, K_s, 3 [+F])
        for idx, cnt, local in per_scale:
            if features is not None and cfg.feature_dim > 0:
                local = jnp.concatenate(
                    [local, ops.group_point(features, idx)], axis=-1
                )
            crops.append(local)

        # ---- (b) center prediction from the coarsest (largest) context
        cen_feat = _PointNetEncoder(
            cfg.center_mlp, cfg.use_bn, cfg.dtype, bn_axis=cfg.bn_axis,
            name="center_enc",
        )(crops[-1], train=train)
        offset = FCLayers(
            cfg.center_fc, 3, dtype=cfg.dtype, name="center_fc"
        )(cen_feat, train)
        center = seed_xyz + offset.astype(seed_xyz.dtype)

        # ---- re-center contexts at t and encode each scale
        encs = []
        for s in range(nscales):
            rec = crops[s].at[..., 0:3].add(-offset[:, :, None, :])
            encs.append(
                _PointNetEncoder(
                    cfg.encoder_mlp, cfg.use_bn, cfg.dtype,
                    bn_axis=cfg.bn_axis, name=f"ctx_enc_{s}",
                )(rec, train=train)
            )
        cond = FCLayers(
            (), cfg.cond_dim, dtype=cfg.dtype, name="cond_fc"
        )(jnp.concatenate(encs, axis=-1), train)
        cond = nn.relu(cond)

        # ---- (c) CVAE
        prior_mu, prior_logvar = _GaussianHead(
            (cfg.cond_dim,), cfg.latent_dim, cfg.dtype, name="prior"
        )(cond, train)

        q_mu = q_logvar = None
        if gt_points is not None:
            gt_local = gt_points - center[:, :, None, :]
            gt_feat = _PointNetEncoder(
                cfg.encoder_mlp, cfg.use_bn, cfg.dtype, bn_axis=cfg.bn_axis,
                name="recog_enc",
            )(gt_local, mask=gt_valid, train=train)
            q_mu, q_logvar = _GaussianHead(
                (cfg.cond_dim,),
                cfg.latent_dim,
                cfg.dtype,
                name="recognition",
            )(jnp.concatenate([gt_feat, cond], axis=-1), train)

        if z_eps is not None:
            eps = z_eps.astype(jnp.float32)
        elif z_rng is not None:
            eps = jax.random.normal(
                z_rng, prior_mu.shape[:-1] + (cfg.latent_dim,), jnp.float32
            )
        else:
            raise ValueError("pass z_rng (PRNG key) or z_eps (noise)")
        if q_mu is not None:  # training: reparameterized sample from q
            z = q_mu + eps * jnp.exp(0.5 * q_logvar)
        else:  # inference: sample from the learned prior
            z = prior_mu + eps * jnp.exp(0.5 * prior_logvar)

        # ---- generator: z (+) c -> fixed-size shape in the t frame
        gen = FCLayers(
            cfg.generator_fc,
            cfg.num_gen_points * 3,
            dtype=cfg.dtype,
            name="generator",
        )(jnp.concatenate([z.astype(cfg.dtype), cond], axis=-1), train)
        gen = gen.reshape(gen.shape[:-1] + (cfg.num_gen_points, 3))
        generated = gen.astype(jnp.float32) + center[:, :, None, :]

        # ---- (d) objectness
        objectness = FCLayers(
            cfg.objectness_fc, 1, dtype=cfg.dtype, name="objectness"
        )(cond, train)[..., 0]

        return GSPNOutputs(
            center=center,
            generated=generated,
            objectness=objectness.astype(jnp.float32),
            prior_mu=prior_mu.astype(jnp.float32),
            prior_logvar=prior_logvar.astype(jnp.float32),
            q_mu=None if q_mu is None else q_mu.astype(jnp.float32),
            q_logvar=None if q_logvar is None else q_logvar.astype(jnp.float32),
            cond=cond,
        )


# ---------------------------------------------------------------------------
# Losses (reference ``get_loss`` parity)
# ---------------------------------------------------------------------------


def kl_gaussians(mu_q, logvar_q, mu_p, logvar_p):
    """KL(q || p) between diagonal Gaussians, summed over latent dim."""
    var_q = jnp.exp(logvar_q)
    var_p = jnp.exp(logvar_p)
    kl = 0.5 * (
        logvar_p
        - logvar_q
        + (var_q + (mu_q - mu_p) ** 2) / var_p
        - 1.0
    )
    return jnp.sum(kl, axis=-1)


def huber(x, delta: float = 1.0):
    a = jnp.abs(x)
    return jnp.where(a <= delta, 0.5 * x * x, delta * (a - 0.5 * delta))


def masked_chamfer(pred, gt, gt_valid, impl: str = "auto"):
    """Per-seed symmetric chamfer: pred (B,S,G,3), gt (B,S,Ggt,3) with
    gt_valid (B,S,Ggt) -> (B,S)."""
    b, s, g, _ = pred.shape
    p = pred.reshape(b * s, g, 3)
    t = gt.reshape(b * s, gt.shape[2], 3)
    v = gt_valid.reshape(b * s, gt.shape[2])
    d1, _, d2, _ = ops.nn_distance(p, t, valid2=v, impl=impl)
    l1 = jnp.mean(d1, axis=-1)
    w = v.astype(d2.dtype)
    l2 = jnp.sum(d2 * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    return (l1 + l2).reshape(b, s)


def gspn_loss(
    out: GSPNOutputs,
    gt_points,  # (B, S, G, 3)
    gt_valid,  # (B, S, G)
    gt_center,  # (B, S, 3)
    seed_objectness,  # (B, S) {0, 1} — seed lies on a real instance
    seed_valid=None,  # (B, S) mask for padded seeds
    kl_weight: float = 1.0,
    center_weight: float = 1.0,
    obj_weight: float = 1.0,
    chamfer_weight: float = 1.0,
    impl: str = "auto",
    axis_name: str | tuple[str, ...] | None = None,
):
    """Total CVAE loss + per-term metrics dict. Positive-seed terms
    (chamfer, KL, center) are averaged over positive seeds only; the
    objectness BCE covers all valid seeds, as in the reference.

    ``axis_name``: mesh axis the SEEDS are sharded over (inside
    ``shard_map``) — numerators and seed counts are ``psum``-ed so every
    shard computes the identical global loss (parallel/train_points.py).
    """
    pos = seed_objectness.astype(jnp.float32)
    if seed_valid is not None:
        sv = seed_valid.astype(jnp.float32)
        pos = pos * sv
    else:
        sv = jnp.ones_like(pos)

    ch = masked_chamfer(out.generated, gt_points, gt_valid, impl)
    assert out.q_mu is not None, "gspn_loss requires recognition-net outputs"
    kl = kl_gaussians(out.q_mu, out.q_logvar, out.prior_mu, out.prior_logvar)
    cerr = jnp.sum(huber(out.center - gt_center), axis=-1)
    obj_bce = optax_sigmoid_bce(out.objectness, seed_objectness.astype(jnp.float32))

    sums = (
        jnp.sum(pos),
        jnp.sum(sv),
        jnp.sum(ch * pos),
        jnp.sum(kl * pos),
        jnp.sum(cerr * pos),
        jnp.sum(obj_bce * sv),
    )
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
    npos_raw, nval_raw, ch_sum, kl_sum, cen_sum, obj_sum = sums
    npos = jnp.maximum(npos_raw, 1.0)
    nval = jnp.maximum(nval_raw, 1.0)
    chamfer_term = ch_sum / npos
    kl_term = kl_sum / npos
    center_term = cen_sum / npos
    obj_term = obj_sum / nval

    total = (
        chamfer_weight * chamfer_term
        + kl_weight * kl_term
        + center_weight * center_term
        + obj_weight * obj_term
    )
    return total, {
        "loss": total,
        "chamfer": chamfer_term,
        "kl": kl_term,
        "center": center_term,
        "objectness": obj_term,
    }


def optax_sigmoid_bce(logits, labels):
    # inline to avoid importing optax in the model layer
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -labels * log_p - (1.0 - labels) * log_not_p


def proposal_boxes(
    generated: jax.Array, margin: float = 0.1, percentile: float = 0.0
) -> jax.Array:
    """Axis-aligned RoI boxes from generated-shape extents (+margin),
    (B, S, G, 3) -> (B, S, 6) — the reference's proposal->box rule.

    percentile > 0 trims that fraction of outlier points per side before
    taking extents (robust variant for loosely-trained generators; 0 =
    exact reference min/max semantics)."""
    if percentile > 0.0:
        lo = jnp.quantile(generated, percentile, axis=-2) - margin
        hi = jnp.quantile(generated, 1.0 - percentile, axis=-2) + margin
    else:
        lo = jnp.min(generated, axis=-2) - margin
        hi = jnp.max(generated, axis=-2) + margin
    return jnp.concatenate([lo, hi], axis=-1)
