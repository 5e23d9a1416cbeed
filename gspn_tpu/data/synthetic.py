"""Synthetic point-cloud data: parametric single objects (ShapeNet-style)
and multi-instance scenes (ScanNet-style) for tests and benchmarks.

The reference trains on real ScanNet/ShapeNet/PartNet dumps; those loaders
live in their own modules. The synthetic generators produce the exact same
fixed-shape array layout, so every downstream stage is format-agnostic.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Scene:
    """Fixed-shape scene arrays (host side, NumPy)."""

    xyz: np.ndarray  # (N, 3) f32
    features: np.ndarray  # (N, F) f32 (F may be 0)
    valid: np.ndarray  # (N,) bool
    sem_label: np.ndarray  # (N,) i32, 0 = background
    inst_label: np.ndarray  # (N,) i32, 0 = no instance, 1..I
    num_instances: int


def single_object(rng: np.random.Generator, n: int, kind: str | None = None):
    """One normalized object surface (unit-ish scale, centered): box,
    sphere, or cylinder with distinct aspect ratios — enough structure for
    a CVAE to learn shape modes."""
    kind = kind or rng.choice(["box", "sphere", "cylinder"])
    if kind == "sphere":
        v = rng.standard_normal((n, 3))
        pts = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-9)
        pts *= 0.5
    elif kind == "cylinder":
        theta = rng.uniform(0, 2 * np.pi, n)
        z = rng.uniform(-0.5, 0.5, n)
        pts = np.stack([0.3 * np.cos(theta), 0.3 * np.sin(theta), z], 1)
    else:  # box surface
        face = rng.integers(0, 6, n)
        uv = rng.uniform(-0.5, 0.5, (n, 2))
        pts = np.zeros((n, 3))
        axis = face // 2
        sign = np.where(face % 2 == 0, -0.5, 0.5)
        for a in range(3):
            sel = axis == a
            others = [i for i in range(3) if i != a]
            pts[sel, a] = sign[sel]
            pts[sel, others[0]] = uv[sel, 0]
            pts[sel, others[1]] = uv[sel, 1]
    scale = rng.uniform(0.7, 1.3, (1, 3))
    return (pts * scale).astype(np.float32), kind


_KINDS = ["box", "sphere", "cylinder"]


def scene(
    rng: np.random.Generator,
    n_points: int = 4096,
    max_instances: int = 8,
    extent: float = 4.0,
    bg_frac: float = 0.3,
    feature_dim: int = 0,
) -> Scene:
    """A room: floor clutter (background) + several object instances.

    Semantic label = 1 + kind index for instances, 0 for background.
    Instance label = 1..I for instances, 0 for background.
    """
    n_inst = int(rng.integers(2, max_instances + 1))
    n_bg = int(n_points * bg_frac)
    n_per = (n_points - n_bg) // n_inst
    xyz, sem, inst = [], [], []

    bg = rng.uniform(0, extent, (n_bg, 3)).astype(np.float32)
    bg[:, 2] = np.abs(rng.standard_normal(n_bg).astype(np.float32)) * 0.02
    xyz.append(bg)
    sem.append(np.zeros(n_bg, np.int32))
    inst.append(np.zeros(n_bg, np.int32))

    for i in range(n_inst):
        pts, kind = single_object(rng, n_per)
        size = rng.uniform(0.3, 0.8)
        loc = rng.uniform(0.7, extent - 0.7, 3).astype(np.float32)
        loc[2] = size * 0.5
        pts = pts * size + loc
        xyz.append(pts.astype(np.float32))
        sem.append(np.full(n_per, 1 + _KINDS.index(kind), np.int32))
        inst.append(np.full(n_per, i + 1, np.int32))

    xyz = np.concatenate(xyz)
    sem = np.concatenate(sem)
    inst = np.concatenate(inst)
    # pad to exactly n_points
    pad = n_points - xyz.shape[0]
    if pad > 0:
        xyz = np.concatenate([xyz, np.zeros((pad, 3), np.float32)])
        sem = np.concatenate([sem, np.zeros(pad, np.int32)])
        inst = np.concatenate([inst, np.zeros(pad, np.int32)])
    valid = np.ones(n_points, bool)
    if pad > 0:
        valid[-pad:] = False
    # shuffle so FPS's seed-0 convention isn't biased to background
    perm = rng.permutation(n_points)
    feats = (
        rng.uniform(0, 1, (n_points, feature_dim)).astype(np.float32)
        if feature_dim
        else np.zeros((n_points, 0), np.float32)
    )
    return Scene(
        xyz=xyz[perm],
        features=feats,
        valid=valid[perm],
        sem_label=sem[perm],
        inst_label=inst[perm],
        num_instances=n_inst,
    )


def scene_batch(rng, batch: int, **kw):
    """Stack ``batch`` scenes into (B, ...) arrays -> dict of np arrays."""
    scenes = [scene(rng, **kw) for _ in range(batch)]
    return {
        "xyz": np.stack([s.xyz for s in scenes]),
        "features": np.stack([s.features for s in scenes]),
        "valid": np.stack([s.valid for s in scenes]),
        "sem_label": np.stack([s.sem_label for s in scenes]),
        "inst_label": np.stack([s.inst_label for s in scenes]),
    }


def object_batch(rng, batch: int, n: int, kind: str | None = None):
    """(B, N, 3) normalized single objects + kind ids, for CVAE pretrain."""
    pts, kinds = [], []
    for _ in range(batch):
        p, k = single_object(rng, n, kind)
        pts.append(p)
        kinds.append(_KINDS.index(k))
    return np.stack(pts), np.asarray(kinds, np.int32)


def object_scene_batch(rng, batch: int, n_points: int, kind: str | None = None):
    """Single objects in the standard scene layout (whole object = one
    instance) — the BASELINE config-1 workload (single-object CVAE
    reconstruction) without needing ShapeNet h5 files on disk."""
    pts, kinds = object_batch(rng, batch, n_points, kind)
    return {
        "xyz": pts.astype(np.float32),
        "features": np.zeros((batch, n_points, 0), np.float32),
        "valid": np.ones((batch, n_points), bool),
        "sem_label": np.tile((kinds + 1)[:, None], (1, n_points)).astype(np.int32),
        "inst_label": np.ones((batch, n_points), np.int32),
    }
