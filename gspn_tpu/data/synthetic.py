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
    density: str = "count",
    size_range: tuple[float, float] = (0.3, 0.8),
    bg_mode: str = "floor",
) -> Scene:
    """A room: floor clutter (background) + several object instances.

    Semantic label = 1 + kind index for instances, 0 for background.
    Instance label = 1..I for instances, 0 for background.

    ``density`` controls how points split between background and
    instances (the round-5 generator-family axis — VERDICT r4 #2: the
    spatial-seg8 default's AP evidence must not rest on one generator's
    instances-denser-than-background construction):
      - "count" (default, round-1..4 behavior, rng-sequence-identical):
        ``bg_frac`` of points to background, the rest split EQUALLY
        across instances — instances end up much denser than background.
      - "area": points allocated proportionally to surface area
        (floor ~ extent^2 vs instance ~ 3*size^2), one shared density —
        the neutral-density family (instances no longer density-marked).
      - "sparse": like "area" but instances sample at HALF the
        background density — the adversarial family (density marks the
        background instead).
    ``bg_mode``: "floor" (default; clutter on the ground plane) or
    "volume" (uniform 3-D noise — no floor structure).
    """
    n_inst = int(rng.integers(2, max_instances + 1))
    if density == "count":
        n_bg = int(n_points * bg_frac)
        counts = [(n_points - n_bg) // n_inst] * n_inst
        sizes = None  # drawn inside the loop: keeps the default rng
        #               sequence bit-identical to rounds 1-4 (frozen
        #               fixtures + AP ladders depend on it)
    elif density in ("area", "sparse"):
        sizes = rng.uniform(size_range[0], size_range[1], n_inst)
        floor_area = extent * extent
        inst_area = 3.0 * sizes**2  # rough unit-shape surface scale
        w = np.concatenate([[floor_area], inst_area])
        if density == "sparse":
            w[1:] *= 0.5
        w = w / w.sum()
        counts = np.maximum((n_points * w[1:]).astype(int), 16)
        n_bg = n_points - int(counts.sum())
        if n_bg < 0:  # tiny scenes: shrink instances to fit
            counts = np.maximum(
                (counts * n_points) // (counts.sum() + 16), 8
            )
            # the 8-point floor can still overflow a tiny budget, and the
            # final xyz[perm] would then silently truncate the tail —
            # dropping whole instances while num_instances still counts
            # them (ghost GTs in eval). Drop instances from the end, then
            # trim the largest counts, so labels always match the points.
            while len(counts) > 1 and counts.sum() > n_points:
                counts = counts[:-1]
            if counts.sum() > n_points:
                counts[0] = n_points
            n_inst = len(counts)
            sizes = sizes[:n_inst]
            n_bg = max(n_points - int(counts.sum()), 0)
        counts = list(counts)
    else:
        raise ValueError(f"density must be count|area|sparse, got {density!r}")
    xyz, sem, inst = [], [], []

    if bg_mode == "floor":
        bg = rng.uniform(0, extent, (n_bg, 3)).astype(np.float32)
        bg[:, 2] = np.abs(rng.standard_normal(n_bg).astype(np.float32)) * 0.02
    elif bg_mode == "volume":
        bg = rng.uniform(0, extent, (n_bg, 3)).astype(np.float32)
        bg[:, 2] *= 0.5  # room height ~ extent/2
    else:
        raise ValueError(f"bg_mode must be floor|volume, got {bg_mode!r}")
    xyz.append(bg)
    sem.append(np.zeros(n_bg, np.int32))
    inst.append(np.zeros(n_bg, np.int32))

    for i in range(n_inst):
        n_per = counts[i]
        pts, kind = single_object(rng, n_per)
        size = (
            rng.uniform(size_range[0], size_range[1])
            if sizes is None
            else float(sizes[i])
        )
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


# Generator families for the spatial-segmented-FPS stress matrix
# (VERDICT r4 #2). "default" is the rounds-1..4 generator whose
# instances are denser than background by construction — exactly the
# property the spatial mode's equal-count Morton tiles key on; the
# others vary or invert it. Keys are CLI-facing (run_eval --family,
# scripts/stress_segfps_families.py).
FAMILIES: dict[str, dict] = {
    "default": {},
    "uniform": {"density": "area"},  # instances at background density
    "sparse": {"density": "sparse"},  # ADVERSARIAL: instances sparser
    "heavy_bg": {"bg_frac": 0.7},  # background dominates the count
    "many_small": {"max_instances": 16, "size_range": (0.15, 0.35)},
    "few_large": {"max_instances": 3, "size_range": (0.8, 1.4)},
    "volume_bg": {"bg_mode": "volume"},  # no floor structure
}


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
