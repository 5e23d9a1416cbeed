"""ShapeNet single-object loader (HDF5) — CVAE pretrain / eval workload
(BASELINE.json config 1: ShapeNet chair, N=1024).

Expects pointnet2-style h5 files: datasets ``data (B, N, 3)`` and
``label (B,)`` (category id). A category filter selects e.g. chairs.
"""

from __future__ import annotations

import pathlib

import numpy as np


class ShapeNetObjects:
    def __init__(
        self,
        h5_dir: str,
        num_points: int = 1024,
        category: int | None = None,
        normalize: bool = True,
    ):
        import h5py

        paths = sorted(pathlib.Path(h5_dir).glob("*.h5"))
        if not paths:
            raise FileNotFoundError(f"no .h5 files under {h5_dir}")
        datas, labels = [], []
        for p in paths:
            with h5py.File(p, "r") as f:
                datas.append(np.asarray(f["data"][:], np.float32))
                labels.append(np.asarray(f["label"][:]).reshape(-1).astype(np.int32))
        self.data = np.concatenate(datas)
        self.label = np.concatenate(labels)
        if category is not None:
            sel = self.label == category
            self.data, self.label = self.data[sel], self.label[sel]
        self.num_points = num_points
        if normalize:
            centroid = self.data.mean(axis=1, keepdims=True)
            self.data = self.data - centroid
            scale = np.abs(self.data).max(axis=(1, 2), keepdims=True)
            self.data = self.data / np.maximum(scale, 1e-9)

    def __len__(self):
        return len(self.data)

    def sample_batch(self, rng: np.random.Generator, batch: int) -> dict:
        """Batch in the standard scene layout: the whole object is one
        instance (id 1) so the CVAE trainer can consume it unchanged."""
        idx = rng.integers(0, len(self.data), batch)
        pts = self.data[idx]
        n = pts.shape[1]
        if n >= self.num_points:
            cols = rng.choice(n, self.num_points, replace=False)
            pts = pts[:, cols]
        else:
            reps = rng.integers(0, n, self.num_points - n)
            pts = np.concatenate([pts, pts[:, reps]], axis=1)
        b, npts = pts.shape[0], pts.shape[1]
        return {
            "xyz": pts.astype(np.float32),
            "features": np.zeros((b, npts, 0), np.float32),
            "valid": np.ones((b, npts), bool),
            "sem_label": np.ones((b, npts), np.int32),
            "inst_label": np.ones((b, npts), np.int32),
        }
