"""PartNet part-instance workload loader (HDF5) — BASELINE.json config 5's
second dataset. Part instances play the role of scene object instances.

Expects PartNet ins_seg h5 layout: ``pts (B, N, 3)``, per-point semantic
``label`` (or ``sem_label``) and instance ``ins_label`` (or
``inst_label``); key names are probed.
"""

from __future__ import annotations

import pathlib

import numpy as np

_PTS_KEYS = ("pts", "data", "points")
_SEM_KEYS = ("label", "sem_label", "label_seg", "semantic")
_INS_KEYS = ("ins_label", "inst_label", "instance", "pid")


def _pick(f, keys):
    for k in keys:
        if k in f:
            return k
    raise KeyError(f"none of {keys} in h5 file (has {list(f.keys())})")


class PartNetParts:
    def __init__(self, h5_dir: str, num_points: int = 4096):
        import h5py

        paths = sorted(pathlib.Path(h5_dir).glob("*.h5"))
        if not paths:
            raise FileNotFoundError(f"no .h5 files under {h5_dir}")
        pts, sem, ins = [], [], []
        for p in paths:
            with h5py.File(p, "r") as f:
                pk = _pick(f, _PTS_KEYS)
                sk = _pick(f, _SEM_KEYS)
                ik = _pick(f, _INS_KEYS)
                pts.append(np.asarray(f[pk][:], np.float32))
                sem.append(np.asarray(f[sk][:], np.int32))
                ins.append(np.asarray(f[ik][:], np.int32))
        self.pts = np.concatenate(pts)
        self.sem = np.concatenate(sem)
        self.ins = np.concatenate(ins)
        self.num_points = num_points

    def __len__(self):
        return len(self.pts)

    def sample_batch(self, rng: np.random.Generator, batch: int) -> dict:
        idx = rng.integers(0, len(self.pts), batch)
        pts, sem, ins = self.pts[idx], self.sem[idx], self.ins[idx]
        n = pts.shape[1]
        if n >= self.num_points:
            cols = rng.choice(n, self.num_points, replace=False)
            pts, sem, ins = pts[:, cols], sem[:, cols], ins[:, cols]
        else:
            reps = rng.integers(0, n, self.num_points - n)
            pts = np.concatenate([pts, pts[:, reps]], axis=1)
            sem = np.concatenate([sem, sem[:, reps]], axis=1)
            ins = np.concatenate([ins, ins[:, reps]], axis=1)
        # normalize ids: instances 1..K (0 = unassigned), semantics >= 0
        ins = np.where(ins >= 0, ins + 1, 0).astype(np.int32)
        sem = np.maximum(sem, 0).astype(np.int32)
        b, npts = pts.shape[0], pts.shape[1]
        return {
            "xyz": pts.astype(np.float32),
            "features": np.zeros((b, npts, 0), np.float32),
            "valid": np.ones((b, npts), bool),
            "sem_label": sem,
            "inst_label": ins,
        }
