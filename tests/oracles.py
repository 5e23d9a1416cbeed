"""NumPy oracles implementing the reference ops' behavioral contracts
literally (sequential scans, exactly as SURVEY.md §2.1 specifies them).
These stand in for reference outputs while /root/reference is empty; every
claim about semantics (seed-0 FPS, replicate-first ball-query padding,
first-come order, capped counts, squared distances) is encoded here.
"""

from __future__ import annotations

import numpy as np


def fps_oracle(npoint: int, xyz: np.ndarray, valid: np.ndarray | None = None):
    """Greedy FPS, seed = first valid index, ties -> lowest index."""
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), np.int32)
    for bi in range(b):
        v = np.ones(n, bool) if valid is None else valid[bi].astype(bool)
        mind = np.where(v, 1e10, -1.0).astype(np.float32)
        prev = int(np.argmax(v))
        out[bi, 0] = prev
        for i in range(1, npoint):
            d = np.sum((xyz[bi] - xyz[bi, prev]) ** 2, axis=-1).astype(np.float32)
            mind = np.minimum(mind, d)
            mind[~v] = -1.0
            prev = int(np.argmax(mind))  # np.argmax ties -> lowest index
            out[bi, i] = prev
    return out


def ball_query_oracle(radius, nsample, xyz1, xyz2, valid1=None,
                      select="first"):
    """Sequential scan in input order; replicate-first padding; capped
    count. select="strided": systematic sample of the FULL ascending
    candidate list (``hits[floor(j * total / nsample)]``) once a query
    has more than ``nsample`` candidates — identical to first-K
    otherwise; cnt is min(total, nsample) either way."""
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    idx = np.zeros((b, m, nsample), np.int32)
    cnt = np.zeros((b, m), np.int32)
    r2 = radius * radius
    for bi in range(b):
        v = np.ones(n, bool) if valid1 is None else valid1[bi].astype(bool)
        for mi in range(m):
            hits = []
            for j in range(n):
                if select == "first" and len(hits) == nsample:
                    break
                if not v[j]:
                    continue
                d = np.sum((xyz1[bi, j] - xyz2[bi, mi]) ** 2, dtype=np.float32)
                if d < r2:
                    hits.append(j)
            total = len(hits)
            if select == "strided" and total > nsample:
                hits = [hits[(j * total) // nsample] for j in range(nsample)]
            c = min(total, nsample)
            if c > 0:
                idx[bi, mi, :] = hits[0]
                idx[bi, mi, :c] = hits[:c]
            cnt[bi, mi] = c
    return idx, cnt


def knn_oracle(k, xyz1, xyz2, valid1=None):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    dist = np.zeros((b, m, k), np.float32)
    idx = np.zeros((b, m, k), np.int32)
    for bi in range(b):
        d2 = np.sum(
            (xyz2[bi][:, None, :] - xyz1[bi][None, :, :]) ** 2, axis=-1
        ).astype(np.float32)
        if valid1 is not None:
            d2[:, ~valid1[bi].astype(bool)] = 1e10
        # stable argsort on distance -> ties break to lowest index
        order = np.argsort(d2, axis=-1, kind="stable")[:, :k]
        idx[bi] = order
        dist[bi] = np.take_along_axis(d2, order, axis=-1)
    return dist, idx


def three_nn_oracle(xyz1, xyz2, valid2=None):
    d, i = knn_oracle(3, xyz2, xyz1, valid2)
    return d, i


def nn_distance_oracle(xyz1, xyz2):
    b = xyz1.shape[0]
    d1 = np.zeros(xyz1.shape[:2], np.float32)
    i1 = np.zeros(xyz1.shape[:2], np.int32)
    d2 = np.zeros(xyz2.shape[:2], np.float32)
    i2 = np.zeros(xyz2.shape[:2], np.int32)
    for bi in range(b):
        m = np.sum(
            (xyz1[bi][:, None, :] - xyz2[bi][None, :, :]) ** 2, axis=-1
        ).astype(np.float32)
        i1[bi] = np.argmin(m, axis=1)
        d1[bi] = m[np.arange(m.shape[0]), i1[bi]]
        i2[bi] = np.argmin(m, axis=0)
        d2[bi] = m[i2[bi], np.arange(m.shape[1])]
    return d1, i1, d2, i2


def prob_sample_oracle(inps, inp_r):
    b, n = inps.shape
    m = inp_r.shape[1]
    out = np.zeros((b, m), np.int32)
    for bi in range(b):
        cdf = np.cumsum(inps[bi].astype(np.float32))
        total = cdf[-1]
        for mi in range(m):
            t = inp_r[bi, mi] * total
            out[bi, mi] = min(int(np.searchsorted(cdf, t, side="left")), n - 1)
    return out


def nms_oracle(boxes, scores, thresh, valid=None):
    r = boxes.shape[0]
    v = np.ones(r, bool) if valid is None else valid.astype(bool)
    order = np.argsort(-np.where(v, scores, -np.inf), kind="stable")
    alive = v[order].copy()
    keep_sorted = np.zeros(r, bool)

    def vol(bx):
        e = np.maximum(bx[..., 3:6] - bx[..., 0:3], 0.0)
        return e[..., 0] * e[..., 1] * e[..., 2]

    bs = boxes[order]
    for i in range(r):
        if not alive[i]:
            continue
        keep_sorted[i] = True
        lo = np.maximum(bs[i, 0:3], bs[:, 0:3])
        hi = np.minimum(bs[i, 3:6], bs[:, 3:6])
        e = np.maximum(hi - lo, 0.0)
        inter = e[:, 0] * e[:, 1] * e[:, 2]
        union = vol(bs[i]) + vol(bs) - inter
        iou = inter / np.maximum(union, 1e-12)
        sup = (iou > thresh) & (np.arange(r) > i)
        alive[sup] = False
    keep = np.zeros(r, bool)
    keep[order] = keep_sorted
    return keep
