"""In-box first-K extraction kernel (ops/box_group.py): oracle-exact vs a
sequential NumPy scan, both impls, masked + unmasked, plus the RoIAlign
integration contract (kernel path == mask+top_k path bit-for-bit).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gspn_tpu.ops.box_group import query_box_group


def box_group_oracle(boxes, s, xyz1, valid1=None, select="first"):
    """Sequential first-s in-box scan: ascending index order,
    replicate-first padding, cnt capped at s, empty rows -> idx 0.
    select="strided": systematic sample hits[floor(j*total/s)] of the
    FULL in-box candidate list once total > s (identical otherwise)."""
    b, r, _ = boxes.shape
    n = xyz1.shape[1]
    idx = np.zeros((b, r, s), np.int32)
    cnt = np.zeros((b, r), np.int32)
    for bi in range(b):
        for ri in range(r):
            lo, hi = boxes[bi, ri, 0:3], boxes[bi, ri, 3:6]
            hits = []
            for j in range(n):
                if valid1 is not None and not valid1[bi, j]:
                    continue
                p = xyz1[bi, j]
                if np.all(p >= lo) and np.all(p <= hi):
                    hits.append(j)
                    if select == "first" and len(hits) == s:
                        break
            total = len(hits)
            if select == "strided" and total > s:
                hits = [hits[(j * total) // s] for j in range(s)]
            c = min(total, s)
            cnt[bi, ri] = c
            if hits:
                row = hits[:c] + [hits[0]] * (s - c)
                idx[bi, ri] = np.asarray(row, np.int32)
    return idx, cnt


def _scene(rng, b=2, n=300, r=20, masked=False):
    xyz1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    c = rng.uniform(-1, 1, (b, r, 3)).astype(np.float32)
    e = rng.uniform(0.05, 0.7, (b, r, 3)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([c - e, c + e], axis=-1))
    valid = None
    if masked:
        valid = jnp.asarray(rng.random((b, n)) > 0.3)
    return xyz1, boxes, valid


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize(
    "impl,extract,select",
    [
        ("xla", None, None),
        ("pallas", "serial", None),
        ("pallas", "rank", None),
        ("xla", None, "strided"),
        ("pallas", None, "strided"),
    ],
)
def test_box_group_matches_oracle(rng, masked, impl, extract, select):
    xyz1, boxes, valid = _scene(rng, masked=masked)
    s = 16
    idx, cnt, local = query_box_group(
        boxes, s, xyz1, valid, impl=impl, extract=extract, select=select
    )
    oidx, ocnt = box_group_oracle(
        np.asarray(boxes), s, np.asarray(xyz1),
        None if valid is None else np.asarray(valid),
        select=select or "first",
    )
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)
    # local == xyz[idx] - box center, bit-for-bit
    pts = jnp.take_along_axis(
        xyz1, jnp.asarray(oidx).reshape(xyz1.shape[0], -1, 1), axis=1
    ).reshape(local.shape)
    center = (boxes[..., 0:3] + boxes[..., 3:6]) * 0.5
    want = pts - center[:, :, None, :]
    np.testing.assert_array_equal(np.asarray(local), np.asarray(want))


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_box_group_edge_rows(rng, impl):
    """Empty boxes, all-point boxes (cnt saturates), single-hit boxes."""
    b, n, s = 1, 260, 8
    xyz1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.stack(
            [
                np.asarray([2.0, 2.0, 2.0, 3.0, 3.0, 3.0]),  # empty
                np.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]),  # everything
                np.concatenate(
                    [np.asarray(xyz1[0, 7]) - 1e-6, np.asarray(xyz1[0, 7]) + 1e-6]
                ),  # exactly point 7
            ]
        )[None].astype(np.float32)
    )
    idx, cnt, local = query_box_group(boxes, s, xyz1, impl=impl)
    oidx, ocnt = box_group_oracle(np.asarray(boxes), s, np.asarray(xyz1))
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)
    assert int(cnt[0, 0]) == 0 and int(idx[0, 0, 0]) == 0
    assert int(cnt[0, 1]) == s
    assert int(cnt[0, 2]) == 1 and int(idx[0, 2, 0]) == 7
    # empty row local frame: point 0 centered on the box
    center0 = (np.asarray(boxes)[0, 0, 0:3] + np.asarray(boxes)[0, 0, 3:6]) * 0.5
    want0 = np.broadcast_to(np.asarray(xyz1)[0, 0] - center0, (s, 3))
    np.testing.assert_array_equal(np.asarray(local)[0, 0], want0)


@pytest.mark.parametrize(
    "impl,extract",
    [("xla", None), ("pallas", "serial"), ("pallas", "rank")],
)
def test_box_group_multi_chunk(rng, impl, extract):
    """Regression (r3 review): n=4600 > _NC=4096 actually straddles TWO
    chunks, exercising the chunk while_loop, cross-chunk early exit and
    _relevant_chunks_box pruning/ordering off-chip (n=1500 fit in one).
    Both extraction schedules (r4)."""
    b, n, r, s = 1, 4600, 8, 12
    xyz1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    c = rng.uniform(-0.8, 0.8, (b, r, 3)).astype(np.float32)
    e = np.full((b, r, 3), 0.3, np.float32)
    boxes = jnp.asarray(np.concatenate([c - e, c + e], axis=-1))
    idx, cnt, _ = query_box_group(boxes, s, xyz1, impl=impl, extract=extract)
    oidx, ocnt = box_group_oracle(np.asarray(boxes), s, np.asarray(xyz1))
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_box_group_chunk_boundaries(rng, impl):
    """Hits straddling the NW window boundaries extract in global
    ascending order."""
    b, n, r, s = 1, 1500, 12, 24
    xyz1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    c = rng.uniform(-0.8, 0.8, (b, r, 3)).astype(np.float32)
    e = np.full((b, r, 3), 0.5, np.float32)
    boxes = jnp.asarray(np.concatenate([c - e, c + e], axis=-1))
    idx, cnt, _ = query_box_group(boxes, s, xyz1, impl=impl)
    oidx, ocnt = box_group_oracle(np.asarray(boxes), s, np.asarray(xyz1))
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)


def test_box_group_impls_agree(rng):
    xyz1, boxes, valid = _scene(rng, b=2, n=520, r=28, masked=True)
    a = query_box_group(boxes, 16, xyz1, valid, impl="pallas")
    b_ = query_box_group(boxes, 16, xyz1, valid, impl="xla")
    for x, y in zip(a, b_, strict=True):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
