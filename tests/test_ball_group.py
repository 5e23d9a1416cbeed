"""Fused ball-query+group kernel (ops/ball_group.py): oracle-exact vs the
composed query_ball_point + group_point + center-subtract path, both
impls, masked + unmasked, single and multi scale (CLAUDE.md op contract).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gspn_tpu import ops
from gspn_tpu.ops.ball_group import query_ball_group_multi, query_ball_multi_v2
from tests.oracles import ball_query_oracle


def _scene(rng, b=2, n=300, m=40, masked=False):
    xyz1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    xyz2 = jnp.asarray(rng.uniform(-1, 1, (b, m, 3)).astype(np.float32))
    valid = None
    if masked:
        valid = jnp.asarray(rng.random((b, n)) > 0.3)
    return xyz1, xyz2, valid


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize(
    "impl,extract",
    [("xla", None), ("pallas", "serial"), ("pallas", "rank")],
)
def test_fused_matches_composed_single_scale(rng, masked, impl, extract):
    xyz1, xyz2, valid = _scene(rng, masked=masked)
    radius, k = 0.35, 16
    (idx, cnt, grouped), = query_ball_group_multi(
        (radius,), (k,), xyz1, xyz2, valid, impl=impl, extract=extract
    )
    # oracle indices/counts
    oidx, ocnt = ball_query_oracle(
        radius, k, np.asarray(xyz1), np.asarray(xyz2),
        None if valid is None else np.asarray(valid),
    )
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)
    # grouped == gather at idx minus centers, bit-for-bit
    want = ops.group_point(xyz1, idx) - xyz2[:, :, None, :]
    np.testing.assert_array_equal(np.asarray(grouped), np.asarray(want))


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_strided_select_matches_oracle(rng, masked, impl):
    """select="strided" (subsample-robust systematic sample of the full
    candidate list; ops/ball_query.py) — oracle-exact both impls, masked
    and unmasked, multi-scale, including the grouped-coords contract.
    Radii large enough that many queries overflow K (striding engages)."""
    xyz1, xyz2, valid = _scene(rng, masked=masked)
    radii, ks = (0.5, 0.9), (8, 16)
    outs = query_ball_group_multi(
        radii, ks, xyz1, xyz2, valid, impl=impl, select="strided"
    )
    overflowed = 0
    for (idx, cnt, grouped), r, k in zip(outs, radii, ks, strict=True):
        oidx, ocnt = ball_query_oracle(
            r, k, np.asarray(xyz1), np.asarray(xyz2),
            None if valid is None else np.asarray(valid),
            select="strided",
        )
        np.testing.assert_array_equal(np.asarray(idx), oidx)
        np.testing.assert_array_equal(np.asarray(cnt), ocnt)
        want = ops.group_point(xyz1, idx) - xyz2[:, :, None, :]
        np.testing.assert_array_equal(np.asarray(grouped), np.asarray(want))
        # the strided selection must actually differ from first-K here
        fidx, _ = ball_query_oracle(
            r, k, np.asarray(xyz1), np.asarray(xyz2),
            None if valid is None else np.asarray(valid),
        )
        overflowed += int((fidx != oidx).any())
    assert overflowed, "test radii too small: striding never engaged"
    # the standalone ball query agrees with the fused kernel
    bidx, bcnt = ops.query_ball_point(
        radii[0], ks[0], xyz1, xyz2, valid, impl=impl, select="strided"
    )
    np.testing.assert_array_equal(np.asarray(bidx), np.asarray(outs[0][0]))
    np.testing.assert_array_equal(np.asarray(bcnt), np.asarray(outs[0][1]))


def test_strided_select_multi_chunk(rng):
    """Strided selection across chunk/window boundaries: N large enough
    for several windows, with validity holes."""
    b, n, m, k, r = 1, 6000, 16, 12, 0.5
    xyz1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    xyz2 = jnp.asarray(rng.uniform(-1, 1, (b, m, 3)).astype(np.float32))
    valid = jnp.asarray(rng.random((b, n)) > 0.1)
    (idx, cnt, _), = query_ball_group_multi(
        (r,), (k,), xyz1, xyz2, valid, impl="pallas", select="strided"
    )
    oidx, ocnt = ball_query_oracle(
        r, k, np.asarray(xyz1), np.asarray(xyz2), np.asarray(valid),
        select="strided",
    )
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)
    assert int(ocnt.max()) == k  # striding engaged somewhere


def test_select_validation():
    xyz = jnp.zeros((1, 128, 3), jnp.float32)
    q = jnp.zeros((1, 8, 3), jnp.float32)
    with pytest.raises(ValueError, match="select"):
        query_ball_group_multi((0.3,), (8,), xyz, q, select="random")
    with pytest.raises(ValueError, match="select"):
        ops.query_ball_point(0.3, 8, xyz, q, select="stratified")


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_fused_multi_scale_matches_per_scale(rng, impl):
    xyz1, xyz2, valid = _scene(rng, masked=True)
    radii, ks = (0.2, 0.4, 0.8), (8, 16, 32)
    outs = query_ball_group_multi(radii, ks, xyz1, xyz2, valid, impl=impl)
    for (idx, cnt, grouped), r, k in zip(outs, radii, ks, strict=True):
        ridx, rcnt = ops.query_ball_point(r, k, xyz1, xyz2, valid, impl="xla")
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(rcnt))
        want = ops.group_point(xyz1, idx) - xyz2[:, :, None, :]
        np.testing.assert_array_equal(np.asarray(grouped), np.asarray(want))


@pytest.mark.parametrize(
    "impl,extract",
    [("xla", None), ("pallas", "serial"), ("pallas", "rank")],
)
def test_index_only_variant_matches(rng, impl, extract):
    xyz1, xyz2, valid = _scene(rng, b=1, n=700, m=24, masked=True)
    outs = query_ball_multi_v2(
        (0.3, 0.6), (8, 24), xyz1, xyz2, valid, impl=impl, extract=extract
    )
    for (idx, cnt), r, k in zip(outs, (0.3, 0.6), (8, 24), strict=True):
        ridx, rcnt = ops.query_ball_point(r, k, xyz1, xyz2, valid, impl="xla")
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(rcnt))


def test_fused_empty_and_saturated_rows(rng):
    """Far queries (no hits) reproduce the empty-row convention (idx 0 =>
    point 0's coords); dense queries saturate and early-exit."""
    b, n = 1, 600
    xyz1 = jnp.asarray(rng.uniform(-0.2, 0.2, (b, n, 3)).astype(np.float32))
    far = np.full((1, 3, 3), 5.0, np.float32)
    near = np.zeros((1, 2, 3), np.float32)
    xyz2 = jnp.asarray(np.concatenate([far, near], axis=1))
    (idx, cnt, grouped), = query_ball_group_multi(
        (0.5,), (8,), xyz1, xyz2, impl="pallas"
    )
    cnt = np.asarray(cnt)
    assert np.all(cnt[0, :3] == 0) and np.all(cnt[0, 3:] == 8)
    np.testing.assert_array_equal(np.asarray(idx[0, :3]), 0)
    want = ops.group_point(xyz1, idx) - xyz2[:, :, None, :]
    np.testing.assert_array_equal(np.asarray(grouped), np.asarray(want))


@pytest.mark.parametrize("extract", ["serial", "rank"])
def test_fused_multi_chunk_and_sorted_queries(rng, extract):
    """Regression (r3 review): with _NC=4096, n must exceed one chunk to
    exercise the chunk while_loop / early exit / AABB pruning off-chip,
    and m must exceed one 128-row tile to exercise the _SORT_Q
    query-sort + un-permute path. n=4600 -> 2 chunks; m=160 -> 2 tiles
    with Morton-reordered rows. Both extraction schedules (r4)."""
    b, n, m, k = 1, 4600, 160, 8
    xyz1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    xyz2 = jnp.asarray(rng.uniform(-1, 1, (b, m, 3)).astype(np.float32))
    (idx, cnt, grouped), = query_ball_group_multi(
        (0.25,), (k,), xyz1, xyz2, impl="pallas", extract=extract
    )
    oidx, ocnt = ball_query_oracle(
        0.25, k, np.asarray(xyz1), np.asarray(xyz2), None
    )
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)
    want = ops.group_point(xyz1, idx) - xyz2[:, :, None, :]
    np.testing.assert_array_equal(np.asarray(grouped), np.asarray(want))


@pytest.mark.parametrize("extract", ["serial", "rank"])
def test_fused_crosses_chunk_boundaries(rng, extract):
    """Hits spanning multiple NW windows keep global ascending order."""
    b, n, m, k = 1, 1500, 6, 24
    xyz1 = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)).astype(np.float32))
    xyz2 = jnp.asarray(rng.uniform(-1, 1, (b, m, 3)).astype(np.float32))
    (idx, cnt, grouped), = query_ball_group_multi(
        (0.9,), (k,), xyz1, xyz2, impl="pallas", extract=extract
    )
    oidx, ocnt = ball_query_oracle(
        0.9, k, np.asarray(xyz1), np.asarray(xyz2), None
    )
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)
    want = ops.group_point(xyz1, idx) - xyz2[:, :, None, :]
    np.testing.assert_array_equal(np.asarray(grouped), np.asarray(want))


def test_fused_all_chunks_pruned(rng):
    """A query tile whose AABB is farther than max(radius) from every
    point chunk prunes its entire chunk list (nrel=0): the kernel's scan
    loop never runs and every row reports the empty-row convention."""
    b, n = 1, 700
    xyz1 = jnp.asarray(rng.uniform(-0.3, 0.3, (b, n, 3)).astype(np.float32))
    xyz2 = jnp.asarray(np.full((b, 5, 3), 50.0, np.float32))
    (idx, cnt, grouped), = query_ball_group_multi(
        (0.4,), (8,), xyz1, xyz2, impl="pallas"
    )
    np.testing.assert_array_equal(np.asarray(cnt), 0)
    np.testing.assert_array_equal(np.asarray(idx), 0)
    want = ops.group_point(xyz1, idx) - xyz2[:, :, None, :]
    np.testing.assert_array_equal(np.asarray(grouped), np.asarray(want))


def test_fused_prune_partial_chunks(rng):
    """Clustered dataset (two far-apart blobs along the index axis) with
    nearby queries: pruning visits a strict subset of chunks yet output
    is oracle-exact."""
    blob_a = rng.uniform(-0.2, 0.2, (1, 700, 3)).astype(np.float32)
    blob_b = rng.uniform(9.8, 10.2, (1, 700, 3)).astype(np.float32)
    xyz1 = jnp.asarray(np.concatenate([blob_a, blob_b], axis=1))
    xyz2 = jnp.asarray(
        np.concatenate(
            [rng.uniform(-0.1, 0.1, (1, 4, 3)), rng.uniform(9.9, 10.1, (1, 4, 3))],
            axis=1,
        ).astype(np.float32)
    )
    valid = jnp.asarray(rng.uniform(size=(1, 1400)) > 0.1)
    for r, k in ((0.3, 8), (0.6, 16)):
        (idx, cnt, grouped), = query_ball_group_multi(
            (r,), (k,), xyz1, xyz2, valid, impl="pallas"
        )
        oidx, ocnt = ball_query_oracle(
            r, k, np.asarray(xyz1), np.asarray(xyz2), np.asarray(valid)
        )
        np.testing.assert_array_equal(np.asarray(idx), oidx)
        np.testing.assert_array_equal(np.asarray(cnt), ocnt)
