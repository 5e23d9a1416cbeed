"""Segmented (parallel-chain) FPS — the documented approximation of
exact greedy FPS (SURVEY.md §7 hard-part #1: bucketed/hierarchical FPS
with seed-level parity deltas).

Semantics pinned here:
  - the output equals exact greedy FPS run independently on every
    segment, round-robin interleaved (oracle test, both segment modes);
  - greedy prefix consistency survives for prefixes that are multiples of
    ``segments`` (what lets one pass serve seeds + backbone sa1);
  - pallas and xla agree;
  - invalid points are never selected while the scene has >= 1 valid
    point, even when whole segments are masked out;
  - coverage quality: contiguous segments on a Morton-sorted scene tile
    it spatially, keeping coverage close to exact FPS.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from gspn_tpu import ops
from gspn_tpu.ops.fps import eligible_fps_segments

from tests.oracles import fps_oracle


def segmented_oracle(npoint, xyz, valid, segments, mode="contiguous"):
    """Exact per-segment greedy FPS, interleaved round-robin."""
    b, n, _ = xyz.shape
    m = npoint // segments
    ns = n // segments
    out = np.zeros((b, npoint), np.int32)
    first_valid = np.zeros(b, np.int64)
    if valid is not None:
        for bi in range(b):
            nz = np.flatnonzero(valid[bi])
            first_valid[bi] = nz[0] if nz.size else n - 1
    for s in range(segments):
        if mode == "contiguous":
            sel = np.arange(ns) + s * ns
        else:
            sel = np.arange(ns) * segments + s
        sub = xyz[:, sel]
        subv = None if valid is None else valid[:, sel]
        loc = fps_oracle(m, sub, subv)  # (B, m)
        glob = sel[loc]
        if valid is not None:
            for bi in range(b):
                if not np.any(subv[bi]):
                    glob[bi] = first_valid[bi]
        out[:, s::segments] = glob
    return out


@pytest.mark.parametrize("impl", ["pallas", "xla"])
@pytest.mark.parametrize("mode", ["contiguous", "strided"])
@pytest.mark.parametrize("masked", [False, True])
def test_fps_segmented_matches_oracle(impl, mode, masked):
    rng = np.random.default_rng(0)
    b, n, npoint, segs = 2, 512, 64, 4
    xyz = rng.normal(size=(b, n, 3)).astype(np.float32)
    valid = None
    if masked:
        valid = rng.random((b, n)) > 0.25
        valid[:, 0] = True
    expect = segmented_oracle(npoint, xyz, valid, segs, mode)
    got = ops.farthest_point_sample(
        npoint,
        jnp.asarray(xyz),
        None if valid is None else jnp.asarray(valid),
        impl=impl,
        segments=segs,
        segment_mode=mode,
    )
    np.testing.assert_array_equal(np.asarray(got), expect)


def spatial_oracle(npoint, xyz, valid, segments):
    """Spatial mode == stable-sort by the op's own Morton codes (codes
    are pinned separately in test_morton.py), contiguous chains over the
    sorted view, positions mapped back through the permutation."""
    codes = np.asarray(
        ops.morton_codes(
            jnp.asarray(xyz),
            None if valid is None else jnp.asarray(valid),
        )
    )
    out = np.zeros((xyz.shape[0], npoint), np.int32)
    for bi in range(xyz.shape[0]):
        order = np.argsort(codes[bi], kind="stable")
        pos = segmented_oracle(
            npoint,
            xyz[bi][order][None],
            None if valid is None else valid[bi][order][None],
            segments,
            "contiguous",
        )[0]
        out[bi] = order[pos]
    return out


@pytest.mark.parametrize("impl", ["pallas", "xla"])
@pytest.mark.parametrize("masked", [False, True])
def test_fps_spatial_matches_oracle(impl, masked):
    rng = np.random.default_rng(10)
    b, n, npoint, segs = 2, 512, 64, 4
    xyz = rng.normal(size=(b, n, 3)).astype(np.float32)
    valid = None
    if masked:
        valid = rng.random((b, n)) > 0.25
        valid[:, 0] = True
    expect = spatial_oracle(npoint, xyz, valid, segs)
    got = ops.farthest_point_sample(
        npoint,
        jnp.asarray(xyz),
        None if valid is None else jnp.asarray(valid),
        impl=impl,
        segments=segs,
        segment_mode="spatial",
    )
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_fps_spatial_prefix_consistency_and_validity():
    """Round-robin prefix consistency at multiples of S survives the
    internal sort, and invalid points are never selected: with 40% of the
    scene masked, the sentinel codes sort the padding into the trailing
    segments, which fall back to a valid index."""
    rng = np.random.default_rng(11)
    b, n, segs = 2, 512, 4
    xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    valid = np.ones((b, n), bool)
    valid[:, : int(n * 0.4)] = False  # heavy masking -> all-pad segments
    validj = jnp.asarray(valid)
    full = ops.farthest_point_sample(
        64, xyz, validj, impl="xla", segments=segs, segment_mode="spatial"
    )
    for k in (4, 16, 32):
        sub = ops.farthest_point_sample(
            k, xyz, validj, impl="xla", segments=segs, segment_mode="spatial"
        )
        np.testing.assert_array_equal(
            np.asarray(full[:, :k]), np.asarray(sub)
        )
    got = np.asarray(full)
    for bi in range(b):
        assert valid[bi, got[bi]].all()


def test_fps_spatial_coverage_beats_unsorted_contiguous():
    """The mode's point: on a SHUFFLED layout (the synthetic pipeline
    shuffles every scene — data/synthetic.py — and real scan crops are
    rarely spatially sorted), contiguous/strided segments are random
    subsets, so the S chains' early picks all chase the same global
    spread and the interleaved SEED prefix (the first npoint//S per
    chain) collapses toward ~N/S effective locations — the measured AP
    falsifier (STATUS.md round-4 A/B). Spatial mode's disjoint Morton
    tiles remove the redundancy; its seed prefix must cover the scene
    strictly better and stay close to exact FPS."""
    rng = np.random.default_rng(12)
    ratios_spatial, ratios_contig = [], []
    for _ in range(3):
        centers = rng.uniform(0, 4, size=(16, 3))
        pts = (
            centers[:, None, :]
            + rng.normal(scale=0.15, size=(16, 128, 3))
        ).reshape(-1, 3).astype(np.float32)
        pts = pts[rng.permutation(pts.shape[0])][None]  # shuffled layout
        xyz = jnp.asarray(pts)
        # 64-point prefix of a 512-pick pass == the pipeline's seed draw
        exact = np.asarray(
            ops.farthest_point_sample(512, xyz, impl="xla")
        )[0, :64]
        spat = np.asarray(
            ops.farthest_point_sample(
                512, xyz, impl="xla", segments=8, segment_mode="spatial"
            )
        )[0, :64]
        cont = np.asarray(
            ops.farthest_point_sample(
                512, xyz, impl="xla", segments=8, segment_mode="contiguous"
            )
        )[0, :64]
        base = _coverage_radius(pts[0], exact)
        ratios_spatial.append(_coverage_radius(pts[0], spat) / base)
        ratios_contig.append(_coverage_radius(pts[0], cont) / base)
    assert np.mean(ratios_spatial) < np.mean(ratios_contig), (
        ratios_spatial, ratios_contig,
    )
    assert np.mean(ratios_spatial) < 1.35, ratios_spatial


def test_fps_segmented_prefix_consistency():
    rng = np.random.default_rng(1)
    b, n, segs = 2, 512, 4
    xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    full = ops.farthest_point_sample(64, xyz, impl="xla", segments=segs)
    for k in (4, 16, 32):
        sub = ops.farthest_point_sample(k, xyz, impl="xla", segments=segs)
        np.testing.assert_array_equal(np.asarray(full[:, :k]), np.asarray(sub))


def test_fps_segmented_pallas_equals_xla():
    rng = np.random.default_rng(2)
    xyz = jnp.asarray(rng.normal(size=(2, 1024, 3)).astype(np.float32))
    valid = jnp.asarray(rng.random((2, 1024)) > 0.2)
    a = ops.farthest_point_sample(128, xyz, valid, impl="pallas", segments=8)
    b = ops.farthest_point_sample(128, xyz, valid, impl="xla", segments=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode", ["contiguous", "strided"])
def test_fps_segmented_never_selects_invalid(mode):
    """Mask out entire segments: picks fall back to the first valid scene
    index rather than selecting padded points."""
    rng = np.random.default_rng(3)
    b, n, segs = 2, 256, 4
    xyz = rng.normal(size=(b, n, 3)).astype(np.float32)
    valid = np.ones((b, n), bool)
    if mode == "contiguous":
        valid[:, : n // 4] = False  # segment 0 entirely invalid
        valid[0, n // 4 : n // 2] = False  # row 0: segment 1 too
    else:
        valid[:, 0::4] = False
        valid[0, 1::4] = False
    got = np.asarray(
        ops.farthest_point_sample(
            32, jnp.asarray(xyz), jnp.asarray(valid), impl="xla",
            segments=segs, segment_mode=mode,
        )
    )
    for bi in range(b):
        assert valid[bi, got[bi]].all()
    expect = segmented_oracle(32, xyz, valid, segs, mode)
    np.testing.assert_array_equal(got, expect)


def test_fps_segmented_all_pad_scene():
    xyz = jnp.zeros((1, 128, 3), jnp.float32)
    valid = jnp.zeros((1, 128), bool)
    got = ops.farthest_point_sample(16, xyz, valid, impl="xla", segments=4)
    assert got.shape == (1, 16)  # no crash; indices in range
    assert (np.asarray(got) >= 0).all() and (np.asarray(got) < 128).all()


def _coverage_radius(xyz, sel):
    """max over scene points of distance to the nearest selected point."""
    d = np.linalg.norm(xyz[:, None, :] - xyz[sel][None, :, :], axis=-1)
    return float(d.min(axis=1).max())


def test_fps_segmented_coverage_quality():
    """The approximation's raison d'etre: contiguous segments on a
    Morton-sorted scene tile it into disjoint regions, so the union of
    per-region FPS sets covers the scene almost as well as exact FPS.
    Measured ratio ~1.05-1.25 over seeds at these shapes; strided (random
    subsets) measures ~1.5-1.7 and is only the mask-robustness fallback."""
    rng = np.random.default_rng(4)
    ratios = []
    for seed in range(4):
        xyz = jnp.asarray(rng.random((1, 2048, 3)).astype(np.float32))
        sx = ops.apply_order(ops.spatial_order(xyz), xyz)
        sxn = np.asarray(sx)
        exact = np.asarray(ops.farthest_point_sample(128, sx, impl="xla"))[0]
        seg = np.asarray(
            ops.farthest_point_sample(128, sx, impl="xla", segments=8)
        )[0]
        ratios.append(
            _coverage_radius(sxn[0], seg) / _coverage_radius(sxn[0], exact)
        )
    assert np.mean(ratios) < 1.35, ratios
    assert max(ratios) < 1.6, ratios


def test_fps_segments_validation():
    xyz = jnp.zeros((1, 100, 3), jnp.float32)
    with pytest.raises(ValueError, match="divide"):
        ops.farthest_point_sample(10, xyz, segments=3)
    with pytest.raises(ValueError, match=">= 1"):
        ops.farthest_point_sample(10, xyz, segments=0)
    xyz = jnp.zeros((1, 128, 3), jnp.float32)
    with pytest.raises(ValueError, match="segment_mode"):
        ops.farthest_point_sample(16, xyz, segments=4, segment_mode="hash")


def _tiny_segmented_cfg():
    import dataclasses

    from gspn_tpu.models.presets import set_pipeline_fps_segments
    from tests.test_pipeline_eval import TINY

    # num_seeds=16 and sa1 npoint=32 are both eligible for segments=2 at
    # n=256 (>= 8 picks per chain, divisible), so the shared pass stays
    # segmented end to end.
    return set_pipeline_fps_segments(
        dataclasses.replace(TINY, num_seeds=16), 2
    )


def test_shared_fps_indices_with_segments():
    """The fused pipeline's ONE shared pass equals what each consumer
    would sample standalone with the same segments (round-robin prefix
    consistency at the pipeline level)."""
    from gspn_tpu.models.pipeline import shared_fps_indices

    cfg = _tiny_segmented_cfg()
    rng = np.random.default_rng(5)
    xyz = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    valid = jnp.asarray(rng.random((2, 256)) > 0.1)
    seed_idx, sa1_idx = shared_fps_indices(cfg, xyz, valid)
    want_seed = ops.farthest_point_sample(
        16, xyz, valid, impl="xla", segments=2
    )
    want_sa1 = ops.farthest_point_sample(
        32, xyz, valid, impl="xla", segments=2
    )
    np.testing.assert_array_equal(np.asarray(seed_idx), np.asarray(want_seed))
    np.testing.assert_array_equal(np.asarray(sa1_idx), np.asarray(want_sa1))
    np.testing.assert_array_equal(
        np.asarray(sa1_idx[:, :16]), np.asarray(seed_idx)
    )


def test_split_fps_indices_spatial_shared_sort():
    """Decoupled seeds/sa1 passes (cfg.sa1_fps_segments > 0) with both
    modes spatial: the shared-sort fast path must be BIT-identical to two
    independent segment_mode="spatial" calls at each consumer's own
    segment count."""
    import dataclasses

    from gspn_tpu.models.pipeline import shared_fps_indices
    from gspn_tpu.models.presets import set_pipeline_fps_segments
    from tests.test_pipeline_eval import TINY

    cfg = set_pipeline_fps_segments(
        dataclasses.replace(TINY, num_seeds=16), 2, "spatial"
    )
    cfg = dataclasses.replace(cfg, sa1_fps_segments=4)
    rng = np.random.default_rng(11)
    xyz = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    valid = jnp.asarray(rng.random((2, 256)) > 0.1)
    seed_idx, sa1_idx = shared_fps_indices(cfg, xyz, valid)
    want_seed = ops.farthest_point_sample(
        16, xyz, valid, impl="xla", segments=2, segment_mode="spatial"
    )
    want_sa1 = ops.farthest_point_sample(
        32, xyz, valid, impl="xla", segments=4, segment_mode="spatial"
    )
    np.testing.assert_array_equal(np.asarray(seed_idx), np.asarray(want_seed))
    np.testing.assert_array_equal(np.asarray(sa1_idx), np.asarray(want_sa1))
    # unmasked too
    seed_u, sa1_u = shared_fps_indices(cfg, xyz, None)
    np.testing.assert_array_equal(
        np.asarray(seed_u),
        np.asarray(ops.farthest_point_sample(
            16, xyz, impl="xla", segments=2, segment_mode="spatial")),
    )
    np.testing.assert_array_equal(
        np.asarray(sa1_u),
        np.asarray(ops.farthest_point_sample(
            32, xyz, impl="xla", segments=4, segment_mode="spatial")),
    )


def test_split_fps_indices_nonspatial_fallback():
    """Split passes with a non-spatial mode skip the shared sort and just
    run two independent passes at each consumer's segment count; an
    ineligible sa1 count falls back to exact for sa1 only."""
    import dataclasses

    from gspn_tpu.models.pipeline import shared_fps_indices
    from gspn_tpu.models.presets import set_pipeline_fps_segments
    from tests.test_pipeline_eval import TINY

    cfg = set_pipeline_fps_segments(
        dataclasses.replace(TINY, num_seeds=16), 2, "strided"
    )
    cfg = dataclasses.replace(cfg, sa1_fps_segments=4)
    rng = np.random.default_rng(12)
    xyz = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    seed_idx, sa1_idx = shared_fps_indices(cfg, xyz, None)
    np.testing.assert_array_equal(
        np.asarray(seed_idx),
        np.asarray(ops.farthest_point_sample(
            16, xyz, impl="xla", segments=2, segment_mode="strided")),
    )
    np.testing.assert_array_equal(
        np.asarray(sa1_idx),
        np.asarray(ops.farthest_point_sample(
            32, xyz, impl="xla", segments=4, segment_mode="strided")),
    )
    # sa1 count ineligible (needs >= 8 picks/chain): sa1 pass is exact
    cfg_ix = dataclasses.replace(cfg, sa1_fps_segments=8)
    _, sa1_exact = shared_fps_indices(cfg_ix, xyz, None)
    np.testing.assert_array_equal(
        np.asarray(sa1_exact),
        np.asarray(ops.farthest_point_sample(32, xyz, impl="xla")),
    )


def test_split_fps_pipeline_runs_and_point_sharded_matches():
    """The fused pipeline runs with the decoupled sa1 pass, and the fully
    point-sharded inference stays equal to single-device (both call
    shared_fps_indices, so the split must ride sharding unchanged)."""
    import dataclasses

    from gspn_tpu.models.presets import set_pipeline_fps_segments
    from tests.test_pipeline_eval import TINY
    from tests.test_scene_sharded import _compare

    cfg = set_pipeline_fps_segments(
        dataclasses.replace(TINY, num_seeds=16), 2, "spatial"
    )
    cfg = dataclasses.replace(cfg, sa1_fps_segments=4)
    _compare(cfg, 2, 256, np.random.default_rng(13))


def test_point_sharded_inference_with_segments():
    """Segmented FPS rides the fully point-sharded inference unchanged:
    sharded == single-device with fps_segments enabled."""
    from tests.test_scene_sharded import _compare

    _compare(_tiny_segmented_cfg(), 2, 256, np.random.default_rng(7))


def test_trainer_cli_fps_segments_smoke(tmp_path):
    """--fps-segments plumbs through the stage-1 trainer: eligible sizes
    (seeds=16, segments=2, N=128) actually run the segmented pass."""
    from gspn_tpu.train import train_gspn

    state = train_gspn.main([
        "--steps", "2", "--batch", "2", "--num-points", "128",
        "--num-seeds", "16", "--gt-size", "16", "--preset", "tiny",
        "--fps-segments", "2",
        "--log-dir", str(tmp_path / "run"), "--log-every", "1",
        "--ckpt-every", "100",
    ])
    assert int(state.step) == 2


def test_eligible_fps_segments_rule():
    assert eligible_fps_segments(8, 1024, 8192) == 8
    assert eligible_fps_segments(8, 256, 1024) == 8
    assert eligible_fps_segments(8, 64, 256) == 8
    assert eligible_fps_segments(8, 16, 64) == 1  # chain < 8 picks/segment
    assert eligible_fps_segments(8, 1024, 8191) == 1  # N not divisible
    assert eligible_fps_segments(8, 1023, 8192) == 1  # npoint not divisible
    assert eligible_fps_segments(1, 1024, 8192) == 1


def test_fps_spatial_seeds_are_density_adaptive():
    """The property that made spatial seg8 the flagship default
    (AP-better than exact, STATUS.md round-4): equal-point-count Morton
    tiles are geometrically small exactly where the scene is dense (on
    instances), so the interleaved seed prefix allocates seeds by
    density. On synthetic-style scenes (dense instance clusters + sparse
    uniform background, shuffled layout) the spatial seed prefix must
    (a) land a higher fraction of seeds on instance points than exact
    greedy FPS (which chases the sparse background/extremes), and
    (b) seed every instance."""
    rng = np.random.default_rng(7)
    from gspn_tpu.data import synthetic

    on_exact, on_spatial, miss_spatial = [], [], 0
    for _ in range(4):
        b = synthetic.scene_batch(rng, 1, n_points=2048, max_instances=6)
        xyz = jnp.asarray(b["xyz"])
        valid = jnp.asarray(b["valid"])
        inst = np.asarray(b["inst_label"])[0]
        exact = np.asarray(
            ops.farthest_point_sample(256, xyz, valid, impl="xla")
        )[0, :64]
        spat = np.asarray(
            ops.farthest_point_sample(
                256, xyz, valid, impl="xla", segments=8,
                segment_mode="spatial",
            )
        )[0, :64]
        on_exact.append((inst[exact] > 0).mean())
        on_spatial.append((inst[spat] > 0).mean())
        seeded = set(np.unique(inst[spat][inst[spat] > 0]))
        miss_spatial += len(set(np.unique(inst[inst > 0])) - seeded)
    assert np.mean(on_spatial) > np.mean(on_exact), (on_spatial, on_exact)
    assert miss_spatial == 0
