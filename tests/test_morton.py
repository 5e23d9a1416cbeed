"""Morton spatial ordering (ops/morton.py): code construction, sort
properties, and the locality payoff the ball-group chunk pruning relies
on."""

import jax.numpy as jnp
import numpy as np

from gspn_tpu import ops


def _scene(rng, b=2, n=512):
    return jnp.asarray(rng.uniform(-3, 3, (b, n, 3)).astype(np.float32))


def test_morton_codes_deterministic_and_bounded():
    rng = np.random.default_rng(0)
    xyz = _scene(rng)
    c1 = np.asarray(ops.morton_codes(xyz))
    c2 = np.asarray(ops.morton_codes(xyz))
    np.testing.assert_array_equal(c1, c2)
    assert c1.min() >= 0 and c1.max() < (1 << 30)


def test_spatial_order_is_permutation_with_invalid_last():
    rng = np.random.default_rng(1)
    xyz = _scene(rng)
    valid = jnp.asarray(rng.uniform(size=xyz.shape[:2]) > 0.3)
    perm = np.asarray(ops.spatial_order(xyz, valid))
    for b in range(xyz.shape[0]):
        assert sorted(perm[b].tolist()) == list(range(xyz.shape[1]))
        v = np.asarray(valid)[b][perm[b]]
        # all valid points precede all invalid points
        first_invalid = np.argmax(~v) if (~v).any() else len(v)
        assert v[:first_invalid].all() and not v[first_invalid:].any()


def test_apply_order_permutes_consistently():
    rng = np.random.default_rng(2)
    xyz = _scene(rng)
    feats = jnp.asarray(rng.standard_normal(xyz.shape[:2] + (5,)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 9, xyz.shape[:2]).astype(np.int32))
    perm = ops.spatial_order(xyz)
    sx, sf, sl = ops.apply_order(perm, xyz, feats, labels)
    p0 = np.asarray(perm)[0]
    np.testing.assert_array_equal(np.asarray(sx)[0], np.asarray(xyz)[0][p0])
    np.testing.assert_array_equal(np.asarray(sf)[0], np.asarray(feats)[0][p0])
    np.testing.assert_array_equal(np.asarray(sl)[0], np.asarray(labels)[0][p0])


def test_morton_sort_batch_consistent_and_local():
    """Host-side batch sorter (data/native.py): every per-point array is
    permuted by the same per-scene order, valid points come first in
    z-order, padding stays last, scalars/non-per-point keys pass through,
    and consecutive-point locality improves (what the kernels' AABB
    pruning exploits)."""
    from gspn_tpu.data import native, synthetic

    rng = np.random.default_rng(4)
    batch = synthetic.scene_batch(rng, 2, n_points=512, max_instances=6)
    batch["valid"][:, 400:] = False
    batch["num_scenes"] = 2  # non-array key must survive untouched
    out = native.morton_sort_batch(batch)
    assert out["num_scenes"] == 2
    for b in range(2):
        # same multiset of rows <=> a permutation was applied
        key = np.lexsort(batch["xyz"][b].T)
        key2 = np.lexsort(out["xyz"][b].T)
        np.testing.assert_allclose(
            batch["xyz"][b][key], out["xyz"][b][key2]
        )
        # the permutation is shared across keys: recover it from xyz rows
        # (rows are unique with prob 1) and check labels follow it
        order = np.array([
            np.flatnonzero((batch["xyz"][b] == row).all(-1))[0]
            for row in out["xyz"][b]
        ])
        np.testing.assert_array_equal(
            out["inst_label"][b], batch["inst_label"][b][order]
        )
        np.testing.assert_array_equal(
            out["sem_label"][b], batch["sem_label"][b][order]
        )
        np.testing.assert_array_equal(
            out["valid"][b], batch["valid"][b][order]
        )
        # valid-first layout
        nv = int(batch["valid"][b].sum())
        assert out["valid"][b][:nv].all() and not out["valid"][b][nv:].any()

    def mean_step(a):
        return np.linalg.norm(np.diff(a[:400], axis=0), axis=1).mean()

    assert mean_step(out["xyz"][0]) < 0.6 * mean_step(batch["xyz"][0])


def test_morton_order_improves_locality():
    """Mean distance between consecutive points drops after sorting —
    the property the chunk-AABB pruning exploits."""
    rng = np.random.default_rng(3)
    xyz = _scene(rng, b=1, n=2048)
    sx = ops.apply_order(ops.spatial_order(xyz), xyz)
    def mean_step(a):
        a = np.asarray(a)[0]
        return np.linalg.norm(np.diff(a, axis=0), axis=1).mean()
    assert mean_step(sx) < 0.35 * mean_step(xyz)


def test_layout_bias_probe_discriminates():
    """The layout-bias probe (data/layout_probe.py) reads ~1.0 on raw
    instance-ordered scenes and well below the warn threshold on
    Morton-sorted ones — the round-4 measured pathology regime."""
    from gspn_tpu.data import native, synthetic
    from gspn_tpu.data.layout_probe import (
        SPREAD_WARN_THRESHOLD,
        layout_bias_probe,
    )

    rng = np.random.default_rng(0)
    batch = synthetic.scene_batch(rng, 2, n_points=4096, max_instances=8)
    raw = layout_bias_probe(batch["xyz"], batch["valid"], radius=0.5, k=64)
    srt = native.morton_sort_batch(batch)
    mor = layout_bias_probe(srt["xyz"], srt["valid"], radius=0.5, k=64)
    assert not raw["biased"], raw
    assert raw["spread_ratio"] > SPREAD_WARN_THRESHOLD
    assert mor["biased"], mor
    assert mor["spread_ratio"] < SPREAD_WARN_THRESHOLD


def test_pipeline_runs_with_strided_select():
    """group_select="strided" plumbs through both stages of the fused
    pipeline (GSPN context crops, backbone SA, RoI in-box sampling) and
    changes the predictions on Morton-sorted data (where first-K is the
    measured pathology) while keeping shapes/validity sane."""
    import jax

    from gspn_tpu.data import native, synthetic
    from gspn_tpu.models.pipeline import (
        init_pipeline_variables,
        make_inference_fn,
    )
    from gspn_tpu.models.presets import set_pipeline_group_select
    from tests.test_pipeline_eval import TINY

    rng = np.random.default_rng(2)
    batch = native.morton_sort_batch(
        synthetic.scene_batch(rng, 1, n_points=256, max_instances=4)
    )
    xyz = jnp.asarray(batch["xyz"])
    valid = jnp.asarray(batch["valid"])
    key = jax.random.PRNGKey(0)
    variables = init_pipeline_variables(TINY, key, 256)
    p_first = make_inference_fn(TINY)(variables, xyz, None, valid, key)
    cfg_s = set_pipeline_group_select(TINY, "strided")
    p_strided = make_inference_fn(cfg_s)(variables, xyz, None, valid, key)
    assert p_strided.masks.shape == p_first.masks.shape
    # selection mode must actually reach the compute (outputs differ on
    # a spatially-coherent layout)
    assert not np.array_equal(
        np.asarray(p_first.masks), np.asarray(p_strided.masks)
    ) or not np.array_equal(
        np.asarray(p_first.scores), np.asarray(p_strided.scores)
    )
