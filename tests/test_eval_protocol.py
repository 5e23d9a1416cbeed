"""Official-protocol AP details (SURVEY.md §2.2 eval driver row): GT
min-region-size exclusion and void-overlap forgiveness, verified against
hand-computed expectations on a constructed scene."""

import numpy as np

from gspn_tpu.eval import instance_eval as ie


def _scene():
    """20 points, class 1: GT A = pts 0..9 (10 pts), GT B = pts 10..12
    (3 pts, below min_region_size=5), pts 13..17 class-2 background,
    pts 18..19 unannotated (void)."""
    inst = np.zeros(20, np.int32)
    inst[0:10] = 1
    inst[10:13] = 2
    sem = np.zeros(20, np.int32)
    sem[0:13] = 1
    sem[13:18] = 2
    gt = ie.gt_from_labels(inst, sem)
    assert gt.inst_class == {1: 1, 2: 1}
    np.testing.assert_array_equal(gt.void_mask, sem <= 0)

    def mask(idxs):
        m = np.zeros(20, bool)
        m[list(idxs)] = True
        return m

    preds = ie.ScenePredictions(
        # P0 (score .95): pure-void pred; P1 (.9): A exact; P2 (.8): B exact
        masks=np.stack([mask({18, 19}), mask(range(10)), mask(range(10, 13))]),
        scores=np.array([0.95, 0.9, 0.8]),
        classes=np.array([1, 1, 1]),
    )
    return preds, gt


def test_ap_protocol_off_counts_all():
    """Protocol knobs off: n_gt=2, P0 is an FP ahead of both TPs ->
    AP = 2/3 at every threshold (exact-match IoUs)."""
    preds, gt = _scene()
    res = ie.evaluate_instances([preds], [gt], [1])
    assert np.isclose(res["ap_50"], 2.0 / 3.0)
    assert np.isclose(res["ap_25"], 2.0 / 3.0)
    assert np.isclose(res["ap"], 2.0 / 3.0)


def test_ap_min_region_size_excludes_small_gt():
    """min_region_size=5 drops B from GT (n_gt=1); without forgiveness
    P0 and P2 are FPs, P0 outranks the TP -> AP = 1/2."""
    preds, gt = _scene()
    res = ie.evaluate_instances([preds], [gt], [1], min_region_size=5)
    assert np.isclose(res["ap_50"], 0.5)
    assert np.isclose(res["ap"], 0.5)


def test_ap_void_forgiveness_ignores_void_preds():
    """With void forgiveness too, P0 (pure void) and P2 (covers the
    excluded small instance, which joins the void) are ignored -> AP = 1."""
    preds, gt = _scene()
    res = ie.evaluate_instances(
        [preds], [gt], [1], min_region_size=5, void_forgive=True
    )
    assert np.isclose(res["ap_50"], 1.0)
    assert np.isclose(res["ap_25"], 1.0)
    assert np.isclose(res["ap"], 1.0)


def _two_gt_scene():
    """GT A = pts 0..9, GT B = pts 10..14 (class 1).
    P1 (score .9) = pts 0..7: IoU(A)=0.8, IoU(B)=0.
    P0 (score .6) = pts 3..14: IoU(A)=7/15~.467, IoU(B)=5/12~.417."""
    inst = np.zeros(20, np.int32)
    inst[0:10] = 1
    inst[10:15] = 2
    sem = np.ones(20, np.int32)
    gt = ie.gt_from_labels(inst, sem)

    def mask(idxs):
        m = np.zeros(20, bool)
        m[list(idxs)] = True
        return m

    preds = ie.ScenePredictions(
        masks=np.stack([mask(range(0, 8)), mask(range(3, 15))]),
        scores=np.array([0.9, 0.6]),
        classes=np.array([1, 1]),
    )
    return preds, gt


def test_per_gt_matching_duplicate_fp_can_become_later_tp():
    """Official per-GT rule vs greedy, hand-computed on _two_gt_scene at
    ov=0.25: greedy lets P0 fall through to B (P1 took A) -> both GTs
    matched, AP_25 = 1. per_gt (official): GT A's candidates are P1 and
    P0; P1 (max confidence) is A's TP and is the only one marked matched;
    P0 is appended as a duplicate FP at .6 but STAYS AVAILABLE and then
    becomes GT B's TP at .6. Sequence [TP .9, FP .6, TP .6] over n_gt=2
    -> precision envelope gives AP_25 = .5*1 + .5*(2/3) = 5/6.
    At ov=0.5 P0 clears neither GT, so the modes agree (AP_50 = .5)."""
    preds, gt = _two_gt_scene()
    greedy = ie.evaluate_instances([preds], [gt], [1], match="greedy")
    official = ie.evaluate_instances([preds], [gt], [1], match="per_gt")
    assert np.isclose(greedy["ap_25"], 1.0)
    assert np.isclose(official["ap_25"], 5.0 / 6.0)
    assert np.isclose(greedy["ap_50"], 0.5)
    assert np.isclose(official["ap_50"], 0.5)


def test_per_gt_matching_agrees_on_simple_scenes():
    """On the single-GT-per-pred protocol scenes the two modes coincide
    (incl. min-region exclusion + void forgiveness interplay)."""
    preds, gt = _scene()
    for kw in (
        {},
        {"min_region_size": 5},
        {"min_region_size": 5, "void_forgive": True},
    ):
        a = ie.evaluate_instances([preds], [gt], [1], match="greedy", **kw)
        b = ie.evaluate_instances([preds], [gt], [1], match="per_gt", **kw)
        for k in ("ap", "ap_50", "ap_25"):
            assert np.isclose(a[k], b[k]), (kw, k, a[k], b[k])


def test_iou_threshold_is_strict_in_both_modes():
    """Official hit predicate is strict iou > threshold: a pred with IoU
    exactly 0.5 (5 of 10 GT points) is an FP at ov=0.5 in BOTH matching
    modes, but a TP at ov=0.25."""
    inst = np.zeros(20, np.int32)
    inst[0:10] = 1
    sem = np.ones(20, np.int32)
    gt = ie.gt_from_labels(inst, sem)
    m = np.zeros((1, 20), bool)
    m[0, 0:5] = True  # IoU = 5/10 = 0.5 exactly
    preds = ie.ScenePredictions(
        masks=m, scores=np.array([0.9]), classes=np.array([1])
    )
    for match in ("greedy", "per_gt"):
        res = ie.evaluate_instances([preds], [gt], [1], match=match)
        assert np.isclose(res["ap_50"], 0.0), match
        assert np.isclose(res["ap_25"], 1.0), match


def test_void_forgiveness_threshold_is_the_overlap():
    """Official rule: forgiven only when void fraction > the overlap
    threshold under evaluation. A pred 40% on void is forgiven at
    ov=0.25 but counted as FP at ov=0.5."""
    inst = np.zeros(20, np.int32)
    inst[0:10] = 1
    sem = np.zeros(20, np.int32)
    sem[0:15] = 1  # pts 15..19 void
    gt = ie.gt_from_labels(inst, sem)

    def mask(idxs):
        m = np.zeros(20, bool)
        m[list(idxs)] = True
        return m

    preds = ie.ScenePredictions(
        # P0: 2/5 void (pts 15,16 void; 12,13,14 annotated) -> vfrac 0.4
        masks=np.stack([mask({12, 13, 14, 15, 16}), mask(range(10))]),
        scores=np.array([0.95, 0.9]),
        classes=np.array([1, 1]),
    )
    res = ie.evaluate_instances([preds], [gt], [1], void_forgive=True)
    assert np.isclose(res["ap_25"], 1.0)  # forgiven: 0.4 > 0.25
    assert np.isclose(res["ap_50"], 0.5)  # counted: 0.4 <= 0.5
