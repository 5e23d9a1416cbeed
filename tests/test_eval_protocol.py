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


def _random_scenes(rng, n_scenes=6, n_pts=200, n_classes=3):
    """Randomized multi-scene, multi-class prediction/GT sets with messy
    overlaps, empty classes and void regions — fodder for matcher
    cross-checks."""
    preds, gts = [], []
    for _ in range(n_scenes):
        inst = np.zeros(n_pts, np.int32)
        sem = np.zeros(n_pts, np.int32)
        pos = 0
        iid = 1
        while pos < n_pts - 20 and iid <= 6:
            size = int(rng.integers(8, 40))
            cls = int(rng.integers(1, n_classes + 1))
            inst[pos:pos + size] = iid
            sem[pos:pos + size] = cls
            pos += size + int(rng.integers(0, 10))  # gaps stay void
            iid += 1
        gts.append(ie.gt_from_labels(inst, sem))
        n_pred = int(rng.integers(1, 9))
        masks = np.zeros((n_pred, n_pts), bool)
        for i in range(n_pred):
            start = int(rng.integers(0, n_pts - 30))
            masks[i, start:start + int(rng.integers(5, 45))] = True
        preds.append(ie.ScenePredictions(
            masks=masks,
            scores=rng.random(n_pred),
            classes=rng.integers(1, n_classes + 1, n_pred).astype(np.int32),
        ))
    return preds, gts


def _greedy_ap_oracle(predictions, ground_truths, class_ids,
                      min_region_size=0, void_forgive=False):
    """Sequential re-statement of the greedy matcher with IoUs recomputed
    inside the per-overlap loop (the pre-hoist formulation) — guards the
    hoisted IoU-matrix implementation in evaluate_instances."""
    all_overlaps = np.unique(np.concatenate([ie.OVERLAPS_AP, [0.25, 0.5]]))
    ap_table = {c: {} for c in class_ids}
    for cls in class_ids:
        scene_gt_masks, scene_void = [], []
        n_gt = 0
        for gt in ground_truths:
            masks = []
            void = (gt.void_mask.copy() if gt.void_mask is not None
                    else np.zeros_like(gt.inst_label, bool))
            for iid, icls in gt.inst_class.items():
                if icls == cls and iid > 0:
                    m = gt.inst_label == iid
                    if min_region_size > 0 and m.sum() < min_region_size:
                        void |= m
                    else:
                        masks.append(m)
            scene_gt_masks.append(masks)
            scene_void.append(void)
            n_gt += len(masks)
        entries = []
        for si, pred in enumerate(predictions):
            for pi in np.where(pred.classes == cls)[0]:
                entries.append((float(pred.scores[pi]), si, int(pi)))
        entries.sort(key=lambda e: -e[0])
        for ov in all_overlaps:
            matched = [np.zeros(len(m), bool) for m in scene_gt_masks]
            tp = np.zeros(len(entries))
            fp = np.zeros(len(entries))
            for ei, (_, si, pi) in enumerate(entries):
                pm = predictions[si].masks[pi]
                best_iou, best_j = 0.0, -1
                for j, gm in enumerate(scene_gt_masks[si]):
                    if matched[si][j]:
                        continue
                    iou = ie._mask_iou(pm, gm)
                    if iou > best_iou:
                        best_iou, best_j = iou, j
                if best_j >= 0 and best_iou > ov:
                    matched[si][best_j] = True
                    tp[ei] = 1
                else:
                    if void_forgive:
                        size = int(pm.sum())
                        if size > 0:
                            vf = float((pm & scene_void[si]).sum()) / size
                            if vf > ov:
                                continue
                    fp[ei] = 1
            ap_table[cls][float(ov)] = ie._average_precision(tp, fp, n_gt)

    def mean(vals):
        vals = [v for v in vals if not np.isnan(v)]
        return float(np.mean(vals)) if vals else float("nan")

    per_class = {c: mean([ap_table[c][float(o)] for o in ie.OVERLAPS_AP])
                 for c in class_ids}
    return {
        "ap": mean(list(per_class.values())),
        "ap_50": mean([ap_table[c][0.5] for c in class_ids]),
        "ap_25": mean([ap_table[c][0.25] for c in class_ids]),
    }


def test_greedy_hoisted_iou_matches_sequential_oracle():
    """The hoisted per-class IoU matrix (computed once, reused across
    overlap thresholds) must reproduce the sequential per-overlap greedy
    matcher exactly, across randomized scenes and protocol knobs."""
    rng = np.random.default_rng(11)
    for trial in range(4):
        preds, gts = _random_scenes(rng)
        class_ids = sorted({c for gt in gts for c in gt.inst_class.values()})
        for mrs, vf in [(0, False), (10, True), (0, True)]:
            got = ie.evaluate_instances(
                preds, gts, class_ids, min_region_size=mrs, void_forgive=vf
            )
            want = _greedy_ap_oracle(
                preds, gts, class_ids, min_region_size=mrs, void_forgive=vf
            )
            for k in ("ap", "ap_50", "ap_25"):
                assert np.isclose(got[k], want[k], equal_nan=True), (
                    trial, mrs, vf, k, got[k], want[k]
                )


def test_bootstrap_ci_deterministic_and_degenerate():
    """Identical scenes -> every resample is the same multiset of one
    scene, so the CI collapses to the point estimate; same seed -> same
    CI; n_boot=0 -> NaNs."""
    preds, gt = _scene()
    point = ie.evaluate_instances([preds], [gt], [1])
    ci = ie.bootstrap_ci([preds], [gt], [1], n_boot=16, seed=3)
    for k in ("ap", "ap_50", "ap_25"):
        assert np.isclose(ci[k][0], point[k])
        assert np.isclose(ci[k][1], point[k])
    ci2 = ie.bootstrap_ci([preds], [gt], [1], n_boot=16, seed=3)
    assert ci == ci2
    empty = ie.bootstrap_ci([preds], [gt], [1], n_boot=0)
    assert all(np.isnan(v) for pair in empty.values() for v in pair)


def test_bootstrap_ci_brackets_mixed_scenes():
    """On a mixed multi-scene set the replicate spread is nonzero, lo <=
    hi, both within [0, 1], and the interval stays stable under the same
    seed while moving under a different one."""
    rng = np.random.default_rng(5)
    preds, gts = _random_scenes(rng, n_scenes=8)
    class_ids = sorted({c for gt in gts for c in gt.inst_class.values()})
    ci_a = ie.bootstrap_ci(preds, gts, class_ids, n_boot=40, seed=0)
    ci_b = ie.bootstrap_ci(preds, gts, class_ids, n_boot=40, seed=0)
    assert ci_a == ci_b
    for lo, hi in ci_a.values():
        assert 0.0 <= lo <= hi <= 1.0


def test_bootstrap_diff_paired():
    """Paired scene-level bootstrap of the AP difference:
    - identical arms -> every replicate's diff is exactly 0;
    - arm A = GT-perfect predictions vs arm B = noise -> CI strictly
      positive (excludes 0);
    - deterministic under the same seed."""
    rng = np.random.default_rng(9)
    preds_b, gts = _random_scenes(rng, n_scenes=8)
    # arm A: perfect predictions derived from the GT itself
    preds_a = []
    for gt in gts:
        ids = sorted(gt.inst_class)
        n_pts = gt.inst_label.shape[0]
        masks = np.stack([gt.inst_label == i for i in ids]) if ids else (
            np.zeros((0, n_pts), bool)
        )
        preds_a.append(ie.ScenePredictions(
            masks=masks,
            scores=np.linspace(0.9, 0.99, len(ids)),
            classes=np.array(
                [gt.inst_class[i] for i in ids], np.int32
            ),
        ))
    class_ids = sorted({c for gt in gts for c in gt.inst_class.values()})

    same = ie.bootstrap_diff(
        preds_a, preds_a, gts, class_ids, n_boot=20, seed=0
    )
    for k in ("ap_diff", "ap_50_diff", "ap_25_diff"):
        assert same[k] == (0.0, 0.0)
        assert same[f"{k}_mean"] == 0.0

    diff = ie.bootstrap_diff(
        preds_a, preds_b, gts, class_ids, n_boot=40, seed=0
    )
    assert diff["ap_diff"][0] > 0.0  # CI excludes 0: A really is better
    assert diff["ap_diff"][0] <= diff["ap_diff"][1] <= 1.0
    diff2 = ie.bootstrap_diff(
        preds_a, preds_b, gts, class_ids, n_boot=40, seed=0
    )
    assert diff == diff2


def test_stats_precompute_path_is_bit_identical():
    """The bootstrap fast path (resampling precomputed _SceneClassStats)
    must reproduce the plain evaluate_instances bit-for-bit on resampled
    scene multisets, across both matchers and the official knobs."""
    rng = np.random.default_rng(21)
    preds, gts = _random_scenes(rng, n_scenes=7)
    class_ids = sorted({c for gt in gts for c in gt.inst_class.values()})
    for match in ("greedy", "per_gt"):
        for mrs, vf in ((0, False), (12, True)):
            stats = ie._compute_stats(preds, gts, class_ids, mrs)
            for trial in range(4):
                idx = rng.integers(0, len(preds), size=len(preds))
                kw = dict(
                    min_region_size=mrs, void_forgive=vf, match=match
                )
                plain = ie.evaluate_instances(
                    [preds[i] for i in idx], [gts[i] for i in idx],
                    class_ids, **kw,
                )
                fast = ie.evaluate_instances(
                    [preds[i] for i in idx], [gts[i] for i in idx],
                    class_ids, _stats=[stats[i] for i in idx], **kw,
                )
                for k in ("ap", "ap_50", "ap_25"):
                    assert (
                        plain[k] == fast[k]
                        or (np.isnan(plain[k]) and np.isnan(fast[k]))
                    ), (match, mrs, vf, trial, k, plain[k], fast[k])
