"""Instance-segmentation AP — ScanNet benchmark protocol (host side).

The reference vendors/invokes the official ScanNet
``evaluate_semantic_instance`` scripts (SURVEY.md §2.2 "Inference + eval
driver"). This module implements the same protocol from its public
definition: per-class, per-IoU-threshold greedy matching of
score-descending predictions to GT instances (each GT matched at most
once), then area under the interpolated precision-recall curve. Reported
metrics: AP@0.25, AP@0.5, and AP averaged over thresholds 0.5:0.95:0.05,
as on the benchmark.

Host-side NumPy by design — evaluation consumes dumped predictions and is
not on the training/inference hot path (same as the reference).
"""

from __future__ import annotations

import dataclasses

import numpy as np

OVERLAPS_AP = np.arange(0.5, 1.0, 0.05)


@dataclasses.dataclass
class ScenePredictions:
    """One scene's predictions: masks (R, N) bool, scores (R,), classes (R,)."""

    masks: np.ndarray
    scores: np.ndarray
    classes: np.ndarray


@dataclasses.dataclass
class SceneGT:
    """One scene's ground truth: per-point instance ids (0 = none) and the
    semantic class of each instance id. ``void_mask`` marks unannotated
    points (the official evaluator forgives predictions that mostly cover
    void); None = no void anywhere."""

    inst_label: np.ndarray  # (N,) i32
    inst_class: dict[int, int]  # instance id -> semantic class
    void_mask: np.ndarray | None = None  # (N,) bool


def _mask_iou(pred_mask: np.ndarray, gt_mask: np.ndarray) -> float:
    inter = np.logical_and(pred_mask, gt_mask).sum()
    union = np.logical_or(pred_mask, gt_mask).sum()
    return float(inter) / float(union) if union > 0 else 0.0


def _average_precision(tp: np.ndarray, fp: np.ndarray, n_gt: int) -> float:
    """All-point interpolated AP (precision envelope), the standard used by
    the ScanNet evaluator."""
    if n_gt == 0:
        return float("nan")
    if len(tp) == 0:
        return 0.0
    ctp = np.cumsum(tp)
    cfp = np.cumsum(fp)
    recall = ctp / n_gt
    precision = ctp / np.maximum(ctp + cfp, 1e-12)
    # precision envelope
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[1.0], precision, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def evaluate_instances(
    predictions: list[ScenePredictions],
    ground_truths: list[SceneGT],
    class_ids: list[int],
    overlaps: np.ndarray | None = None,
    min_region_size: int = 0,
    void_forgive: bool = False,
    match: str = "greedy",
) -> dict:
    """AP per class per overlap, plus the benchmark summary numbers.

    Official-protocol knobs (all default to the round-1 behavior so
    existing numbers stay comparable; the official ScanNet evaluator uses
    ``min_region_size=100, void_forgive=True, match="per_gt"``):

    - ``min_region_size``: GT instances smaller than this many points are
      excluded from the GT set; their points join the void region, so
      predictions covering them are forgiven rather than penalized.
    - ``void_forgive``: an unmatched prediction whose fraction of points
      on void/unannotated regions (``SceneGT.void_mask`` plus excluded
      small same-class instances) exceeds the overlap threshold being
      evaluated is ignored (neither TP nor FP) — the official evaluator's
      void-overlap exclusion rule.
    - ``match``: duplicate-prediction resolution. ``"greedy"`` resolves in
      global score order (each pred takes its max-IoU unmatched GT).
      ``"per_gt"`` is the official rule: iterate GT instances; among
      not-yet-matched predictions strictly above the IoU threshold, the
      highest-confidence one becomes the GT's single TP (and only IT is
      marked matched); the rest are appended as FPs at their own
      confidences but stay available — a duplicate FP for one GT can
      still become the TP of a later GT (and a never-matched duplicate is
      appended once per GT it exceeds the threshold on), exactly as the
      official evaluator's greedy per-GT assignment behaves when its
      per-GT prediction lists are score-ordered. Both modes use the
      official strict ``iou > threshold`` hit predicate.

    Returns dict with 'ap' (mAP 0.5:0.95), 'ap_50', 'ap_25', and
    'per_class' {class_id: {'ap': ..., 'ap_50': ..., 'ap_25': ...}}.
    """
    if match not in ("greedy", "per_gt"):
        raise ValueError(f"match must be greedy|per_gt, got {match!r}")
    assert len(predictions) == len(ground_truths)
    all_overlaps = np.unique(
        np.concatenate([overlaps if overlaps is not None else OVERLAPS_AP, [0.25, 0.5]])
    )
    # ap_table[class][overlap] = AP
    ap_table: dict[int, dict[float, float]] = {c: {} for c in class_ids}

    for cls in class_ids:
        # gather per-scene GT masks of this class; small instances are
        # excluded and added to the scene's void (forgiveness) region
        scene_gt_masks = []
        scene_void = []
        n_gt = 0
        for gt in ground_truths:
            masks = []
            void = (
                gt.void_mask.copy()
                if gt.void_mask is not None
                else np.zeros_like(gt.inst_label, bool)
            )
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

        # gather predictions of this class across scenes
        entries = []  # (score, scene_idx, pred_idx)
        for si, pred in enumerate(predictions):
            sel = np.where(pred.classes == cls)[0]
            for pi in sel:
                entries.append((float(pred.scores[pi]), si, int(pi)))
        entries.sort(key=lambda e: -e[0])

        if match == "per_gt":
            # official rule: per-scene pred lists + IoU matrices, computed
            # once per class, consumed per overlap threshold below
            scene_preds: list[list[tuple[float, np.ndarray]]] = [
                [] for _ in predictions
            ]
            for sc, si, pi in entries:
                scene_preds[si].append((sc, predictions[si].masks[pi]))
            scene_iou = []
            for si, plist in enumerate(scene_preds):
                mat = np.zeros((len(plist), len(scene_gt_masks[si])))
                for a, (_, pm) in enumerate(plist):
                    for j, gm in enumerate(scene_gt_masks[si]):
                        mat[a, j] = _mask_iou(pm, gm)
                scene_iou.append(mat)
            for ov in all_overlaps:
                y_true: list[int] = []
                y_score: list[float] = []
                for si, plist in enumerate(scene_preds):
                    iou = scene_iou[si]
                    used = np.zeros(len(plist), bool)
                    for j in range(len(scene_gt_masks[si])):
                        above = [
                            a
                            for a in range(len(plist))
                            if not used[a] and iou[a, j] > ov
                        ]
                        if not above:
                            continue  # hard false negative (counted via n_gt)
                        # plist is score-descending, so above[0] is the
                        # max-confidence candidate: it becomes the TP and
                        # is the ONLY one marked matched (official rule);
                        # lower-confidence duplicates are FPs at their own
                        # confidence but stay available for later GTs.
                        y_true.append(1)
                        y_score.append(plist[above[0]][0])
                        used[above[0]] = True
                        for a in above[1:]:
                            y_true.append(0)
                            y_score.append(plist[a][0])
                    # remaining unmatched preds: the official found_gt
                    # re-check — a pred with any above-threshold overlap
                    # was already appended as a duplicate FP in the GT
                    # loop, so only overlap-free preds are counted here
                    for a in range(len(plist)):
                        if used[a]:
                            continue
                        if any(
                            iou[a, j] > ov
                            for j in range(len(scene_gt_masks[si]))
                        ):
                            continue  # duplicate FP, already appended
                        sc, pm = plist[a]
                        if void_forgive:
                            size = int(pm.sum())
                            if size > 0:
                                vfrac = float(
                                    (pm & scene_void[si]).sum()
                                ) / size
                                if vfrac > ov:
                                    continue  # ignored
                        y_true.append(0)
                        y_score.append(sc)
                order = np.argsort(-np.asarray(y_score, dtype=np.float64), kind="stable")
                yt = np.asarray(y_true)[order] if len(y_true) else np.zeros(0)
                ap_table[cls][float(ov)] = _average_precision(
                    yt, 1 - yt, n_gt
                )
            continue

        # greedy (score-descending) matching. IoUs don't depend on the
        # matched state, so the per-entry IoU row (and the void fraction)
        # is computed ONCE per class and reused across all overlap
        # thresholds — exact, just hoisted out of the per-overlap loop.
        entry_iou = []  # per entry: IoU against each GT of its scene
        entry_vfrac = []
        for _, si, pi in entries:
            pm = predictions[si].masks[pi]
            entry_iou.append(
                np.array([_mask_iou(pm, gm) for gm in scene_gt_masks[si]])
            )
            size = int(pm.sum())
            entry_vfrac.append(
                float((pm & scene_void[si]).sum()) / size if size else 0.0
            )
        for ov in all_overlaps:
            matched = [np.zeros(len(m), bool) for m in scene_gt_masks]
            tp = np.zeros(len(entries))
            fp = np.zeros(len(entries))
            for ei, (_, si, pi) in enumerate(entries):
                ious = np.where(matched[si], -1.0, entry_iou[ei])
                best_j = int(np.argmax(ious)) if len(ious) else -1
                best_iou = float(ious[best_j]) if best_j >= 0 else 0.0
                if best_j >= 0 and best_iou > ov:  # official strict >
                    matched[si][best_j] = True
                    tp[ei] = 1
                else:
                    if void_forgive and entry_vfrac[ei] > ov:
                        continue  # ignored: neither TP nor FP
                    fp[ei] = 1
            ap_table[cls][float(ov)] = _average_precision(tp, fp, n_gt)

    def _mean(vals):
        vals = [v for v in vals if not np.isnan(v)]
        return float(np.mean(vals)) if vals else float("nan")

    per_class = {
        c: {
            "ap": _mean([ap_table[c][float(o)] for o in OVERLAPS_AP]),
            "ap_50": ap_table[c][0.5],
            "ap_25": ap_table[c][0.25],
        }
        for c in class_ids
    }
    return {
        "ap": _mean([per_class[c]["ap"] for c in class_ids]),
        "ap_50": _mean([per_class[c]["ap_50"] for c in class_ids]),
        "ap_25": _mean([per_class[c]["ap_25"] for c in class_ids]),
        "per_class": per_class,
    }


def bootstrap_ci(
    predictions: list[ScenePredictions],
    ground_truths: list[SceneGT],
    class_ids: list[int],
    n_boot: int = 100,
    seed: int = 0,
    ci: float = 0.95,
    **eval_kwargs,
) -> dict:
    """Scene-level bootstrap confidence intervals for the AP summary.

    Matching in both ``evaluate_instances`` modes is scene-local (only the
    cross-scene pooled PR curve couples scenes), so resampling SCENES with
    replacement is the natural bootstrap unit: it models "how would the
    number move on a different draw of evaluation scenes", which is the
    question the 16-scene synthetic A/Bs kept running into (deltas of
    ±0.05 AP between configs are routinely inside the resampling noise).

    Returns ``{"ap": (lo, hi), "ap_50": (lo, hi), "ap_25": (lo, hi)}`` at
    the ``ci`` percentile level, computed over ``n_boot`` replicates with
    a deterministic ``seed``. NaN replicates (a resample can drop every
    scene containing some class — the per-class mean then shrinks its
    class set, not NaN; a fully empty resample is impossible since n>=1)
    are excluded per-field.
    """
    assert len(predictions) == len(ground_truths)
    n = len(predictions)
    if n == 0 or n_boot <= 0:
        nan = (float("nan"), float("nan"))
        return {"ap": nan, "ap_50": nan, "ap_25": nan}
    rng = np.random.default_rng(seed)
    samples: dict[str, list[float]] = {"ap": [], "ap_50": [], "ap_25": []}
    for _ in range(n_boot):
        idx = rng.integers(0, n, size=n)
        res = evaluate_instances(
            [predictions[i] for i in idx],
            [ground_truths[i] for i in idx],
            class_ids,
            **eval_kwargs,
        )
        for k in samples:
            samples[k].append(res[k])
    lo_q, hi_q = 100 * (1 - ci) / 2, 100 * (1 + ci) / 2
    out = {}
    for k, vals in samples.items():
        v = np.asarray(vals, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            out[k] = (float("nan"), float("nan"))
        else:
            out[k] = (
                float(np.percentile(v, lo_q)),
                float(np.percentile(v, hi_q)),
            )
    return out


def bootstrap_diff(
    predictions_a: list[ScenePredictions],
    predictions_b: list[ScenePredictions],
    ground_truths: list[SceneGT],
    class_ids: list[int],
    n_boot: int = 100,
    seed: int = 0,
    ci: float = 0.95,
    **eval_kwargs,
) -> dict:
    """PAIRED scene-level bootstrap of the AP difference (A - B).

    For config A/Bs on the SAME scenes (e.g. two FPS settings on one
    checkpoint), two independent :func:`bootstrap_ci` intervals waste
    power: the scene draw is shared, so most of each arm's variance is
    common and cancels in the difference. Here every replicate resamples
    ONE scene index set and applies it to BOTH arms, giving the CI of
    the per-draw delta — the statistic that actually answers "is A
    better than B on scenes like these".

    Returns ``{"ap_diff": (lo, hi), "ap_50_diff": ..., "ap_25_diff": ...,
    "ap_diff_mean": ..., ...}``. A CI excluding 0 is a significant
    difference at the ``ci`` level.
    """
    assert len(predictions_a) == len(predictions_b) == len(ground_truths)
    n = len(ground_truths)
    if n == 0 or n_boot <= 0:
        nan = (float("nan"), float("nan"))
        return {f"{k}_diff": nan for k in ("ap", "ap_50", "ap_25")}
    rng = np.random.default_rng(seed)
    samples: dict[str, list[float]] = {"ap": [], "ap_50": [], "ap_25": []}
    for _ in range(n_boot):
        idx = rng.integers(0, n, size=n)
        gts = [ground_truths[i] for i in idx]
        res_a = evaluate_instances(
            [predictions_a[i] for i in idx], gts, class_ids, **eval_kwargs
        )
        res_b = evaluate_instances(
            [predictions_b[i] for i in idx], gts, class_ids, **eval_kwargs
        )
        for k in samples:
            samples[k].append(res_a[k] - res_b[k])
    lo_q, hi_q = 100 * (1 - ci) / 2, 100 * (1 + ci) / 2
    out = {}
    for k, vals in samples.items():
        v = np.asarray(vals, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            out[f"{k}_diff"] = (float("nan"), float("nan"))
            out[f"{k}_diff_mean"] = float("nan")
        else:
            out[f"{k}_diff"] = (
                float(np.percentile(v, lo_q)),
                float(np.percentile(v, hi_q)),
            )
            out[f"{k}_diff_mean"] = float(np.mean(v))
    return out


def predictions_from_device(preds, scene_valid=None) -> list[ScenePredictions]:
    """Convert a batched InstancePredictions pytree (device) to per-scene
    host predictions, dropping invalid proposal slots and padded points."""
    masks = np.asarray(preds.masks)
    scores = np.asarray(preds.scores)
    classes = np.asarray(preds.classes)
    valid = np.asarray(preds.valid)
    out = []
    for bi in range(masks.shape[0]):
        keep = valid[bi]
        m = masks[bi][keep]
        if scene_valid is not None:
            m = m[:, np.asarray(scene_valid)[bi]]
        out.append(
            ScenePredictions(
                masks=m, scores=scores[bi][keep], classes=classes[bi][keep]
            )
        )
    return out


def gt_from_labels(inst_label: np.ndarray, sem_label: np.ndarray) -> SceneGT:
    """Build SceneGT from per-point instance + semantic label arrays.
    Points with no semantic annotation (label <= 0) form the void region."""
    inst_class = {}
    for iid in np.unique(inst_label):
        if iid <= 0:
            continue
        members = inst_label == iid
        inst_class[int(iid)] = int(np.bincount(sem_label[members]).argmax())
    return SceneGT(
        inst_label=inst_label,
        inst_class=inst_class,
        void_mask=np.asarray(sem_label) <= 0,
    )
