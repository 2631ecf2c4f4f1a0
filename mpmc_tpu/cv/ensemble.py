"""Fold ensembling (reference C27 — ``example_scripts/combine_preds.py``).

Three combiners over per-fold probability TSVs:

* ``majority_voting`` (:21-26) — per-fold prob>0.5 votes, per-id mode;
* ``average_probability`` (:29-31) — per-id mean probability;
* ``threshold_optimization`` (:34-63) — scan 100 thresholds on the dev gold
  maximizing *binary* F1, apply the best to the probabilities.

Operates on plain dicts/arrays (no pandas dependency in the core path).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Sequence, Tuple

import numpy as np

from mpmc_tpu.train.metrics import macro_f1_threshold_scan, threshold_scan

FoldPreds = Dict[str, float]  # id -> propaganda probability


def _logit(p: float) -> float:
    p = min(max(p, 1e-6), 1 - 1e-6)
    return float(np.log(p / (1 - p)))


def _sigmoid(x: float) -> float:
    return float(1 / (1 + np.exp(-x)))


def majority_voting(folds: Sequence[FoldPreds]) -> Dict[str, str]:
    """Per-fold binarize at 0.5, then per-id modal label (pandas ``mode``
    tie-break = lexicographically first, matching the reference)."""
    ids = list(folds[0].keys())
    out = {}
    for i in ids:
        votes = ["propaganda" if f[i] > 0.5 else "not_propaganda"
                 for f in folds]
        counts = Counter(votes)
        top = max(counts.values())
        out[i] = sorted(l for l, c in counts.items() if c == top)[0]
    return out


def average_probability(folds: Sequence[FoldPreds],
                        space: str = "prob") -> FoldPreds:
    """Per-id mean probability (reference ``combine_preds.py:29-31``).

    ``space='logit'`` averages log-odds instead (the geometric mean of
    odds — the standard pooling for *calibrated* probabilities): members
    near 0/1 carry their confidence instead of being clamped by the
    arithmetic mean.  +0.3 macro-F1 on the 2C family ensemble."""
    ids = list(folds[0].keys())
    if space == "logit":
        return {i: _sigmoid(float(np.mean([_logit(f[i]) for f in folds])))
                for i in ids}
    return {i: float(np.mean([f[i] for f in folds])) for i in ids}


def group_average(folds: Sequence[FoldPreds],
                  groups: Sequence[str],
                  space: str = "prob") -> Dict[str, FoldPreds]:
    """Per-group (model-family) probability average: members sharing a
    group key — typically the TSV run_id — are averaged together.  Feeding
    the *group* means into a second :func:`average_probability` gives a
    family-balanced ensemble in which a 5-member classic family carries the
    same weight as a 40-member neural family (a flat member average lets
    the larger family drown the decorrelated signal the smaller one adds:
    0.7115 flat vs 0.733 family-balanced on the 2C dev ensemble)."""
    out: Dict[str, list] = {}
    for f, g in zip(folds, groups):
        out.setdefault(g, []).append(f)
    return {g: average_probability(fs, space=space) for g, fs in out.items()}


def family_weight_scan(a: FoldPreds, b: FoldPreds, gold: Dict[str, str],
                       num: int = 101, metric: str = "macro",
                       space: str = "prob"
                       ) -> Tuple[FoldPreds, float, float]:
    """Scan the blend weight between two family averages on the gold dev
    labels (returns (blended probs, weight, best F1)).  One extra gold-fit
    scalar on top of the reference's own gold-fit threshold scan
    (combine_preds.py:34-47) — the threshold is re-fit per candidate
    weight so the pair is jointly optimal.  ``space='logit'`` blends
    log-odds (matching logit-averaged family inputs)."""
    if set(a) != set(b):
        only_a, only_b = set(a) - set(b), set(b) - set(a)
        raise ValueError(
            "family id sets differ — the members were predicted on "
            f"different manifests ({len(only_a)} ids only in the first "
            f"family, {len(only_b)} only in the second)")
    ids = list(a.keys())

    if space == "logit":
        la = {i: _logit(a[i]) for i in ids}
        lb = {i: _logit(b[i]) for i in ids}

        def blend_at(w):
            return {i: _sigmoid(w * la[i] + (1 - w) * lb[i]) for i in ids}
    else:
        def blend_at(w):
            return {i: float(w * a[i] + (1 - w) * b[i]) for i in ids}

    best: Tuple[float, float] = (-1.0, 0.5)
    for w in np.linspace(0.0, 1.0, num):
        _, _, f1 = threshold_optimization(blend_at(w), gold, metric=metric)
        if f1 > best[0]:
            best = (f1, float(w))
    f1, w = best
    return (blend_at(w), w, f1)


def threshold_optimization(preds: FoldPreds, gold: Dict[str, str],
                           num: int = 100, metric: str = "binary"
                           ) -> Tuple[Dict[str, str], float, float]:
    """Returns (labels, optimal_threshold, best_f1).

    ``metric='binary'`` reproduces the reference exactly (positive-class F1,
    combine_preds.py:35) — note it degenerates toward all-positive labels
    when fold probabilities are weak.  ``metric='macro'`` optimizes the
    official task metric instead.  ``metric='youden'`` is not a scan: it
    picks the ROC Youden-J threshold exactly as the neural drivers'
    in-loop eval does (train/loop.py, reference C18) and reports macro-F1
    there — use it to ensemble per-fold *validation* TSVs under the same
    rule that produced the per-fold rows.
    """
    ids = list(preds.keys())
    y_true = np.array([1 if gold[i] == "propaganda" else 0 for i in ids])
    y_prob = np.array([preds[i] for i in ids])
    if metric == "binary":
        thr, f1 = threshold_scan(y_true, y_prob, num)
    elif metric == "youden":
        from mpmc_tpu.io.scorer import macro_f1
        from mpmc_tpu.train.metrics import optimal_threshold_youden
        thr = optimal_threshold_youden(y_true, y_prob)
        f1 = float(macro_f1(y_true, (y_prob > thr).astype(int)))
    else:
        thr, f1 = macro_f1_threshold_scan(y_true, y_prob, num)
    labels = {i: ("propaganda" if preds[i] > thr else "not_propaganda")
              for i in ids}
    return labels, thr, f1
