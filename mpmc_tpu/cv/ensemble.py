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

from mpmc_tpu.train.metrics import threshold_scan

FoldPreds = Dict[str, float]  # id -> propaganda probability


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


def average_probability(folds: Sequence[FoldPreds]) -> FoldPreds:
    ids = list(folds[0].keys())
    return {i: float(np.mean([f[i] for f in folds])) for i in ids}


def threshold_optimization(preds: FoldPreds, gold: Dict[str, str],
                           num: int = 100, metric: str = "binary"
                           ) -> Tuple[Dict[str, str], float, float]:
    """Returns (labels, optimal_threshold, best_f1).

    ``metric='binary'`` reproduces the reference exactly (positive-class F1,
    combine_preds.py:35) — note it degenerates toward all-positive labels
    when fold probabilities are weak.  ``metric='macro'`` optimizes the
    official task metric instead.
    """
    from mpmc_tpu.io.scorer import macro_f1
    ids = list(preds.keys())
    y_true = np.array([1 if gold[i] == "propaganda" else 0 for i in ids])
    y_prob = np.array([preds[i] for i in ids])
    if metric == "binary":
        thr, f1 = threshold_scan(y_true, y_prob, num)
    else:
        ts = np.linspace(0, 1, num)
        scores = [macro_f1(y_true, (y_prob > t).astype(int)) for t in ts]
        best = int(np.argmax(scores))
        thr, f1 = float(ts[best]), float(scores[best])
    labels = {i: ("propaganda" if preds[i] > thr else "not_propaganda")
              for i in ids}
    return labels, thr, f1
