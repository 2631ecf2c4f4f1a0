"""In-loop evaluation metrics: ROC / Youden threshold / threshold scan.

Pure numpy (runs on host-gathered eval outputs):

* ``roc_curve`` — sklearn-compatible (fpr, tpr, thresholds) on binary scores;
* ``optimal_threshold_youden`` — argmax(tpr - fpr), the reference's in-loop
  threshold choice (``Multimodal_example_task2C.py:819-822``);
* ``threshold_scan`` — 100-point linspace maximizing *binary* F1, the
  ensemble's choice (``example_scripts/combine_preds.py:34-47``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from mpmc_tpu.io.scorer import binary_f1, macro_f1


def roc_curve(y_true: np.ndarray, y_score: np.ndarray
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ROC points at each distinct score (descending), sklearn semantics:
    thresholds are prepended with +inf and collinear points are NOT dropped
    (we keep all distinct scores — a superset of sklearn's thinned curve that
    yields the same Youden argmax)."""
    y_true = np.asarray(y_true).astype(bool)
    y_score = np.asarray(y_score, dtype=np.float64)
    order = np.argsort(-y_score, kind="stable")
    y_true = y_true[order]
    y_score = y_score[order]
    distinct = np.where(np.diff(y_score))[0]
    idx = np.r_[distinct, y_true.size - 1]
    tps = np.cumsum(y_true)[idx].astype(np.float64)
    fps = (idx + 1) - tps
    P = max(y_true.sum(), 1)
    N = max((~y_true).sum(), 1)
    tpr = np.r_[0.0, tps / P]
    fpr = np.r_[0.0, fps / N]
    thresholds = np.r_[np.inf, y_score[idx]]
    return fpr, tpr, thresholds


def optimal_threshold_youden(y_true: np.ndarray, y_score: np.ndarray) -> float:
    fpr, tpr, thr = roc_curve(y_true, y_score)
    return float(thr[int(np.argmax(tpr - fpr))])


def threshold_scan(y_true: np.ndarray, y_prob: np.ndarray,
                   num: int = 100) -> Tuple[float, float]:
    """(best_threshold, best_binary_F1) over ``np.linspace(0, 1, num)``
    with the strict ``prob > t`` rule (combine_preds.py:35-47)."""
    thresholds = np.linspace(0, 1, num)
    scores = [binary_f1(np.asarray(y_true), (np.asarray(y_prob) > t).astype(int))
              for t in thresholds]
    best = int(np.argmax(scores))
    return float(thresholds[best]), float(scores[best])


def macro_f1_threshold_scan(y_true: np.ndarray, y_prob: np.ndarray,
                            num: int = 100) -> Tuple[float, float]:
    """(best_threshold, best_macro_F1) over the same linspace with the same
    strict ``prob > t`` rule — the official-metric twin of
    :func:`threshold_scan`, backing ``combine --metric macro``."""
    thresholds = np.linspace(0, 1, num)
    y_true = np.asarray(y_true)
    y_prob = np.asarray(y_prob)
    scores = [macro_f1(y_true, (y_prob > t).astype(int))
              for t in thresholds]
    best = int(np.argmax(scores))
    return float(thresholds[best]), float(scores[best])
