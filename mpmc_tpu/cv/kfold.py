"""Stratified k-fold splitting (reference C20/C21 fold machinery).

The reference uses ``StratifiedKFold(n_splits, shuffle=True, random_state=42)``
— 5 folds over train for 2C (``Multimodal_example_task2C.py:115-128``),
10 folds over train+dev for 2A (``textmodel_example_task2A.py:221-230``).

When sklearn is importable (it is CPU-side in this build) we call it directly
so fold assignments are bit-identical to the reference's; otherwise a native
stratified round-robin fallback preserves the stratification guarantees (per-
class proportions within ±1 sample) though not the exact assignment.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _native_stratified_kfold(labels: np.ndarray, n_splits: int, seed: int
                             ) -> List[Tuple[np.ndarray, np.ndarray]]:
    rng = np.random.default_rng(seed)
    labels = np.asarray(labels)
    fold_of = np.empty(len(labels), dtype=np.int64)
    for cls in np.unique(labels):
        idx = np.where(labels == cls)[0]
        rng.shuffle(idx)
        for j, sample in enumerate(idx):
            fold_of[sample] = j % n_splits
    out = []
    for k in range(n_splits):
        test = np.where(fold_of == k)[0]
        train = np.where(fold_of != k)[0]
        out.append((train, test))
    return out


def stratified_kfold(labels: np.ndarray, n_splits: int = 5, seed: int = 42,
                     use_sklearn: bool = True
                     ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Return [(train_idx, val_idx)] * n_splits, shuffled + stratified."""
    if use_sklearn:
        try:
            from sklearn.model_selection import StratifiedKFold
            skf = StratifiedKFold(n_splits=n_splits, shuffle=True,
                                  random_state=seed)
            return [(tr, te) for tr, te in
                    skf.split(np.zeros(len(labels)), labels)]
        except ImportError:
            pass
    return _native_stratified_kfold(labels, n_splits, seed)
