"""cv layer: k-fold parity with sklearn + ensemble parity with the
reference's pandas implementation, driven on the reference's own shipped
fold TSVs."""

import numpy as np
import pytest

from mpmc_tpu.cv import (average_probability, majority_voting,
                         stratified_kfold, threshold_optimization)
from mpmc_tpu.cv.kfold import _native_stratified_kfold
from mpmc_tpu.io.scorer import macro_f1, read_gold
from mpmc_tpu.io.tsv import read_prob_predictions

DEV = "/root/reference/data/arabic_memes_propaganda_araieval_24_dev.json"
FOLD_TSVS = [f"/root/reference/task2C_kevinmathew_probs_fold_{i}.tsv"
             for i in range(5)]


def test_kfold_matches_sklearn(rng):
    from sklearn.model_selection import StratifiedKFold
    labels = rng.integers(0, 2, 200)
    ours = stratified_kfold(labels, 5, seed=42)
    skf = StratifiedKFold(5, shuffle=True, random_state=42)
    ref = list(skf.split(np.zeros(200), labels))
    for (a_tr, a_te), (b_tr, b_te) in zip(ours, ref):
        np.testing.assert_array_equal(a_tr, b_tr)
        np.testing.assert_array_equal(a_te, b_te)


def test_native_kfold_stratification(rng):
    labels = np.array([0] * 150 + [1] * 50)
    folds = _native_stratified_kfold(labels, 5, seed=0)
    all_test = np.concatenate([te for _, te in folds])
    assert sorted(all_test) == list(range(200))
    for tr, te in folds:
        assert labels[te].sum() == 10  # 50/5 positives per fold
        assert set(tr) | set(te) == set(range(200))


@pytest.fixture(scope="module")
def fold_preds():
    folds = []
    for path in FOLD_TSVS:
        ids, _, probs = read_prob_predictions(path)
        folds.append(dict(zip(ids, probs)))
    return folds


def test_average_probability_matches_pandas(fold_preds):
    import pandas as pd
    dfs = [pd.read_csv(p, sep="\t") for p in FOLD_TSVS]
    ref = pd.concat([df[["id", "prob"]] for df in dfs]).groupby("id").mean()
    ours = average_probability(fold_preds)
    for i, p in ours.items():
        assert p == pytest.approx(ref.loc[i, "prob"])


def test_majority_voting(fold_preds):
    mv = majority_voting(fold_preds)
    assert set(mv.values()) <= {"propaganda", "not_propaganda"}
    # unanimous ids must get the unanimous label
    for i in list(fold_preds[0])[:50]:
        votes = ["propaganda" if f[i] > 0.5 else "not_propaganda"
                 for f in fold_preds]
        if len(set(votes)) == 1:
            assert mv[i] == votes[0]


def test_threshold_optimization_on_shipped_folds(fold_preds):
    """The full reference ensemble flow: prob-average the 5 shipped folds,
    threshold-optimize on dev gold — macro-F1 must beat every baseline."""
    gold = read_gold(DEV)
    avg = average_probability(fold_preds)
    labels, thr, binary_f1 = threshold_optimization(avg, gold)
    assert 0 < thr < 1
    ids = list(labels)
    y = np.array([1 if gold[i] == "propaganda" else 0 for i in ids])
    p = np.array([1 if labels[i] == "propaganda" else 0 for i in ids])
    score = macro_f1(y, p)
    assert score > 0.695  # beats the strongest README baseline (2C SVM)


def test_threshold_optimization_macro_metric(fold_preds):
    """metric='macro' optimizes the official metric; on weak probabilities it
    must not collapse to the all-positive degenerate solution the binary scan
    can pick."""
    gold = read_gold(DEV)
    avg = average_probability(fold_preds)
    labels_b, thr_b, f1_b = threshold_optimization(avg, gold, metric="binary")
    labels_m, thr_m, f1_m = threshold_optimization(avg, gold, metric="macro")
    ids = list(labels_m)
    y = np.array([1 if gold[i] == "propaganda" else 0 for i in ids])
    pm = np.array([1 if labels_m[i] == "propaganda" else 0 for i in ids])
    pb = np.array([1 if labels_b[i] == "propaganda" else 0 for i in ids])
    assert macro_f1(y, pm) >= macro_f1(y, pb) - 1e-9
    assert f1_m == pytest.approx(macro_f1(y, pm))
