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


def test_threshold_optimization_youden_matches_driver_rule(fold_preds):
    """metric='youden' applies the exact in-loop eval rule (ROC Youden-J
    threshold, probs > thr, macro-F1) — pinned against a direct
    computation with the driver's own helpers (train/loop.py:227-230)."""
    from mpmc_tpu.train.metrics import optimal_threshold_youden

    gold = read_gold(DEV)
    avg = average_probability(fold_preds)
    labels, thr, f1 = threshold_optimization(avg, gold, metric="youden")
    ids = list(avg)
    y = np.array([1 if gold[i] == "propaganda" else 0 for i in ids])
    p = np.array([avg[i] for i in ids])
    thr_ref = optimal_threshold_youden(y, p)
    assert thr == pytest.approx(thr_ref)
    assert f1 == pytest.approx(macro_f1(y, (p > thr_ref).astype(int)))
    assert all((labels[i] == "propaganda") == (avg[i] > thr) for i in ids)


def test_group_average_family_balancing():
    """A 3-member family and a 1-member family contribute equally to the
    two-level mean, regardless of member counts."""
    from mpmc_tpu.cv import group_average
    folds = [{"a": 1.0}, {"a": 1.0}, {"a": 1.0}, {"a": 0.0}]
    groups = ["big", "big", "big", "small"]
    fams = group_average(folds, groups)
    assert set(fams) == {"big", "small"}
    assert fams["big"]["a"] == 1.0 and fams["small"]["a"] == 0.0
    balanced = average_probability(list(fams.values()))
    assert balanced["a"] == pytest.approx(0.5)  # flat mean would give 0.75


def test_family_weight_scan_recovers_better_family():
    """When one family is perfect and the other anti-correlated, the scan
    must weight toward the perfect one — any w > 0.5 separates, and the
    first such w wins (threshold re-fit per candidate), scoring F1=1."""
    from mpmc_tpu.cv import family_weight_scan
    ids = [f"f/x{i}.jpg" for i in range(40)]
    gold = {i: ("propaganda" if k % 2 else "not_propaganda")
            for k, i in enumerate(ids)}
    good = {i: (0.9 if gold[i] == "propaganda" else 0.1) for i in ids}
    bad = {i: 1.0 - good[i] for i in ids}
    blend, w, f1 = family_weight_scan(good, bad, gold)
    assert w > 0.5
    assert f1 == pytest.approx(1.0)
    # the blend ranks every positive above every negative
    pos = min(blend[i] for i in ids if gold[i] == "propaganda")
    neg = max(blend[i] for i in ids if gold[i] == "not_propaganda")
    assert pos > neg


def test_family_balanced_ensemble_beats_flat_on_real_folds(fold_preds):
    """The headline r3 ensemble recipe on the real artifacts: 40 neural fold
    TSVs + 5 char-n-gram SVM TSVs, family-balanced via run-id grouping,
    reaches the reference's shipped-ensemble quality with zero external
    weights (runs/ens/ — see STATUS.md)."""
    import glob
    import os
    from mpmc_tpu.cv import group_average
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    neural = sorted(glob.glob(
        os.path.join(repo, "runs/ens/s4?/task2C_*_probs_fold_*.tsv")))
    char = sorted(glob.glob(
        os.path.join(repo, "runs/ens/chargram/ngram_char_wb_*_probs_fold_*.tsv")))
    if len(neural) != 40 or len(char) != 5:
        pytest.skip("shipped ensemble artifacts not present")
    from mpmc_tpu.io.tsv import read_run_id
    folds, groups = [], []
    for p in neural + char:
        ids, _, probs = read_prob_predictions(p)
        folds.append(dict(zip(ids, probs)))
        groups.append(read_run_id(p))
    fams = group_average(folds, groups)
    assert set(fams) == {"kevinmathew_mpmc_tpu", "ngram_char_wb"}
    gold = read_gold(DEV)
    avg = average_probability(list(fams.values()))
    labels, _, f1 = threshold_optimization(avg, gold, metric="macro")
    assert f1 == pytest.approx(0.7301, abs=1e-3)


def test_logit_average():
    """Logit-space pooling is the geometric mean of odds: symmetric pairs
    cancel to 0.5, and a confident member pulls harder than the arithmetic
    mean allows."""
    from mpmc_tpu.cv import average_probability
    folds = [{"a": 0.9, "b": 0.99}, {"a": 0.1, "b": 0.5}]
    out = average_probability(folds, space="logit")
    assert out["a"] == pytest.approx(0.5)
    # geometric-odds mean of (99, 1) = sqrt(99) odds -> ~0.9087
    assert out["b"] == pytest.approx(
        1 / (1 + np.exp(-0.5 * np.log(99))), abs=1e-9)
    flat = average_probability(folds)
    assert flat["b"] == pytest.approx(0.745)  # arithmetic clamps at .745
    assert out["b"] > 0.9 > flat["b"]


def test_family_weight_scan_logit_space():
    """Logit-space blending matches sigmoid(w*logit(a) + (1-w)*logit(b))
    at the returned weight, and still recovers a perfect family."""
    from mpmc_tpu.cv import family_weight_scan
    ids = [f"f/x{i}.jpg" for i in range(30)]
    gold = {i: ("propaganda" if k % 3 == 0 else "not_propaganda")
            for k, i in enumerate(ids)}
    good = {i: (0.95 if gold[i] == "propaganda" else 0.05) for i in ids}
    noise = {i: 0.5 for i in ids}  # uninformative family
    blend, w, f1 = family_weight_scan(good, noise, gold, space="logit")
    assert f1 == pytest.approx(1.0)
    lg = lambda p: np.log(p / (1 - p))
    for i in ids[:5]:
        expect = 1 / (1 + np.exp(-(w * lg(good[i]) + (1 - w) * lg(noise[i]))))
        assert blend[i] == pytest.approx(expect, abs=1e-9)
