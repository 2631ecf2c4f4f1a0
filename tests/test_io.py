"""io layer: manifest loading, TSV round-trip, format checker, scorer parity.

The reference scorer/format checker at /root/reference must accept and score
our emitted TSVs unmodified (SURVEY.md §4 items 1-2) — that is the golden
contract test.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from mpmc_tpu.io import manifest as mio
from mpmc_tpu.io import scorer as msc
from mpmc_tpu.io import tsv as mtsv

REF_DEV = "/root/reference/data/arabic_memes_propaganda_araieval_24_dev.json"


@pytest.fixture
def dev_manifest():
    return mio.read_manifest(REF_DEV)


def test_read_manifest(dev_manifest):
    m = dev_manifest
    assert len(m) == 312
    assert m.labels is not None and m.labels.dtype == np.int32
    assert set(np.unique(m.labels)) <= {0, 1}
    assert all(p.endswith((".jpg", ".png", ".jpeg")) for p in m.img_paths[:5])


def test_manifest_select_concat(dev_manifest):
    a = dev_manifest.select(range(10))
    b = dev_manifest.select(range(10, 30))
    c = a.concat(b)
    assert len(c) == 30
    assert c.ids == dev_manifest.ids[:30]
    np.testing.assert_array_equal(c.labels, dev_manifest.labels[:30])


def test_class_weights_balanced():
    labels = np.array([0] * 75 + [1] * 25)
    w = mio.class_weights(labels)
    # sklearn 'balanced': n_samples / (n_classes * bincount)
    np.testing.assert_allclose(w, [100 / (2 * 75), 100 / (2 * 25)], rtol=1e-6)


def test_tsv_roundtrip_and_format(tmp_path, dev_manifest):
    m = dev_manifest
    pred = (np.arange(len(m)) % 2).astype(int)
    path = str(tmp_path / "pred.tsv")
    mtsv.write_label_tsv(path, m.ids, pred, "mpmc_tpu-run1")
    assert mtsv.check_format(path)
    ids, labels = mtsv.read_predictions(path)
    assert ids == m.ids
    assert labels == [mtsv.ID2L[int(y)] for y in pred]


def test_format_checker_rejects_bad_label(tmp_path):
    path = str(tmp_path / "bad.tsv")
    with open(path, "w") as f:
        f.write("id\tlabel\trun_id\n")
        f.write("data/x/y.jpg\tnot_a_label\trun\n")
    assert not mtsv.check_format(path)


def test_format_checker_matches_reference(tmp_path, dev_manifest):
    """Our emitted TSV must pass the *reference* format checker unmodified."""
    m = dev_manifest
    path = str(tmp_path / "pred.tsv")
    mtsv.write_label_tsv(path, m.ids, np.zeros(len(m), dtype=int), "mpmc_tpu-run1")
    out = subprocess.run(
        [sys.executable, "format_checker/task2.py", "-p", path],
        cwd="/root/reference", capture_output=True, text=True)
    assert out.returncode == 0
    assert "No issue found" in out.stderr + out.stdout


def test_metrics_match_sklearn(rng):
    from sklearn.metrics import (accuracy_score, f1_score, precision_score,
                                 recall_score)
    for _ in range(10):
        g = rng.integers(0, 2, size=200)
        p = rng.integers(0, 2, size=200)
        assert msc.accuracy_score(g, p) == pytest.approx(accuracy_score(g, p))
        assert msc.macro_f1(g, p) == pytest.approx(f1_score(g, p, average="macro"))
        assert msc.binary_f1(g, p) == pytest.approx(f1_score(g, p))
        pw, rw = msc.weighted_precision_recall(g, p)
        assert pw == pytest.approx(precision_score(g, p, average="weighted"))
        assert rw == pytest.approx(recall_score(g, p, average="weighted"))
    # degenerate cases: all-one-class predictions (zero-division paths)
    g = np.array([0, 0, 1, 1])
    p = np.array([0, 0, 0, 0])
    assert msc.macro_f1(g, p) == pytest.approx(
        f1_score(g, p, average="macro", zero_division=0))


def test_scorer_matches_reference_scorer(tmp_path, dev_manifest):
    """evaluate() must agree with /root/reference/scorer/task2.py on the same files."""
    m = dev_manifest
    rng = np.random.default_rng(7)
    pred = rng.integers(0, 2, size=len(m)).astype(int)
    path = str(tmp_path / "pred.tsv")
    mtsv.write_label_tsv(path, m.ids, pred, "mpmc_tpu-run1")

    acc, pw, rw, f1 = msc.evaluate(REF_DEV, path)

    out = subprocess.run(
        [sys.executable, "scorer/task2.py", "-g", REF_DEV, "-p", path],
        cwd="/root/reference", capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    line = [l for l in out.stdout.splitlines() if l.startswith("acc:")][0]
    # "acc: {}, P:{}, R:{}, F1:{}"
    vals = [float(tok.split(":")[-1]) for tok in line.split(", ")]
    assert acc == pytest.approx(vals[0])
    assert pw == pytest.approx(vals[1])
    assert rw == pytest.approx(vals[2])
    assert f1 == pytest.approx(vals[3])


def test_scorer_rejects_id_mismatch(tmp_path, dev_manifest):
    m = dev_manifest
    path = str(tmp_path / "pred.tsv")
    mtsv.write_label_tsv(path, m.ids[:-1], np.zeros(len(m) - 1, dtype=int), "r")
    with pytest.raises(ValueError):
        msc.evaluate(REF_DEV, path)


def test_shipped_fold_tsvs_score(tmp_path):
    """Sanity: the reference's shipped fold-0 predictions score > random."""
    ids, labels, probs = mtsv.read_prob_predictions(
        "/root/reference/task2C_kevinmathew_probs_fold_0.tsv")
    assert len(ids) == 312
    gold = msc.read_gold(REF_DEV)
    g = np.array([1 if gold[i] == "propaganda" else 0 for i in ids])
    p = np.array([1 if l == "propaganda" else 0 for l in labels])
    assert msc.macro_f1(g, p) > 0.6


def test_scorer_label_union_on_single_class_gold(tmp_path):
    """sklearn averages over the union of gold and predicted labels; a
    single-class gold split with opposite-class predictions must match the
    official scorer (ADVICE r1: gold-only label set diverged here)."""
    import json
    from sklearn.metrics import (accuracy_score, f1_score, precision_score,
                                 recall_score)
    from mpmc_tpu.io.scorer import evaluate

    ids = [f"d/x_{i}.png" for i in range(10)]
    gold = [{"id": i, "img_path": i, "text": "t",
             "class_label": "not_propaganda"} for i in ids]
    gpath = str(tmp_path / "gold.json")
    with open(gpath, "w") as f:
        json.dump(gold, f)
    pred = np.array([0, 1, 0, 1, 0, 0, 0, 1, 0, 0])
    ppath = str(tmp_path / "pred.tsv")
    mtsv.write_label_tsv(ppath, ids, pred, "r")

    acc, pw, rw, f1 = evaluate(gpath, ppath)
    y_true = ["not_propaganda"] * 10
    y_pred = ["propaganda" if p else "not_propaganda" for p in pred]
    assert acc == accuracy_score(y_true, y_pred)
    assert pw == pytest.approx(precision_score(
        y_true, y_pred, average="weighted", zero_division=0))
    assert rw == pytest.approx(recall_score(
        y_true, y_pred, average="weighted", zero_division=0))
    assert f1 == pytest.approx(f1_score(y_true, y_pred, average="macro"))
