"""Known-answer baseline regression (SURVEY.md §4.3): the README table pins
dev macro-F1 for the deterministic-seeded organizer baselines
(/root/reference/README.md:142-150); our reimplementations must reproduce
them exactly."""

import pytest

from mpmc_tpu.baselines import (run_majority_baseline, run_ngram_baseline,
                                run_random_baseline)

TRAIN = "/root/reference/data/arabic_memes_propaganda_araieval_24_train.json"
DEV = "/root/reference/data/arabic_memes_propaganda_araieval_24_dev.json"


def test_majority_baseline_matches_readme(tmp_path):
    _, _, _, f1 = run_majority_baseline(TRAIN, DEV,
                                        str(tmp_path / "maj.tsv"))
    assert round(f1, 3) == 0.418  # README.md:147


@pytest.mark.parametrize("subtask,expected",
                         [("2A", 0.466), ("2B", 0.471), ("2C", 0.518)])
def test_random_baseline_matches_readme(tmp_path, subtask, expected):
    _, _, _, f1 = run_random_baseline(TRAIN, DEV,
                                      str(tmp_path / "rand.tsv"),
                                      subtask=subtask)
    assert round(f1, 3) == expected  # README.md:146


def test_ngram_baseline_matches_readme(tmp_path):
    _, _, _, f1 = run_ngram_baseline(TRAIN, DEV, str(tmp_path / "ngram.tsv"))
    assert round(f1, 3) == 0.579  # README.md:148


def test_feature_svm_pipeline(tmp_path):
    """2B/2C feature-SVM plumbing over synthetic feature JSONs."""
    import json

    import numpy as np

    from mpmc_tpu.baselines import run_feature_svm_baseline
    from mpmc_tpu.io.manifest import read_manifest

    rng = np.random.default_rng(0)
    train = read_manifest(TRAIN)
    dev = read_manifest(DEV)

    def feats(split, sep):
        return {
            "imgfeats": {i: (rng.standard_normal(16)
                             + sep * y).tolist()
                         for i, y in zip(split.ids, split.labels)},
            "textfeats": {i: (rng.standard_normal(16)
                              + sep * y).tolist()
                          for i, y in zip(split.ids, split.labels)},
        }

    trp = tmp_path / "train_feats.json"
    dvp = tmp_path / "dev_feats.json"
    trp.write_text(json.dumps(feats(train, 2.0)))
    dvp.write_text(json.dumps(feats(dev, 2.0)))
    _, _, _, f1 = run_feature_svm_baseline(
        str(trp), str(dvp), TRAIN, DEV, str(tmp_path / "svm.tsv"),
        use_text=True)
    assert f1 > 0.9  # separable synthetic features


def test_feature_svm_uses_reference_classifier(tmp_path):
    """Prediction-level pin to the reference classifier ``SVC(C=1,
    kernel='linear', random_state=0)`` (subtask_2b.py:96, subtask_2c.py:85).
    Features overlap (sep=0.5) so libsvm-SVC and LinearSVC genuinely
    disagree on some rows — the pin is meaningful."""
    import json

    import numpy as np
    from sklearn.svm import SVC

    from mpmc_tpu.baselines import run_feature_svm_baseline
    from mpmc_tpu.io.manifest import read_manifest
    from mpmc_tpu.io.tsv import read_predictions

    rng = np.random.default_rng(7)
    train = read_manifest(TRAIN)
    dev = read_manifest(DEV)

    def feats(split):
        return {kind: {i: (rng.standard_normal(8) + 0.5 * y).tolist()
                       for i, y in zip(split.ids, split.labels)}
                for kind in ("imgfeats", "textfeats")}

    tr_feats, dv_feats = feats(train), feats(dev)
    trp, dvp = tmp_path / "tr.json", tmp_path / "dv.json"
    trp.write_text(json.dumps(tr_feats))
    dvp.write_text(json.dumps(dv_feats))
    out = tmp_path / "svm.tsv"
    run_feature_svm_baseline(str(trp), str(dvp), TRAIN, DEV, str(out),
                             use_text=True)
    ids, labels = read_predictions(str(out))
    ours = {i: lbl for i, lbl in zip(ids, labels)}

    def concat(split, table):
        return np.asarray([table["imgfeats"][i] + table["textfeats"][i]
                           for i in split.ids], dtype=np.float32)

    ref = SVC(C=1, kernel="linear", random_state=0)
    ref.fit(concat(train, tr_feats), train.labels)
    ref_pred = ref.predict(concat(dev, dv_feats))
    id2l = {0: "not_propaganda", 1: "propaganda"}
    for i, p in zip(dev.ids, ref_pred):
        assert ours[i] == id2l[int(p)]


def test_ngram_char_analyzer_plumbing(tmp_path):
    """The configurable n-gram family (analyzer/range/max_features) reaches
    the vectorizer: char_wb on a synthetic char-separable corpus classifies
    dev perfectly where the exact word strings never repeat."""
    import json as _json

    def manifest(path, rows):
        path.write_text(_json.dumps(rows))
        return str(path)

    # class signal is a character pattern inside unique words
    def rows(n, off):
        out = []
        for k in range(n):
            y = k % 2
            stem = "xxqz" if y else "mmvr"
            out.append({"id": f"d/x{off+k}.jpg",
                        "text": f"w{off+k}{stem}{off+k}",
                        "img_path": "", "class_label":
                        "propaganda" if y else "not_propaganda"})
        return out

    tr = manifest(tmp_path / "tr.json", rows(60, 0))
    dv = manifest(tmp_path / "dv.json", rows(20, 100))
    _, _, _, f1 = run_ngram_baseline(
        tr, dv, str(tmp_path / "p.tsv"), analyzer="char_wb",
        ngram_range=(2, 4), max_features=2000, run_id="ngram_char_wb")
    assert f1 == 1.0
    from mpmc_tpu.io.tsv import read_run_id
    assert read_run_id(str(tmp_path / "p.tsv")) == "ngram_char_wb"


def test_ngram_cv_protocol(tmp_path):
    """run_ngram_cv follows the 2A fold protocol: K folds over train+dev
    combined, each val TSV covers exactly that fold's held-out rows, and
    the per-fold F1 is threshold-scanned macro-F1 (perfect on separable
    synthetic data)."""
    import json as _json

    import numpy as np

    from mpmc_tpu.baselines import run_ngram_cv
    from mpmc_tpu.cv.kfold import stratified_kfold
    from mpmc_tpu.io.manifest import read_manifest
    from mpmc_tpu.io.tsv import read_prob_predictions

    def rows(n, off):
        out = []
        for k in range(n):
            y = k % 2
            stem = "xxqz" if y else "mmvr"
            out.append({"id": f"d/x{off+k}.jpg",
                        "text": f"w{off+k}{stem}{off+k}",
                        "img_path": "", "class_label":
                        "propaganda" if y else "not_propaganda"})
        return out

    (tmp_path / "tr.json").write_text(_json.dumps(rows(40, 0)))
    (tmp_path / "dv.json").write_text(_json.dumps(rows(20, 100)))
    tr, dv = str(tmp_path / "tr.json"), str(tmp_path / "dv.json")
    f1s = run_ngram_cv(tr, dv, str(tmp_path / "cv"), num_folds=3,
                       analyzer="char_wb", ngram_range=(2, 4),
                       max_features=2000)
    # scored with the neural driver's rule (Youden threshold + strict '>',
    # train/loop.py:227-228): the sample AT the threshold is excluded, so
    # even perfectly separable folds land just under 1.0
    assert len(f1s) == 3 and all(f > 0.9 for f in f1s)
    combined = read_manifest(tr).concat(read_manifest(dv))
    ids = np.asarray(combined.ids, dtype=object)
    folds = stratified_kfold(combined.labels, 3, seed=42)
    seen = []
    for k, (_, va) in enumerate(folds):
        tsv_ids, _, probs = read_prob_predictions(
            str(tmp_path / f"cv_val_fold_{k}.tsv"))
        assert set(tsv_ids) == set(ids[va])  # exactly the held-out rows
        seen += tsv_ids
    assert len(seen) == len(set(seen)) == 60  # a partition, no overlap
