"""CLI surface: each subcommand through main() in-process."""

import numpy as np
import pytest

from mpmc_tpu.cli.main import main
from mpmc_tpu.io.manifest import read_manifest
from mpmc_tpu.io.tsv import write_label_tsv, write_prob_tsv

DEV = "/root/reference/data/arabic_memes_propaganda_araieval_24_dev.json"
TRAIN = "/root/reference/data/arabic_memes_propaganda_araieval_24_train.json"
FOLD_TSVS = [f"/root/reference/task2C_kevinmathew_probs_fold_{i}.tsv"
             for i in range(5)]


@pytest.fixture
def pred_tsv(tmp_path):
    m = read_manifest(DEV)
    path = str(tmp_path / "p.tsv")
    write_label_tsv(path, m.ids, np.zeros(len(m), int), "cli-test")
    return path


def test_cli_check(pred_tsv, capsys):
    assert main(["check", "-p", pred_tsv]) == 0
    assert "OK" in capsys.readouterr().out


def test_cli_check_bad(tmp_path, capsys):
    bad = tmp_path / "bad.tsv"
    bad.write_text("id\tlabel\trun\nx\tnope\tr\n")
    assert main(["check", "-p", str(bad)]) == 1


def test_cli_score(pred_tsv, capsys):
    assert main(["score", "-g", DEV, "-p", pred_tsv]) == 0
    out = capsys.readouterr().out
    assert "F1:0.417910447761194" in out  # majority baseline, README.md:147


def test_cli_combine(tmp_path, capsys):
    out = str(tmp_path / "ens.tsv")
    assert main(["combine", "--files", *FOLD_TSVS, "--gold", DEV,
                 "--out", out, "--metric", "macro"]) == 0
    assert main(["score", "-g", DEV, "-p", out]) == 0
    f1 = float(capsys.readouterr().out.rsplit("F1:", 1)[1])
    assert f1 > 0.695  # ensemble of shipped folds beats every baseline


def test_cli_combine_multi_gold(tmp_path, capsys):
    """--gold accepts several manifests merged by id (the 2A protocol folds
    over train+dev combined, so per-fold val rows span both files): split
    the dev gold in two and the result must match the single-file run."""
    import json

    with open(DEV, encoding="utf-8") as f:
        entries = json.load(f)
    ga, gb = tmp_path / "a.json", tmp_path / "b.json"
    ga.write_text(json.dumps(entries[:150]))
    gb.write_text(json.dumps(entries[150:]))
    assert main(["combine", "--files", *FOLD_TSVS, "--gold", DEV,
                 "--metric", "youden"]) == 0
    single = capsys.readouterr().out
    assert main(["combine", "--files", *FOLD_TSVS, "--gold", str(ga),
                 str(gb), "--metric", "youden"]) == 0
    assert capsys.readouterr().out == single


def test_cli_predict_2a(tmp_path, capsys):
    out = str(tmp_path / "pred.tsv")
    probs = str(tmp_path / "probs.tsv")
    assert main(["predict", "--subtask", "2a", "--tiny",
                 "--manifest", DEV, "--out", out,
                 "--probs-out", probs]) == 0
    assert main(["check", "-p", out]) == 0
    ids, _, p = __import__("mpmc_tpu.io.tsv", fromlist=["x"]
                           ).read_prob_predictions(probs)
    assert len(ids) == 312 and np.all((p >= 0) & (p <= 1))


@pytest.mark.slow
def test_cli_train_2b_image_arch_selection(tmp_path, capsys):
    """--image-arch/--image-size swap the 2B zoo backbone (C22 `nets`,
    Untitled-2.py:362-371) from the CLI; --binary-head wires the
    l2-normalized head."""
    assert main(["train", "--subtask", "2b", "--tiny",
                 "--image-arch", "tiny_resnet", "--image-size", "32",
                 "--binary-head", "--epochs", "1", "--num-folds", "2",
                 "--fold", "0", "--batch-size", "8", "--scan-steps", "2",
                 "-tr", TRAIN, "-te", DEV,
                 "-o", str(tmp_path)]) == 0
    import os
    assert os.path.exists(str(tmp_path / "task2B_kevinmathew.tsv"))


@pytest.mark.slow
def test_cli_train_pooling_fusion_selection(tmp_path):
    """--pooling/--fusion swap the C11 pooling mode and C12 fusion family
    from the CLI (the reference edits module globals,
    Multimodal_example_task2C.py:77-84), and run_meta records the choice
    so predict restores the exact variant."""
    import json
    import os

    assert main(["train", "--subtask", "2c", "--tiny",
                 "--pooling", "mean", "--fusion", "cross_modal",
                 "--epochs", "1", "--num-folds", "2", "--fold", "0",
                 "--batch-size", "8", "--scan-steps", "2",
                 "--checkpoint-dir", str(tmp_path / "ckpt"),
                 "-tr", TRAIN, "-te", DEV, "-o", str(tmp_path)]) == 0
    assert os.path.exists(str(tmp_path / "task2C_kevinmathew.tsv"))
    meta = json.load(open(tmp_path / "ckpt" / "run_meta.json"))
    assert meta["model"]["pooling"] == "mean"
    assert meta["model"]["fusion"] == "cross_modal"


@pytest.mark.slow
def test_cli_train_small_cross_modal_width_alignment(tmp_path):
    """--small sets image finetune_dim=64 ≠ proj_dim=128; non-concat
    fusions require equal modality widths (fusion.py build_fusion), so the
    CLI must align the image head to proj_dim — regression for the
    `--small --fusion cross_modal` ValueError."""
    import json
    import os

    assert main(["train", "--subtask", "2c", "--small",
                 "--fusion", "cross_modal",
                 "--epochs", "1", "--num-folds", "2", "--fold", "0",
                 "--batch-size", "8", "--scan-steps", "2",
                 "--checkpoint-dir", str(tmp_path / "ckpt"),
                 "-tr", TRAIN, "-te", DEV, "-o", str(tmp_path)]) == 0
    assert os.path.exists(str(tmp_path / "task2C_kevinmathew.tsv"))
    meta = json.load(open(tmp_path / "ckpt" / "run_meta.json"))
    assert meta["model"]["fusion"] == "cross_modal"
    assert (meta["model"]["image"]["finetune_dim"]
            == meta["model"]["proj_dim"])


def test_cli_baselines_2a(tmp_path, capsys):
    assert main(["baselines", "--subtask", "2a", "-tr", TRAIN, "-te", DEV,
                 "-o", str(tmp_path), "--ngram-probs"]) == 0
    out = capsys.readouterr().out
    assert "majority: acc=0.718 macro-F1=0.418" in out
    # the label TSV stays the raw SVC — README row parity unaffected by
    # the extra calibrated probability emission
    assert "ngram: acc=0.740 macro-F1=0.579" in out
    from mpmc_tpu.io.tsv import read_prob_predictions
    # 4-column ensemble-interchange format (like the reference's fold-prob
    # TSVs) — not the 3-column submission format, so no check_format here
    probs_path = str(tmp_path / "ngram_baseline_2A_probs.tsv")
    ids, labels, probs = read_prob_predictions(probs_path)
    assert len(ids) == 312 and np.all((probs >= 0) & (probs <= 1))
    # calibrated probabilities agree with their own thresholded labels
    for y, p in zip(labels, probs):
        assert (y == "propaganda") == (p > 0.5)


def test_ngram_fold_probs_protocol(tmp_path):
    """run_ngram_fold_probs mirrors the neural 2C fold protocol: K TSVs,
    each from an SVM fit on that fold's train split (StratifiedKFold seed
    42), all predicting the full dev set — combinable with neural fold
    TSVs as equal ensemble members."""
    from mpmc_tpu.baselines import run_ngram_fold_probs
    from mpmc_tpu.cv.ensemble import average_probability
    from mpmc_tpu.io.tsv import read_prob_predictions

    paths = run_ngram_fold_probs(TRAIN, DEV, str(tmp_path / "ngram_2C"),
                                 num_folds=3)
    assert len(paths) == 3
    folds = []
    for p in paths:
        ids, _, probs = read_prob_predictions(p)
        assert len(ids) == 312
        folds.append(dict(zip(ids, probs)))
    # folds differ (trained on different subsets) but correlate
    a = np.array([folds[0][i] for i in folds[0]])
    b = np.array([folds[1][i] for i in folds[0]])
    assert not np.allclose(a, b)
    assert np.corrcoef(a, b)[0, 1] > 0.5
    avg = average_probability(folds)
    assert len(avg) == 312


@pytest.mark.slow
def test_cli_baselines_2c_chains_feature_svm(tmp_path, capsys):
    """`baselines --subtask 2c` runs the full reference run_baselines chain
    (subtask_2c.py:99-127): majority/random/ngram + extract-features →
    imgbert feature-SVM, one command, all rows printed (VERDICT r1 item 7)."""
    import json
    rng = np.random.default_rng(0)
    def make_manifest(path, n, start=0):
        rows = [{"id": f"d/img_{start+i}.png", "img_path": f"d/img_{start+i}.png",
                 "text": f"كلمة نص {'دعاية مهم' if (start+i) % 3 == 0 else 'عادي'} {i}",
                 "class_label": "propaganda" if (start+i) % 3 == 0
                 else "not_propaganda"} for i in range(n)]
        with open(path, "w") as f:
            json.dump(rows, f)
    tr, de = str(tmp_path / "tr.json"), str(tmp_path / "de.json")
    make_manifest(tr, 24)
    make_manifest(de, 12, start=100)
    rc = main(["baselines", "--subtask", "2c", "-tr", tr, "-te", de,
               "-o", str(tmp_path), "--image-root", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    for row in ("majority", "random", "ngram", "imgbert"):
        assert row in out
    import os
    assert os.path.exists(str(tmp_path / "features" / "train_feats.json"))
    assert os.path.exists(str(tmp_path / "imgbert_baseline_2C.tsv"))


def test_cli_combine_group_by_run_id(tmp_path, capsys):
    """Family-balanced combine: a 4-member weak family must not drown a
    1-member perfect family when grouped by run_id."""
    m = read_manifest(DEV)
    y = np.array(m.labels)
    files = []
    rng_ = np.random.default_rng(0)
    for k in range(4):  # weak family: near-random probs
        p = str(tmp_path / f"weak_{k}.tsv")
        probs = np.clip(0.5 + 0.05 * rng_.standard_normal(len(m)), 0, 1)
        write_prob_tsv(p, m.ids, (probs > 0.5).astype(int), probs, "weak")
        files.append(p)
    p = str(tmp_path / "good.tsv")
    probs = np.where(y == 1, 0.9, 0.1)
    write_prob_tsv(p, m.ids, y, probs, "good")
    files.append(p)
    out = str(tmp_path / "ens.tsv")
    assert main(["combine", "--files", *files, "--gold", DEV, "--out", out,
                 "--metric", "macro", "--group-by-run-id"]) == 0
    printed = capsys.readouterr().out
    assert "'weak': 4" in printed and "'good': 1" in printed
    assert main(["score", "-g", DEV, "-p", out]) == 0
    f1 = float(capsys.readouterr().out.rsplit("F1:", 1)[1])
    assert f1 == 1.0  # balanced mean keeps the perfect family decisive


def test_cli_combine_scan_family_weight(tmp_path, capsys):
    m = read_manifest(DEV)
    y = np.array(m.labels)
    ga, gb = str(tmp_path / "a.tsv"), str(tmp_path / "b.tsv")
    write_prob_tsv(ga, m.ids, y, np.where(y == 1, 0.9, 0.1), "fam_a")
    write_prob_tsv(gb, m.ids, 1 - y, np.where(y == 1, 0.1, 0.9), "fam_b")
    assert main(["combine", "--files", ga, gb, "--gold", DEV,
                 "--metric", "macro", "--scan-family-weight"]) == 0
    out = capsys.readouterr().out
    assert "family blend" in out and "F1 1.0000" in out
    # >2 families is a clean error, not a crash
    gc = str(tmp_path / "c.tsv")
    write_prob_tsv(gc, m.ids, y, np.where(y == 1, 0.8, 0.2), "fam_c")
    assert main(["combine", "--files", ga, gb, gc, "--gold", DEV,
                 "--metric", "macro", "--scan-family-weight"]) == 1


def test_cli_baselines_ngram_config_naming(tmp_path):
    """Non-default vectorizer configs get config-encoded artifact names and
    run_ids (never overwriting the README-parity word-unigram artifacts),
    and the emitted fold TSVs carry that run_id for family grouping."""
    import json as _json
    import os

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
    assert main(["baselines", "--subtask", "2a",
                 "-tr", str(tmp_path / "tr.json"),
                 "-te", str(tmp_path / "dv.json"), "-o", str(tmp_path),
                 "--ngram-analyzer", "char_wb", "--ngram-range", "2", "4",
                 "--ngram-max-features", "2000",
                 "--ngram-fold-probs", "2"]) == 0
    fam = "ngram_char_wb_2_4_2000"
    assert os.path.exists(tmp_path / f"{fam}_baseline_2A.tsv")
    assert not os.path.exists(tmp_path / "ngram_baseline_2A.tsv")
    from mpmc_tpu.io.tsv import read_run_id
    for k in range(2):
        assert read_run_id(
            str(tmp_path / f"{fam}_baseline_2A_probs_fold_{k}.tsv")) == fam


def test_cli_analyze(tmp_path, capsys):
    m = read_manifest(DEV)
    p = str(tmp_path / "pred.tsv")
    write_label_tsv(p, m.ids, np.zeros(len(m), int), "analyze-test")
    assert main(["analyze", "-g", DEV, "-p", p, "--top-words", "3"]) == 0
    out = capsys.readouterr().out
    assert '"macro_f1": 0.417910447761194' in out  # majority predictions
    assert "misclassified: 88/312" in out  # the 88 propaganda dev rows
    assert "top words among misclassified" in out


def test_recipe_resolution_defaults_and_overrides():
    """--recipe fast is the production train default (VERDICT r4 #1: fast
    and correct are the same config); 'reference' restores the reference
    execution model; any explicitly passed flag beats its recipe value."""
    from mpmc_tpu.cli.main import _resolve_recipe, build_parser

    parser = build_parser()

    args = parser.parse_args(["train", "--subtask", "2a"])
    _resolve_recipe(args)
    assert (args.scan_steps, args.embedding_optimizer, args.adam_mu_dtype,
            args.pack_rows) == (8, "factored", "bfloat16", 4)

    args = parser.parse_args(["train", "--subtask", "2c"])
    _resolve_recipe(args)
    assert args.pack_rows == 8

    # non-plain paths (fold-/pipeline-/sequence-/tensor-parallel) and
    # 2C --simple default to unpacked
    args = parser.parse_args(["train", "--subtask", "2a", "--fold-parallel"])
    _resolve_recipe(args)
    assert args.pack_rows == 0 and args.embedding_optimizer == "factored"
    args = parser.parse_args(["train", "--subtask", "2c", "--simple"])
    _resolve_recipe(args)
    assert args.pack_rows == 0

    args = parser.parse_args(["train", "--subtask", "2a",
                              "--recipe", "reference"])
    _resolve_recipe(args)
    assert (args.scan_steps, args.embedding_optimizer, args.adam_mu_dtype,
            args.pack_rows) == (1, "adam", None, 0)

    # explicit flags always win over the recipe
    args = parser.parse_args(["train", "--subtask", "2a",
                              "--embedding-optimizer", "adam",
                              "--pack-rows", "2", "--scan-steps", "3"])
    _resolve_recipe(args)
    assert (args.scan_steps, args.embedding_optimizer, args.pack_rows) == \
        (3, "adam", 2)
    assert args.adam_mu_dtype == "bfloat16"  # untouched flag: recipe value
