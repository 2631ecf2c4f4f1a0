"""predict↔training agreement (VERDICT r2 #1): a restored checkpoint must
score inputs through the SAME preprocessing the training eval used (uint8 →
in-step ImageNet/grayscale normalization, training bucket lengths), with the
trained variant (arch/heads) rebuilt from the persisted run_meta.json —
pinned by train→checkpoint→predict round-trips for image-branch models
(2B and 2C), not just 2A."""

import glob
import json
import os

import numpy as np
import pytest

from mpmc_tpu.cli.main import main
from mpmc_tpu.io.tsv import read_prob_predictions


def _make_manifest(path, n, start=0):
    rows = [{"id": f"d/img_{start+i}.png",
             "img_path": f"d/img_{start+i}.png",
             "text": ("كلمة نص دعاية مهم جدا" if (start + i) % 3 == 0
                      else f"نص عادي يومي {i}"),
             "class_label": ("propaganda" if (start + i) % 3 == 0
                             else "not_propaganda")} for i in range(n)]
    with open(path, "w") as f:
        json.dump(rows, f)


def _roundtrip(tmp_path, subtask, extra_train, extra_predict=()):
    tr, de = str(tmp_path / "tr.json"), str(tmp_path / "de.json")
    _make_manifest(tr, 32)
    _make_manifest(de, 12, start=100)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    rc = main(["train", "--subtask", subtask, "--epochs", "1",
               "--fold", "0", "--num-folds", "2", "--batch-size", "8",
               "-tr", tr, "-te", de, "--image-root", str(tmp_path),
               "-o", out_dir, "--checkpoint-dir", ckpt, *extra_train])
    assert rc == 0
    assert os.path.exists(os.path.join(ckpt, "run_meta.json"))
    fold_tsv = glob.glob(os.path.join(out_dir, "*_probs_fold_0.tsv"))[0]
    tids, _, tprobs = read_prob_predictions(fold_tsv)

    probs_out = str(tmp_path / "probs.tsv")
    rc = main(["predict", "--subtask", subtask, "--manifest", de,
               "--out", str(tmp_path / "pred.tsv"),
               "--probs-out", probs_out, "--image-root", str(tmp_path),
               "--checkpoint", os.path.join(ckpt, "fold_0"),
               "--batch-size", "8", *extra_predict])
    assert rc == 0
    pids, _, pprobs = read_prob_predictions(probs_out)
    pred_map = dict(zip(pids, pprobs))
    got = np.array([pred_map[i] for i in tids])
    want = np.asarray(tprobs)
    # exact agreement: identical model, identical in-step preprocessing
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_predict_roundtrip_2b_zoo_variant(tmp_path, monkeypatch):
    """2B zoo checkpoint (tiny_resnet @32², BinaryHead) restores and scores
    identically WITHOUT variant flags — run_meta.json carries the variant
    (VERDICT r2 weak #2: these checkpoints previously had no inference
    path, and weak #1: predict skipped the ImageNet normalization)."""
    monkeypatch.chdir(tmp_path)
    _roundtrip(tmp_path, "2b",
               ["--tiny", "--image-arch", "tiny_resnet",
                "--image-size", "32", "--binary-head"])


@pytest.mark.slow
def test_predict_roundtrip_2c_multimodal(tmp_path, monkeypatch):
    """Full 2C (text+image+caption) round-trip: predict probs == in-loop
    eval probs exactly."""
    monkeypatch.chdir(tmp_path)
    _roundtrip(tmp_path, "2c", ["--tiny"])


def test_model_config_dict_roundtrip():
    """run_meta.json serialization is lossless for every preset."""
    from mpmc_tpu.config import (ModelConfig, model_config_from_dict,
                                 model_config_to_dict)
    for cfg in (ModelConfig(), ModelConfig.tiny_2c(), ModelConfig.small_2a(),
                ModelConfig.simple_2c(), ModelConfig.clip_style_2c(),
                ModelConfig.captions_2b()):
        d = json.loads(json.dumps(model_config_to_dict(cfg)))
        assert model_config_from_dict(d) == cfg
