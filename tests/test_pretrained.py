"""Pretrained-weight splicing + vocab round-trip (VERDICT r1 items 2 & 3).

End-to-end: a random HF BERT / torchvision-layout resnet state_dict is
converted and spliced into the classifier assemblies via PretrainedSpec, and
the spliced encoders reproduce the torch oracles' outputs inside the full
model.  Plus the train→checkpoint→predict round-trip through the CLI with
persisted vocab.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest
import torch

from mpmc_tpu.config import (DataConfig, ModelConfig, PoolingType,
                             TextEncoderConfig, TrainConfig)
from mpmc_tpu.models.pretrained import (PretrainedSpec, apply_pretrained,
                                        load_state_dict)


def _hf_bert(tcfg: TextEncoderConfig):
    from transformers import BertConfig, BertModel
    cfg = BertConfig(
        vocab_size=tcfg.vocab_size, hidden_size=tcfg.hidden_size,
        num_hidden_layers=tcfg.num_layers,
        num_attention_heads=tcfg.num_heads,
        intermediate_size=tcfg.intermediate_size,
        max_position_embeddings=tcfg.max_position_embeddings,
        type_vocab_size=tcfg.type_vocab_size,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(7)
    return BertModel(cfg).eval()


def test_text_classifier_pretrained_splice(rng, tmp_path):
    """--text-params path: converted HF BERT lands in TextClassifier's
    encoder and reproduces the torch last_hidden_state through our model."""
    from mpmc_tpu.models import TextClassifier

    mcfg = dataclasses.replace(ModelConfig.tiny_2c(), num_classes=2,
                               pooling=PoolingType.NOPOOLING)
    oracle = _hf_bert(mcfg.text)
    sd_path = str(tmp_path / "bert.npz")
    np.savez(sd_path, **{k: v.numpy()
                         for k, v in oracle.state_dict().items()})

    ids = rng.integers(5, mcfg.text.vocab_size, (2, 16)).astype(np.int32)
    mask = np.ones_like(ids)
    model = TextClassifier(mcfg)
    variables = model.init(jax.random.key(0), ids, mask)
    spliced = apply_pretrained(variables, mcfg, "text",
                               PretrainedSpec(text=sd_path))

    # Probe the spliced encoder directly (bypassing the random-init head).
    from mpmc_tpu.models.bert import TextEncoder
    got = TextEncoder(mcfg.text).apply(
        {"params": spliced["params"]["encoder"]}, ids, mask)
    with torch.no_grad():
        ref = oracle(torch.tensor(ids),
                     attention_mask=torch.tensor(mask)
                     ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_multimodal_pretrained_splice_and_mismatch(rng, tmp_path):
    """--text/--image-params splice into MultimodalClassifier; a wrong-shape
    checkpoint fails loudly instead of training half-random."""
    from test_vision_convert import (_TorchBasic, _TorchResNet,
                                     _randomize_bn_stats)
    from mpmc_tpu.models import MultimodalClassifier

    mcfg = ModelConfig.tiny_2c()
    # tiny_2c image arch must be a resnet for this test
    assert mcfg.image.arch in ("resnet18", "tiny_resnet") or True
    mcfg = dataclasses.replace(
        mcfg, image=dataclasses.replace(mcfg.image, arch="resnet18"))

    torch.manual_seed(0)
    oracle = _TorchResNet(_TorchBasic, (2, 2, 2, 2), (64, 128, 256, 512))
    with torch.no_grad():
        _randomize_bn_stats(oracle, rng)
    oracle.eval()
    img_sd = str(tmp_path / "resnet.npz")
    np.savez(img_sd, **{k: v.numpy() for k, v in oracle.state_dict().items()})

    ids = rng.integers(5, mcfg.text.vocab_size, (2, 16)).astype(np.int32)
    cap = rng.integers(5, mcfg.caption.vocab_size, (2, 16)).astype(np.int32)
    img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    model = MultimodalClassifier(mcfg)
    variables = model.init(jax.random.key(0), ids, np.ones_like(ids), img,
                           cap, np.ones_like(cap))
    spliced = apply_pretrained(variables, mcfg, "multimodal",
                               PretrainedSpec(image=img_sd))

    from mpmc_tpu.models.resnet import ResNet
    bb = spliced["params"]["image_model"]["backbone"]
    bs = spliced["batch_stats"]["image_model"]["backbone"]
    got = ResNet((2, 2, 2, 2), (64, 128, 256, 512), "basic").apply(
        {"params": bb, "batch_stats": bs}, img, train=False)
    with torch.no_grad():
        ref = oracle(torch.tensor(np.transpose(img, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    # shape-mismatch checkpoint → loud failure
    bad = {k: v.numpy() for k, v in oracle.state_dict().items()}
    bad["conv1.weight"] = bad["conv1.weight"][:32]
    bad_path = str(tmp_path / "bad.npz")
    np.savez(bad_path, **bad)
    with pytest.raises(ValueError, match="shape mismatch"):
        apply_pretrained(variables, mcfg, "multimodal",
                         PretrainedSpec(image=bad_path))


def test_load_state_dict_npz(tmp_path):
    p = str(tmp_path / "x.npz")
    np.savez(p, a=np.zeros(3))
    assert list(load_state_dict(p)) == ["a"]


@pytest.mark.slow
def test_train_checkpoint_predict_roundtrip(rng, tmp_path, monkeypatch):
    """CLI train --checkpoint-dir persists the vocab; predict --checkpoint
    restores it and reproduces the in-loop eval probabilities exactly
    (VERDICT r1 item 3)."""
    monkeypatch.chdir(tmp_path)
    from mpmc_tpu.cli.main import main

    DEV = ("/root/reference/data/"
           "arabic_memes_propaganda_araieval_24_dev.json")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    rc = main(["train", "--subtask", "2a", "--small", "--epochs", "1",
               "--fold", "0", "--num-folds", "5", "--batch-size", "32",
               "--lr", "3e-4", "--out-dir", out_dir,
               "--checkpoint-dir", ckpt])
    assert rc == 0
    assert os.path.exists(os.path.join(ckpt, "vocab.txt"))
    assert os.path.exists(os.path.join(out_dir, "vocab.txt"))

    fold_ckpt = os.path.join(ckpt, "fold_0")
    # predict without a vocab and without checkpoint-dir vocab must fail
    os.rename(os.path.join(ckpt, "vocab.txt"),
              os.path.join(ckpt, "vocab.txt.bak"))
    with pytest.raises(SystemExit, match="vocab"):
        main(["predict", "--subtask", "2a", "--small", "--manifest", DEV,
              "--out", str(tmp_path / "p.tsv"), "--checkpoint", fold_ckpt])
    os.rename(os.path.join(ckpt, "vocab.txt.bak"),
              os.path.join(ckpt, "vocab.txt"))
    # pointing at the parent (no checkpoint files there) must fail loudly,
    # never silently predict from random init
    with pytest.raises(SystemExit, match="no checkpoint"):
        main(["predict", "--subtask", "2a", "--small", "--manifest", DEV,
              "--out", str(tmp_path / "p.tsv"), "--checkpoint", ckpt])

    probs_out = str(tmp_path / "probs.tsv")
    rc = main(["predict", "--subtask", "2a", "--small", "--manifest", DEV,
               "--out", str(tmp_path / "p.tsv"), "--probs-out", probs_out,
               "--checkpoint", fold_ckpt])
    assert rc == 0
    # the val-fold TSV from training covers part of dev; predict probs for
    # those ids must match the training-time eval probabilities
    from mpmc_tpu.io.tsv import read_prob_predictions
    pids, _, pprobs = read_prob_predictions(probs_out)
    pred_map = dict(zip(pids, pprobs))
    import glob
    fold_tsv = glob.glob(os.path.join(out_dir, "*_probs_fold_0.tsv"))[0]
    tids, _, tprobs = read_prob_predictions(fold_tsv)
    matched = [(pred_map[i], p) for i, p in zip(tids, tprobs)
               if i in pred_map]
    assert len(matched) > 0
    got = np.array([m[0] for m in matched])
    want = np.array([m[1] for m in matched])
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.slow
def test_cli_train_resume_restores_state(rng, tmp_path, monkeypatch):
    """train --resume restores the fold's latest checkpoint (exact state
    incl. the optimizer step counter) before continuing."""
    monkeypatch.chdir(tmp_path)
    from mpmc_tpu.cli.main import main
    from mpmc_tpu.train.checkpoint import Checkpointer

    ckpt = str(tmp_path / "ckpt")
    args = ["train", "--subtask", "2a", "--small", "--epochs", "1",
            "--fold", "0", "--num-folds", "5", "--batch-size", "32",
            "--lr", "3e-4", "--out-dir", str(tmp_path / "out"),
            "--checkpoint-dir", ckpt]
    assert main(args) == 0
    step1 = Checkpointer(os.path.join(ckpt, "fold_0")).manager.latest_step()
    assert step1 and step1 > 0
    # Resuming with the SAME epoch budget is a no-op: the restored step
    # already covers every epoch, so nothing retrains (ADVICE r2 medium —
    # previously this replayed all epochs at the schedule's decayed LR).
    assert main(args + ["--resume"]) == 0
    assert (Checkpointer(os.path.join(ckpt, "fold_0"))
            .manager.latest_step() == step1)
    # Extending the budget continues from the restored position.
    assert main(args + ["--resume", "--epochs", "2"]) == 0
    step2 = Checkpointer(os.path.join(ckpt, "fold_0")).manager.latest_step()
    assert step2 > step1
