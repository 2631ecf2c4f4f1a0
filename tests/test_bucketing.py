"""Sequence bucketing: length math + logit invariance + driver wiring.

The reference pads every text/caption to a fixed 512 tokens
(``Multimodal_example_task2C.py:276``); this corpus averages ~12 words, so
bucketing to the corpus max is the dominant TPU throughput lever.  Trimming
trailing all-PAD columns must be *exact* for the masked poolings — these
tests pin that.
"""

import dataclasses

import jax
import numpy as np
import pytest

from mpmc_tpu.cli.experiments import (bucket_seq_len, bucket_trim,
                                      run_subtask_2a)
from mpmc_tpu.config import (DataConfig, ModelConfig, PoolingType,
                             TrainConfig)
from mpmc_tpu.models import TextClassifier

TRAIN = "/root/reference/data/arabic_memes_propaganda_araieval_24_train.json"
DEV = "/root/reference/data/arabic_memes_propaganda_araieval_24_dev.json"


def _mask(lengths, width):
    m = np.zeros((len(lengths), width), np.int32)
    for i, n in enumerate(lengths):
        m[i, :n] = 1
    return m


def test_bucket_seq_len_rounding_and_cap():
    assert bucket_seq_len([_mask([3, 12], 512)], 64, 512) == 64
    assert bucket_seq_len([_mask([65], 512)], 64, 512) == 128
    assert bucket_seq_len([_mask([64], 512)], 64, 512) == 64
    # joint over several masks
    assert bucket_seq_len([_mask([10], 512), _mask([130], 512)], 64, 512) == 192
    # cap wins over rounding
    assert bucket_seq_len([_mask([500], 512)], 64, 512) == 512
    assert bucket_seq_len([_mask([90], 512)], 64, 96) == 96
    # empty/None masks are ignored; floor is one multiple
    assert bucket_seq_len([None, _mask([], 512)], 64, 512) == 64


def test_bucket_trim_contiguous():
    d = {"text_ids": np.arange(40, dtype=np.int32).reshape(2, 20),
         "text_mask": _mask([3, 5], 20)}
    bucket_trim(d, "text_ids", "text_mask", 8)
    assert d["text_ids"].shape == (2, 8)
    assert d["text_mask"].shape == (2, 8)
    assert d["text_ids"].flags["C_CONTIGUOUS"]
    np.testing.assert_array_equal(d["text_ids"][0], np.arange(8))


@pytest.mark.parametrize("pooling", [PoolingType.CLS, PoolingType.MEAN,
                                     PoolingType.ATTENTION])
def test_logits_invariant_under_trim(pooling):
    """Padded-to-128 vs bucketed-to-64 inputs produce identical logits for
    the masked poolings (the trimmed columns are all-PAD)."""
    mcfg = dataclasses.replace(ModelConfig.small_2a(), pooling=pooling,
                               num_classes=2, max_text_len=128)
    model = TextClassifier(mcfg)
    rng = np.random.default_rng(0)
    lengths = rng.integers(3, 60, size=4)
    ids_full = np.zeros((4, 128), np.int32)
    for i, n in enumerate(lengths):
        ids_full[i, :n] = rng.integers(5, 200, size=n)
    mask_full = _mask(lengths, 128)
    variables = model.init(jax.random.key(0), ids_full, mask_full)
    out_full = model.apply(variables, ids_full, mask_full, train=False)
    out_trim = model.apply(variables, ids_full[:, :64], mask_full[:, :64],
                           train=False)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_trim),
                               atol=1e-5)


@pytest.mark.slow
def test_2a_driver_buckets(tmp_path, caplog):
    """The 2A driver trims the corpus to the bucketed length and still
    produces a scoreable fold TSV."""
    mcfg = dataclasses.replace(ModelConfig.small_2a(), max_text_len=512)
    cfg = TrainConfig(
        model=mcfg, epochs=1,
        data=DataConfig(train_manifest=TRAIN, dev_manifest=DEV,
                        batch_size=64, num_folds=5,
                        fold_over_train_plus_dev=True,
                        seq_bucket_multiple=64))
    import logging
    with caplog.at_level(logging.INFO, logger="mpmc_tpu.cli.experiments"):
        res = run_subtask_2a(cfg, out_dir=str(tmp_path), folds=[0])
    msgs = [r.message for r in caplog.records if "bucketed" in r.message]
    assert msgs, "driver did not log the bucketed length"
    # corpus max is ~90 words -> far below the 512 cap
    assert "512" not in msgs[0].split("(")[0]
    assert res.fold_results[0].best_macro_f1 > 0
