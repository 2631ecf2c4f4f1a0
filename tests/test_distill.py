"""Classic→neural distillation (train/distill.py + TrainConfig.distill_lambda).

Pins: leak-free per-fold soft-target protocol, cache determinism, the loss
mixing math in train/step.loss_from_outputs, and the 2A driver end-to-end
with --distill-lambda.
"""

import json

import numpy as np
import pytest

from mpmc_tpu.cv.kfold import stratified_kfold
from mpmc_tpu.train.distill import ngram_soft_targets


def _corpus(n=60):
    """Balanced binary toy corpus with a word-level signal the char-n-gram
    teacher can learn."""
    texts, labels = [], []
    for i in range(n):
        y = i % 2
        word = "دعاية" if y else "عادي"
        texts.append(f"نص {word} رقم {i} كلمة")
        labels.append(y)
    return texts, np.array(labels)


def test_soft_targets_leak_free_and_cached(tmp_path):
    texts, labels = _corpus()
    splits = stratified_kfold(labels, 3, seed=42)
    soft = ngram_soft_targets(texts, labels, splits, inner_folds=3,
                              max_features=500,
                              cache_dir=str(tmp_path))
    assert soft.shape == (3, len(labels))
    for k, (tr, va) in enumerate(splits):
        # fold-val rows keep the 0.5 sentinel — the teacher never touched
        # them (no val-row leakage into fold k's training signal)
        assert np.all(soft[k][va] == 0.5)
        # every train row got a real teacher probability
        assert np.all((soft[k][tr] >= 0) & (soft[k][tr] <= 1))
        # the signal word is learnable → teacher clearly better than chance
        preds = (soft[k][tr] > 0.5).astype(int)
        assert (preds == labels[tr]).mean() > 0.8
    # cache round-trip is exact
    soft2 = ngram_soft_targets(texts, labels, splits, inner_folds=3,
                               max_features=500,
                               cache_dir=str(tmp_path))
    np.testing.assert_array_equal(soft, soft2)


def test_distill_loss_mixing_math():
    """λ=0 (or absent soft) reproduces the plain hard loss; λ=1 with
    one-hot soft targets equals the hard CE exactly; 0<λ<1 interpolates."""
    import jax
    import jax.numpy as jnp

    from mpmc_tpu.config import LossType, TrainConfig
    from mpmc_tpu.train.step import build_train_step_fn, create_train_state, \
        make_optimizer

    class _Lin:
        def init(self, key, x):
            return {"params": {"w": jnp.zeros((4, 2), jnp.float32)}}

    def apply_fn(variables, batch, train, rngs, mutable):
        out = batch["x"].astype(jnp.float32) @ \
            variables["params"]["w"].astype(jnp.float32)
        return out, {}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 4)).astype(np.float32)
    y = (rng.random(8) > 0.5).astype(np.int32)
    variables = {"params": {"w": jnp.asarray(
        rng.standard_normal((4, 2)).astype(np.float32))}}

    def loss_after_one_step(lam, soft=None):
        cfg = TrainConfig(loss=LossType.CROSS_ENTROPY, bf16=False,
                          distill_lambda=lam)
        tx = make_optimizer(cfg, total_steps=4)
        state, _ = create_train_state(dict(variables), tx)
        step = build_train_step_fn(apply_fn, cfg, tx)
        batch = {"x": x, "label": y}
        if soft is not None:
            batch["soft"] = soft
        _, m = jax.jit(step)(state, batch, jax.random.key(0))
        return float(m["loss"])

    base = loss_after_one_step(0.0)
    # λ=0 with soft present: identical to no distillation
    assert loss_after_one_step(0.0, soft=np.full(8, 0.5, np.float32)) \
        == pytest.approx(base, abs=1e-6)
    # λ=1 with one-hot soft == plain hard CE
    assert loss_after_one_step(1.0, soft=y.astype(np.float32)) \
        == pytest.approx(base, rel=1e-5)
    # interpolation: λ=0.5 with uniform soft sits strictly between the
    # hard loss and the λ=1-uniform loss
    uni = np.full(8, 0.5, np.float32)
    l_half = loss_after_one_step(0.5, soft=uni)
    l_one = loss_after_one_step(1.0, soft=uni)
    lo, hi = min(base, l_one), max(base, l_one)
    assert lo - 1e-6 <= l_half <= hi + 1e-6
    assert l_half == pytest.approx(0.5 * base + 0.5 * l_one, rel=1e-5)


def test_distill_cli_2a_end_to_end(tmp_path, capsys):
    """`train --subtask 2a --distill-lambda 0.5` runs the full driver:
    teacher fit (cross-fitted, cached), soft targets through the jitted
    step, TSVs emitted."""
    from mpmc_tpu.cli.main import main

    rng = np.random.default_rng(0)
    def make_manifest(path, n, start=0):
        rows = [{"id": f"d/img_{start+i}.png",
                 "img_path": f"d/img_{start+i}.png",
                 "text": ("دعاية قوية مهم " if (start + i) % 2 else
                          "نص عادي بسيط ") + f"رقم {start+i}",
                 "class_label": "propaganda" if (start + i) % 2
                 else "not_propaganda"} for i in range(n)]
        with open(path, "w") as f:
            json.dump(rows, f)
    tr, de = str(tmp_path / "tr.json"), str(tmp_path / "de.json")
    make_manifest(tr, 48)
    make_manifest(de, 12, start=100)
    rc = main(["train", "--subtask", "2a", "--tiny", "--epochs", "1",
               "--num-folds", "2", "--batch-size", "8",
               "--distill-lambda", "0.5",
               "-tr", tr, "-te", de, "-o", str(tmp_path / "out"),
               "--cache-dir", str(tmp_path / "cache")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "fold 0" in out and "fold 1" in out
    import glob
    probs = glob.glob(str(tmp_path / "out" / "*_probs_fold_0.tsv"))
    assert probs
    # Distilled runs tag their run_id (train/loop.py) so combine
    # --group-by-run-id separates plain vs distilled families.
    from mpmc_tpu.io.tsv import read_run_id
    assert read_run_id(probs[0]).endswith("_distill")
    # teacher cache was written
    assert glob.glob(str(tmp_path / "cache" / "distill_*.npz"))


@pytest.mark.slow
def test_distill_cli_2c_end_to_end(tmp_path, capsys):
    """2C: --distill-lambda mixes the teacher soft-CE into the focal loss
    (single-logit head) through the full multimodal driver."""
    from mpmc_tpu.cli.main import main

    def make_manifest(path, n, start=0):
        rows = [{"id": f"d/img_{start+i}.png",
                 "img_path": f"d/img_{start+i}.png",
                 "text": ("دعاية قوية مهم " if (start + i) % 2 else
                          "نص عادي بسيط ") + f"رقم {start+i}",
                 "class_label": "propaganda" if (start + i) % 2
                 else "not_propaganda"} for i in range(n)]
        with open(path, "w") as f:
            json.dump(rows, f)
    tr, de = str(tmp_path / "tr.json"), str(tmp_path / "de.json")
    make_manifest(tr, 48)
    make_manifest(de, 12, start=100)
    rc = main(["train", "--subtask", "2c", "--tiny", "--epochs", "1",
               "--num-folds", "2", "--fold", "0", "--batch-size", "8",
               "--distill-lambda", "0.5",
               "-tr", tr, "-te", de, "-o", str(tmp_path / "out"),
               "--image-root", str(tmp_path),
               "--cache-dir", str(tmp_path / "cache")])
    assert rc == 0
    import glob
    assert glob.glob(str(tmp_path / "out" / "*_probs_fold_0.tsv"))
    assert glob.glob(str(tmp_path / "cache" / "distill_*.npz"))
