"""Training-loop semantics: eval cadence, Youden thresholding, best-F1 TSV
emission, non-finite failure detection — with a stub model for speed."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpmc_tpu.config import DataConfig, TrainConfig
from mpmc_tpu.train.loop import fit, run_eval
from mpmc_tpu.train.step import TrainState


def _stub_steps(weight_to_loss=None):
    """A 1-parameter 'model': logit = w * x; focal-ish loss = (sigmoid(wx)-y)^2."""

    def train_step(state, batch, rng):
        w = state.params["w"]

        def loss_fn(w):
            p = jax.nn.sigmoid(w * batch["x"])
            return jnp.mean((p - batch["label"]) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(w)
        new = TrainState(step=state.step + 1,
                         params={"w": w - 0.5 * g},
                         batch_stats=state.batch_stats,
                         opt_state=state.opt_state)
        return new, {"loss": loss, "grad_norm": jnp.abs(g)}

    def eval_step(state, batch):
        p = jax.nn.sigmoid(state.params["w"] * batch["x"])
        return p, jnp.zeros_like(p)

    return train_step, eval_step


def _data(rng, n):
    y = (rng.random(n) > 0.5).astype(np.int32)
    x = (y * 2.0 - 1.0) + rng.standard_normal(n) * 0.3
    return {"x": x.astype(np.float32), "label": y}


def _state():
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params={"w": jnp.asarray(0.1)},
                      batch_stats={}, opt_state=())


def test_fit_learns_and_emits_best_tsv(rng, tmp_path):
    cfg = TrainConfig(data=DataConfig(batch_size=8), epochs=3,
                      eval_per_epoch=2)
    train_step, eval_step = _stub_steps()
    data = _data(rng, 64)
    ids = [f"data/a/im_{i}.jpg" for i in range(64)]
    prefix = str(tmp_path / "task2X")
    res = fit(_state(), train_step, eval_step, cfg, data, test_data=data,
              test_ids=ids, tsv_prefix=prefix, fold=3)
    assert res.best_macro_f1 > 0.9
    # eval ran eval_per_epoch times per epoch (8 batches, interval 4)
    assert len(res.history) == cfg.epochs * cfg.eval_per_epoch
    assert os.path.exists(f"{prefix}.tsv")
    assert os.path.exists(f"{prefix}_probs_fold_3.tsv")
    from mpmc_tpu.io.tsv import check_format
    assert check_format(f"{prefix}.tsv")


def test_run_eval_matches_reference_semantics(rng):
    """run_eval = full pass → Youden threshold → acc + macro-F1
    (reference test(), Multimodal_example_task2C.py:779-834)."""
    from sklearn.metrics import f1_score, roc_curve
    cfg = TrainConfig(data=DataConfig(batch_size=8))
    _, eval_step = _stub_steps()
    data = _data(rng, 50)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params={"w": jnp.asarray(2.0)},
                       batch_stats={}, opt_state=())
    res = run_eval(state, eval_step, data, 8)
    probs = 1 / (1 + np.exp(-2.0 * data["x"]))
    np.testing.assert_allclose(res.probs, probs, rtol=1e-5)
    fpr, tpr, thr = roc_curve(data["label"], probs)
    expected_thr = thr[np.argmax(tpr - fpr)]
    assert res.threshold == pytest.approx(expected_thr)
    pred = (probs > expected_thr).astype(int)
    assert res.macro_f1 == pytest.approx(
        f1_score(data["label"], pred, average="macro"))


def test_fit_aborts_on_nonfinite(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = TrainConfig(data=DataConfig(batch_size=8), epochs=1)

    def bad_step(state, batch, rng_):
        return state, {"loss": jnp.asarray(float("nan")),
                       "grad_norm": jnp.asarray(1.0)}

    _, eval_step = _stub_steps()
    data = _data(rng, 16)
    with pytest.raises(FloatingPointError, match="non-finite"):
        fit(_state(), bad_step, eval_step, cfg, data)
    dumps = [f for f in os.listdir(".") if f.startswith("nonfinite_step")]
    assert len(dumps) == 1
