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
    dumps = [f for f in os.listdir(".") if f.startswith("nonfinite_")]
    assert len(dumps) == 1


def test_fit_profile_dir_writes_trace(rng, tmp_path):
    """cfg.profile_dir captures a steady-state jax.profiler trace."""
    cfg = TrainConfig(data=DataConfig(batch_size=8), epochs=1,
                      profile_dir=str(tmp_path / "trace"))
    train_step, eval_step = _stub_steps()
    data = _data(rng, 80)  # 10 dispatches > the trace window [3, 6)
    fit(_state(), train_step, eval_step, cfg, data)
    import glob
    assert glob.glob(str(tmp_path / "trace" / "**" / "*"), recursive=True)


def test_batch_iter_replicate_pad_and_valid_mask(rng):
    """Final short batch is padded with replicated *real* rows (never zeros)
    and the `valid` mask marks exactly the real rows (ADVICE r1: zero-row
    padding polluted gradients and BN batch_stats)."""
    from mpmc_tpu.train.loop import batch_iter
    data = {"x": np.arange(10, dtype=np.float32), "label": np.zeros(10, int)}
    batches = list(batch_iter(data, 4, with_valid=True))
    assert [n for _, n in batches] == [4, 4, 2]
    last, n = batches[-1]
    assert last["x"].shape == (4,)
    np.testing.assert_array_equal(last["valid"], [1, 1, 0, 0])
    # padded rows are replicated real samples, not zeros
    assert last["x"][2] in data["x"] and last["x"][3] in data["x"]


def test_prefetch_batches_order_and_put(rng):
    from mpmc_tpu.train.loop import batch_iter, prefetch_batches
    data = {"x": np.arange(20, dtype=np.float32),
            "label": np.zeros(20, int)}
    seen = []
    for dev_b, host_b, n in prefetch_batches(
            batch_iter(data, 8), put=lambda b: {k: v + 100 for k, v in
                                                b.items()}):
        seen.append((dev_b["x"][0], host_b["x"][0], n))
    assert [n for *_, n in seen] == [8, 8, 4]
    for dv, hv, _ in seen:
        assert dv == hv + 100  # put applied on the prefetch thread


def test_masked_loss_ignores_padded_rows(rng):
    """Train step with a `valid` mask: replicated padding rows contribute
    zero gradient — loss equals the unpadded-batch loss exactly."""
    from mpmc_tpu.train.step import (build_train_step_fn, create_train_state,
                                     make_optimizer)

    cfg = TrainConfig(data=DataConfig(batch_size=8), epochs=1, bf16=False)
    tx = make_optimizer(cfg, total_steps=10)

    def apply_fn(variables, batch, train, rngs, mutable):
        return batch["x"] @ variables["params"]["w"], {}

    step_fn = build_train_step_fn(apply_fn, cfg, tx)
    w = jnp.asarray(rng.standard_normal((3,)), jnp.float32)
    state0, _ = create_train_state({"params": {"w": w}}, tx)
    x6 = rng.standard_normal((6, 3)).astype(np.float32)
    y6 = (rng.random(6) > 0.5).astype(np.int32)

    padded = {"x": np.concatenate([x6, x6[:2]]),
              "label": np.concatenate([y6, y6[:2]]),
              "valid": np.array([1] * 6 + [0] * 2, np.float32)}
    exact = {"x": x6, "label": y6}
    s_pad, m_pad = step_fn(state0, padded, jax.random.key(0))
    s_ex, m_ex = step_fn(state0, exact, jax.random.key(0))
    np.testing.assert_allclose(float(m_pad["loss"]), float(m_ex["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_pad.params["w"]),
                               np.asarray(s_ex.params["w"]), rtol=1e-5)


def test_run_folds_data_parallel_sharded(rng, tmp_path):
    """Driver-level DP: one fold trained through _run_folds with the batch
    sharded over the virtual 8-device `data` mesh (VERDICT r1 item 5)."""
    import dataclasses as dc
    from mpmc_tpu.cli.experiments import _run_folds
    from mpmc_tpu.config import (LossType, MeshConfig, ModelConfig,
                                 PoolingType)
    from mpmc_tpu.models import TextClassifier

    mcfg = dc.replace(ModelConfig.tiny_2c(), num_classes=2,
                      pooling=PoolingType.ATTENTION)
    cfg = TrainConfig(model=mcfg, data=DataConfig(batch_size=16, num_folds=2),
                      mesh=MeshConfig(num_data_shards=8), epochs=8,
                      loss=LossType.CROSS_ENTROPY, learning_rate=3e-3)
    n = 64
    y = (rng.random(n) > 0.5).astype(np.int32)
    ids_arr = rng.integers(5, mcfg.text.vocab_size, (n, 16)).astype(np.int32)
    ids_arr[:, 0] = y * 3 + 1  # learnable from first token
    data = {"text_ids": ids_arr, "text_mask": np.ones_like(ids_arr),
            "label": y}
    res = _run_folds(cfg, lambda: TextClassifier(mcfg), "text", data,
                     [f"d/x_{i}.jpg" for i in range(n)], None, None,
                     str(tmp_path), "task2X", folds=[0])
    assert len(res.fold_results) == 1
    assert res.fold_results[0].best_macro_f1 > 0.8


def test_fit_resume_skips_completed_epochs(rng):
    """A restored state whose step count already covers k epochs resumes at
    epoch k instead of replaying everything from epoch 0 (ADVICE r2
    medium: resumed runs silently re-trained at the schedule's decayed/zero
    tail LR)."""
    cfg = TrainConfig(data=DataConfig(batch_size=8), epochs=3)
    train_step, eval_step = _stub_steps()
    data = _data(rng, 64)  # 8 steps/epoch, 24 total

    res = fit(_state(), train_step, eval_step, cfg, data)
    assert int(res.state.step) == 24

    # Restored after 2 full epochs: exactly one epoch (8 steps) remains.
    st = dataclasses.replace(_state(), step=jnp.asarray(16, jnp.int32))
    res2 = fit(st, train_step, eval_step, cfg, data)
    assert int(res2.state.step) == 24

    # Fully-complete state: trains zero steps (and warns, no crash).
    st = dataclasses.replace(_state(), step=jnp.asarray(24, jnp.int32))
    res3 = fit(st, train_step, eval_step, cfg, data)
    assert int(res3.state.step) == 24
    assert float(res3.state.params["w"]) == np.float32(0.1)  # untouched
