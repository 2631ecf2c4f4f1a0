"""Device-resident dataset mode (DataConfig.device_resident): batches are
row-gathered in HBM inside the jitted step; only int32 indices cross the
host link.  Must be semantics-identical to streamed host batches."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpmc_tpu.config import DataConfig, TrainConfig
from mpmc_tpu.train.loop import DeviceData, fit, run_eval
from mpmc_tpu.train.step import (GatherSteps, TrainState,
                                 build_train_step_fn, create_train_state,
                                 make_gather_eval_step,
                                 make_gather_scan_train_step,
                                 make_gather_train_step, make_optimizer)


def test_gather_train_step_equals_host_batch(rng):
    """Gathering rows on device == slicing the same rows on host."""
    cfg = TrainConfig(data=DataConfig(batch_size=4), bf16=False,
                      learning_rate=1e-2)
    tx = make_optimizer(cfg, total_steps=10)

    def apply_fn(variables, batch, train, rngs, mutable):
        return batch["x"] @ variables["params"]["w"], {}

    w = jnp.asarray(rng.standard_normal((3,)), jnp.float32)
    state0, _ = create_train_state({"params": {"w": w}}, tx)
    data = {"x": rng.standard_normal((20, 3)).astype(np.float32),
            "label": (rng.random(20) > 0.5).astype(np.int32)}
    idx = np.array([3, 17, 4, 9], np.int32)
    valid = np.array([1, 1, 1, 0], np.float32)
    key = jax.random.key(0)

    host_batch = {k: v[idx] for k, v in data.items()}
    host_batch["valid"] = valid
    step_fn = build_train_step_fn(apply_fn, cfg, tx)
    s_ref, m_ref = step_fn(state0, host_batch, key)

    g_step = make_gather_train_step(apply_fn, cfg, tx, donate=False)
    s_got, m_got = g_step(state0, jax.device_put(data), idx, valid, key)
    np.testing.assert_allclose(float(m_got["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_got.params["w"]),
                               np.asarray(s_ref.params["w"]), rtol=1e-6)


def test_gather_scan_train_step_equals_sequential(rng):
    K = 3
    cfg = TrainConfig(data=DataConfig(batch_size=4), bf16=False,
                      scan_steps=K, learning_rate=1e-2)
    tx = make_optimizer(cfg, total_steps=10)

    def apply_fn(variables, batch, train, rngs, mutable):
        return batch["x"] @ variables["params"]["w"], {}

    w = jnp.asarray(rng.standard_normal((3,)), jnp.float32)
    state0, _ = create_train_state({"params": {"w": w}}, tx)
    data = {"x": rng.standard_normal((20, 3)).astype(np.float32),
            "label": (rng.random(20) > 0.5).astype(np.int32)}
    idx = rng.integers(0, 20, (K, 4)).astype(np.int32)
    valid = np.ones((K, 4), np.float32)
    key = jax.random.key(5)
    keys = jax.random.split(key, K)

    step_fn = build_train_step_fn(apply_fn, cfg, tx)
    st = state0
    seq = []
    for j in range(K):
        b = {k: v[idx[j]] for k, v in data.items()}
        b["valid"] = valid[j]
        st, m = step_fn(st, b, keys[j])
        seq.append(float(m["loss"]))

    g_scan = make_gather_scan_train_step(apply_fn, cfg, tx, donate=False)
    st_g, ms = g_scan(state0, jax.device_put(data), idx, valid, key)
    np.testing.assert_allclose(np.asarray(ms["loss"]), seq, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st_g.params["w"]),
                               np.asarray(st.params["w"]), rtol=1e-6)


def _stub_gather_steps():
    """rng-free stub model in both streamed and gather forms."""

    def train_step(state, batch, rng_):
        w = state.params["w"]

        def loss_fn(w):
            p = jax.nn.sigmoid(w * batch["x"])
            vec = (p - batch["label"]) ** 2
            v = batch.get("valid")
            if v is None:
                return jnp.mean(vec)
            return jnp.sum(vec * v) / jnp.maximum(jnp.sum(v), 1e-9)

        loss, g = jax.value_and_grad(loss_fn)(w)
        new = TrainState(step=state.step + 1, params={"w": w - 0.5 * g},
                         batch_stats=state.batch_stats,
                         opt_state=state.opt_state)
        return new, {"loss": loss, "grad_norm": jnp.abs(g)}

    def eval_step(state, batch):
        p = jax.nn.sigmoid(state.params["w"] * batch["x"])
        return p, jnp.zeros_like(p)

    def g_train(state, data, idx, valid, rng_):
        b = {k: v[idx] for k, v in data.items()}
        b["valid"] = valid
        return train_step(state, b, rng_)

    def g_eval(state, data, idx):
        return eval_step(state, {k: v[idx] for k, v in data.items()})

    def g_scan_train(state, data, idx, valid, rng_):
        def body(st, xs):
            ib, vb = xs
            b = {k: v[ib] for k, v in data.items()}
            b["valid"] = vb
            return train_step(st, b, rng_)

        return jax.lax.scan(body, state, (idx, valid))

    def g_scan_eval(state, data, idx):
        return jax.lax.map(
            lambda ib: eval_step(state, {k: v[ib] for k, v in data.items()}),
            idx)

    gather = GatherSteps(train=g_train, eval=g_eval,
                         scan_train=g_scan_train, scan_eval=g_scan_eval)
    return train_step, eval_step, gather


def _data(rng, n):
    y = (rng.random(n) > 0.5).astype(np.int32)
    x = (y * 2.0 - 1.0) + rng.standard_normal(n) * 0.3
    return {"x": x.astype(np.float32), "label": y}


def _state():
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params={"w": jnp.asarray(0.1)},
                      batch_stats={}, opt_state=())


def test_fit_device_resident_matches_streaming(rng):
    """fit() with DeviceData + GatherSteps reproduces the streamed run
    exactly: same shuffle order, same eval cadence, same final params —
    with and without scan fusion."""
    train_step, eval_step, gather = _stub_gather_steps()
    full = _data(rng, 80)
    tr_idx = np.arange(60)
    va_idx = np.arange(60, 80)
    train_d = {k: v[tr_idx] for k, v in full.items()}
    val_d = {k: v[va_idx] for k, v in full.items()}
    base = TrainConfig(data=DataConfig(batch_size=8), epochs=2,
                       eval_per_epoch=2)
    ref = fit(_state(), train_step, eval_step, base, train_d,
              test_data=val_d)
    dev_full = jax.device_put(full)
    for scan in (1, 3):
        cfg = dataclasses.replace(base, scan_steps=scan)
        got = fit(_state(), train_step, eval_step, cfg, train_d,
                  test_data=val_d, gather_steps=gather,
                  dev_train=DeviceData(dev_full, tr_idx),
                  dev_test=DeviceData(dev_full, va_idx))
        assert len(got.history) == len(ref.history)
        for a, b in zip(got.history, ref.history):
            assert a["batch"] == b["batch"]
            assert a["test_f1"] == pytest.approx(b["test_f1"])
        np.testing.assert_allclose(float(got.state.params["w"]),
                                   float(ref.state.params["w"]), rtol=1e-6)


def test_run_eval_device_resident(rng):
    _, eval_step, gather = _stub_gather_steps()
    data = _data(rng, 37)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params={"w": jnp.asarray(2.0)},
                       batch_stats={}, opt_state=())
    ref = run_eval(state, eval_step, data, 8)
    dev = DeviceData(jax.device_put(data), np.arange(37))
    got = run_eval(state, eval_step, data, 8, gather_eval=gather.eval,
                   gather_scan_eval=gather.scan_eval, scan_k=2, dev=dev)
    np.testing.assert_allclose(got.probs, ref.probs, rtol=1e-6)
    assert got.macro_f1 == pytest.approx(ref.macro_f1)


def test_driver_streaming_mode_still_works(rng, tmp_path):
    """device_resident=False keeps the streamed-batch path alive."""
    import dataclasses as dc
    from mpmc_tpu.cli.experiments import _run_folds
    from mpmc_tpu.config import (LossType, ModelConfig, PoolingType)
    from mpmc_tpu.models import TextClassifier

    mcfg = dc.replace(ModelConfig.tiny_2c(), num_classes=2,
                      pooling=PoolingType.CLS)
    cfg = TrainConfig(model=mcfg,
                      data=DataConfig(batch_size=16, num_folds=2,
                                      device_resident=False),
                      epochs=6, loss=LossType.CROSS_ENTROPY,
                      learning_rate=3e-3)
    n = 64
    y = (rng.random(n) > 0.5).astype(np.int32)
    ids_arr = rng.integers(5, mcfg.text.vocab_size, (n, 16)).astype(np.int32)
    ids_arr[:, 0] = y * 3 + 1
    data = {"text_ids": ids_arr, "text_mask": np.ones_like(ids_arr),
            "label": y}
    res = _run_folds(cfg, lambda: TextClassifier(mcfg), "text", data,
                     [f"d/x_{i}.jpg" for i in range(n)], None, None,
                     str(tmp_path), "task2X", folds=[0])
    assert res.fold_results[0].best_macro_f1 > 0.8
