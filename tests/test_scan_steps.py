"""Dispatch-amortized training (cfg.scan_steps > 1): K optimizer steps fused
into one jitted lax.scan dispatch must be semantics-preserving — same
per-step losses, same eval cadence, same final parameters as per-step
dispatch (train/step.make_scan_train_step, train/loop._scan_group_plan)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpmc_tpu.config import DataConfig, TrainConfig
from mpmc_tpu.train.loop import _scan_group_plan, _scan_groups, batch_iter, fit
from mpmc_tpu.train.step import (TrainState, build_train_step_fn,
                                 create_train_state, make_optimizer,
                                 make_scan_train_step)


def test_scan_group_plan_respects_eval_boundaries():
    # 13 steps, eval at 6, 12, 13 (check_interval=6) — groups of k=4 must
    # never straddle 6/12/13.
    plan = _scan_group_plan(13, check_interval=6, k=4, eval_on=True)
    assert sum(plan) == 13
    pos, boundaries = 0, {6, 12, 13}
    for g in plan:
        nxt = pos + g
        assert not any(pos < b < nxt for b in boundaries)
        pos = nxt
    assert plan == [4, 2, 4, 2, 1]


def test_scan_group_plan_no_eval():
    assert _scan_group_plan(10, check_interval=5, k=4, eval_on=False) == \
        [4, 4, 2]
    assert _scan_group_plan(8, check_interval=4, k=8, eval_on=False) == [8]


def test_scan_groups_stack_roundtrip(rng):
    data = {"x": np.arange(20, dtype=np.float32), "label": np.zeros(20, int)}
    singles = list(batch_iter(data, 4, with_valid=True))  # 5 steps
    plan = _scan_group_plan(5, check_interval=5, k=2, eval_on=True)
    out = list(_scan_groups(iter(singles), plan, 2))
    # 2 stacked groups of 2 + 1 single
    assert [isinstance(nv, list) for _, nv in out] == [True, True, False]
    stacked, nv = out[0]
    assert stacked["x"].shape == (2, 4)
    np.testing.assert_array_equal(stacked["x"][0], singles[0][0]["x"])
    np.testing.assert_array_equal(stacked["x"][1], singles[1][0]["x"])
    assert nv == [singles[0][1], singles[1][1]]


def test_scan_train_step_equals_sequential(rng):
    """make_scan_train_step(K) ≡ K sequential build_train_step_fn calls with
    the same per-step keys: identical final params and stacked metrics."""
    K = 3
    cfg = TrainConfig(data=DataConfig(batch_size=8), epochs=1, bf16=False,
                      scan_steps=K, learning_rate=1e-2)
    tx = make_optimizer(cfg, total_steps=10)

    def apply_fn(variables, batch, train, rngs, mutable):
        return batch["x"] @ variables["params"]["w"], {}

    w = jnp.asarray(rng.standard_normal((3,)), jnp.float32)
    state0, _ = create_train_state({"params": {"w": w}}, tx)
    batches = [{"x": rng.standard_normal((8, 3)).astype(np.float32),
                "label": (rng.random(8) > 0.5).astype(np.int32)}
               for _ in range(K)]
    key = jax.random.key(7)
    keys = jax.random.split(key, K)

    step_fn = build_train_step_fn(apply_fn, cfg, tx)
    st = state0
    seq_losses = []
    for b, kk in zip(batches, keys):
        st, m = step_fn(st, b, kk)
        seq_losses.append(float(m["loss"]))

    scan_step = make_scan_train_step(apply_fn, cfg, tx, donate=False)
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    st_scan, ms = scan_step(state0, stacked, key)

    np.testing.assert_allclose(np.asarray(ms["loss"]), seq_losses, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st_scan.params["w"]),
                               np.asarray(st.params["w"]), rtol=1e-6)
    assert int(st_scan.step) == K


def _stub_steps():
    """Deterministic 1-param stub (rng-free) so scan and per-step fits are
    bit-comparable."""

    def train_step(state, batch, rng_):
        w = state.params["w"]

        def loss_fn(w):
            p = jax.nn.sigmoid(w * batch["x"])
            return jnp.mean((p - batch["label"]) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(w)
        new = TrainState(step=state.step + 1, params={"w": w - 0.5 * g},
                         batch_stats=state.batch_stats,
                         opt_state=state.opt_state)
        return new, {"loss": loss, "grad_norm": jnp.abs(g)}

    def scan_step(state, batches, rng_):
        def body(st, b):
            return train_step(st, b, rng_)

        return jax.lax.scan(body, state, batches)

    def eval_step(state, batch):
        p = jax.nn.sigmoid(state.params["w"] * batch["x"])
        return p, jnp.zeros_like(p)

    return train_step, scan_step, eval_step


def _data(rng, n):
    y = (rng.random(n) > 0.5).astype(np.int32)
    x = (y * 2.0 - 1.0) + rng.standard_normal(n) * 0.3
    return {"x": x.astype(np.float32), "label": y}


def _state():
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params={"w": jnp.asarray(0.1)},
                      batch_stats={}, opt_state=())


def test_fit_with_scan_matches_per_step(rng):
    """Full fit(): scan-fused dispatch reproduces per-step dispatch exactly
    (same data order, same eval cadence, same history) when the model is
    rng-free."""
    train_step, scan_step, eval_step = _stub_steps()
    data = _data(rng, 60)  # 8 batches of 8 (last padded), interval 4
    base = TrainConfig(data=DataConfig(batch_size=8), epochs=2,
                       eval_per_epoch=2)
    res_plain = fit(_state(), train_step, eval_step, base, data,
                    test_data=data)
    cfg_scan = dataclasses.replace(base, scan_steps=3)
    res_scan = fit(_state(), train_step, eval_step, cfg_scan, data,
                   test_data=data, scan_train_step=scan_step)
    assert len(res_scan.history) == len(res_plain.history)
    for a, b in zip(res_scan.history, res_plain.history):
        assert a["epoch"] == b["epoch"] and a["batch"] == b["batch"]
        assert a["test_f1"] == pytest.approx(b["test_f1"])
        assert a["test_loss"] == pytest.approx(b["test_loss"], rel=1e-6)
    np.testing.assert_allclose(float(res_scan.state.params["w"]),
                               float(res_plain.state.params["w"]), rtol=1e-6)


def test_fit_scan_nonfinite_abort_names_inner_step(rng, tmp_path,
                                                   monkeypatch):
    """A NaN inside a scan group is still detected and attributed to the
    right step index within the group."""
    import os
    monkeypatch.chdir(tmp_path)
    cfg = TrainConfig(data=DataConfig(batch_size=8), epochs=1, scan_steps=2)

    def bad_scan(state, batches, rng_):
        k = batches["x"].shape[0]
        losses = jnp.array([1.0, float("nan")])[:k]
        return state, {"loss": losses, "grad_norm": jnp.ones(k)}

    def ok_step(state, batch, rng_):
        return state, {"loss": jnp.asarray(1.0), "grad_norm": jnp.asarray(1.0)}

    _, _, eval_step = _stub_steps()
    data = _data(rng, 32)  # 4 steps → plan [2, 2] with interval 2
    with pytest.raises(FloatingPointError, match="batch 2"):
        fit(_state(), ok_step, eval_step, cfg, data,
            scan_train_step=bad_scan)
    assert any(f.startswith("nonfinite_") for f in os.listdir("."))


def test_run_eval_scan_matches_per_batch(rng):
    """run_eval with a scan-fused eval step returns identical probs/metrics
    to per-batch dispatch (groups of K batches + remainder singles)."""
    from mpmc_tpu.train.loop import run_eval
    _, _, eval_step = _stub_steps()

    def scan_eval(state, batches):
        return jax.lax.map(lambda b: eval_step(state, b), batches)

    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params={"w": jnp.asarray(2.0)},
                       batch_stats={}, opt_state=())
    data = _data(rng, 53)  # 7 batches of 8 → plan [3, 3, 1]
    plain = run_eval(state, eval_step, data, 8)
    scanned = run_eval(state, eval_step, data, 8,
                       scan_eval_step=scan_eval, scan_k=3)
    np.testing.assert_allclose(scanned.probs, plain.probs, rtol=1e-6)
    assert scanned.macro_f1 == pytest.approx(plain.macro_f1)
    assert scanned.threshold == pytest.approx(plain.threshold)
    assert scanned.loss == pytest.approx(plain.loss)
    # fewer batches than scan_k → pure per-batch fallback, same answer
    small = {k: v[:10] for k, v in data.items()}
    a = run_eval(state, eval_step, small, 8,
                 scan_eval_step=scan_eval, scan_k=3)
    b = run_eval(state, eval_step, small, 8)
    np.testing.assert_allclose(a.probs, b.probs, rtol=1e-6)


def test_make_scan_eval_step_stacks(rng):
    """make_scan_eval_step == K independent make_eval_step calls."""
    from mpmc_tpu.config import DataConfig
    from mpmc_tpu.train.step import make_eval_step, make_scan_eval_step

    cfg = TrainConfig(data=DataConfig(batch_size=4), bf16=False)

    def apply_fn(variables, batch, train, rngs, mutable):
        return batch["x"] @ variables["params"]["w"], {}

    w = jnp.asarray(rng.standard_normal((3,)), jnp.float32)
    state = TrainState(step=jnp.zeros((), jnp.int32), params={"w": w},
                       batch_stats={}, opt_state=())
    batches = [{"x": rng.standard_normal((4, 3)).astype(np.float32),
                "label": (rng.random(4) > 0.5).astype(np.int32)}
               for _ in range(3)]
    single = make_eval_step(apply_fn, cfg)
    stacked_fn = make_scan_eval_step(apply_fn, cfg)
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    ps, ls = stacked_fn(state, stacked)
    assert ps.shape == (3, 4)
    for j, b in enumerate(batches):
        p, l = single(state, b)
        np.testing.assert_allclose(np.asarray(ps[j]), np.asarray(p),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ls[j]), np.asarray(l),
                                   rtol=1e-6)


def test_run_folds_scan_with_dp_sharding(rng, tmp_path):
    """Driver-level: scan_steps + data-parallel sharding together — the
    stacked [K, B, ...] batch shards on axis 1 over the virtual 8-device
    mesh (parallel.mesh.stacked_batch_sharding) and the fold still learns."""
    import dataclasses as dc
    from mpmc_tpu.cli.experiments import _run_folds
    from mpmc_tpu.config import (LossType, MeshConfig, ModelConfig,
                                 PoolingType)
    from mpmc_tpu.models import TextClassifier

    mcfg = dc.replace(ModelConfig.tiny_2c(), num_classes=2,
                      pooling=PoolingType.ATTENTION)
    cfg = TrainConfig(model=mcfg, data=DataConfig(batch_size=16, num_folds=2),
                      mesh=MeshConfig(num_data_shards=8), epochs=8,
                      loss=LossType.CROSS_ENTROPY, learning_rate=3e-3,
                      scan_steps=2)
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
