"""train layer: schedule, param groups, ROC/Youden metrics, batch iterator."""

import jax
import numpy as np
import pytest

from mpmc_tpu.config import TrainConfig
from mpmc_tpu.train.loop import batch_iter, pad_to
from mpmc_tpu.train.metrics import (optimal_threshold_youden, roc_curve,
                                    threshold_scan)
from mpmc_tpu.train.step import (_param_group, linear_warmup_schedule,
                                 make_optimizer)


def test_linear_warmup_schedule():
    s = linear_warmup_schedule(1.0, warmup_steps=10, total_steps=110)
    assert float(s(0)) == 0.0
    assert float(s(5)) == pytest.approx(0.5)
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(60)) == pytest.approx(0.5)
    assert float(s(110)) == pytest.approx(0.0)
    assert float(s(200)) == 0.0


def test_param_group_labels():
    # reference get_params grouping (Multimodal_example_task2C.py:645-664)
    class K:  # fake DictKey
        def __init__(self, key):
            self.key = key
    assert _param_group((K("text_model"), K("layer_0"))) == "encoder"
    assert _param_group((K("caption_text_model"), K("w"))) == "encoder"
    assert _param_group((K("image_model"), K("stem"))) == "encoder"
    assert _param_group((K("fusion"), K("gate_fc"))) == "head"
    assert _param_group((K("text_fc"), K("kernel"))) == "head"
    assert _param_group((K("output_fc"),)) == "head"


def test_optimizer_group_lr_scale():
    """encoder params update ~0.8× the head params under equal gradients."""
    import jax.numpy as jnp
    cfg = TrainConfig(learning_rate=1e-3, encoder_lr_scale=0.8,
                      warmup_fraction=0.0, grad_clip_norm=1e9)
    tx = make_optimizer(cfg, total_steps=100)
    params = {"text_model": {"w": jnp.ones(4)}, "head_fc": {"w": jnp.ones(4)}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    enc = float(updates["text_model"]["w"][0])
    head = float(updates["head_fc"]["w"][0])
    assert enc / head == pytest.approx(0.8, rel=1e-3)


def test_adam_mu_dtype_bf16():
    """cfg.adam_mu_dtype='bfloat16' stores the first moment in bf16 (halved
    HBM read-modify-write) while the variance stays f32; updates still flow."""
    import jax.numpy as jnp
    cfg = TrainConfig(learning_rate=1e-3, adam_mu_dtype="bfloat16",
                      warmup_fraction=0.0, grad_clip_norm=1e9)
    tx = make_optimizer(cfg, total_steps=10)
    params = {"text_model": {"w": jnp.ones(4)}, "head": {"w": jnp.ones(4)}}
    state = tx.init(params)
    mus = [x.dtype for x in jax.tree_util.tree_leaves(state)
           if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
    assert mus, "no bf16 accumulator found in optimizer state"
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert all(float(jnp.abs(u).sum()) > 0
               for u in jax.tree_util.tree_leaves(updates))


def test_roc_matches_sklearn(rng):
    from sklearn.metrics import roc_curve as sk_roc
    for _ in range(5):
        y = rng.integers(0, 2, 100)
        s = rng.random(100)
        ours = optimal_threshold_youden(y, s)
        fpr, tpr, thr = sk_roc(y, s)
        ref = thr[np.argmax(tpr - fpr)]
        assert ours == pytest.approx(ref)


def test_roc_curve_shape(rng):
    y = np.array([0, 0, 1, 1])
    s = np.array([0.1, 0.4, 0.35, 0.8])
    fpr, tpr, thr = roc_curve(y, s)
    assert fpr[0] == 0 and tpr[0] == 0
    assert fpr[-1] == 1 and tpr[-1] == 1


def test_threshold_scan_matches_reference_formula(rng):
    """100-point linspace argmax of binary F1 (combine_preds.py:34-47)."""
    from sklearn.metrics import f1_score
    y = rng.integers(0, 2, 200)
    p = rng.random(200)
    thr, best = threshold_scan(y, p)
    ts = np.linspace(0, 1, 100)
    scores = [f1_score(y, p > t) for t in ts]
    # The returned threshold must be on the reference's 100-point grid and
    # achieve the grid maximum (ties between grid points are arbitrary).
    assert best == pytest.approx(max(scores))
    assert f1_score(y, p > thr) == pytest.approx(best)
    assert any(thr == pytest.approx(t) for t in ts)


def test_batch_iter_pads_and_covers(rng):
    data = {"x": rng.standard_normal((10, 3)), "label": np.arange(10)}
    seen = []
    for batch, n_valid in batch_iter(data, 4):
        assert batch["x"].shape == (4, 3)
        seen.extend(batch["label"][:n_valid].tolist())
    assert sorted(seen) == list(range(10))


def test_batch_iter_shuffles(rng):
    data = {"label": np.arange(100)}
    order1 = [b["label"][:n].tolist()
              for b, n in batch_iter(data, 10, shuffle=True,
                                     rng=np.random.default_rng(1))]
    assert sorted(sum(order1, [])) == list(range(100))
    assert sum(order1, []) != list(range(100))


def test_pad_to():
    x = np.ones((3, 2))
    assert pad_to(x, 5).shape == (5, 2)
    assert pad_to(x, 3) is x


def test_constant_lr_schedule_no_decay():
    """lr_schedule='constant' reproduces the reference 2A recipe
    (textmodel_example_task2A.py:574-576, ``scheduler = None``): full-size
    updates even past total_steps, where linear_warmup decays to zero."""
    import jax.numpy as jnp

    from mpmc_tpu.config import TrainConfig
    from mpmc_tpu.train.step import make_optimizer

    params = {"w": jnp.ones(3)}
    g = {"w": jnp.ones(3)}

    def last_update(cfg):
        tx = make_optimizer(cfg, total_steps=10)
        state = tx.init(params)
        for _ in range(15):  # run past total_steps
            upd, state = tx.update(g, state, params)
        return float(jnp.abs(upd["w"]).max())

    const = last_update(TrainConfig(lr_schedule="constant",
                                    learning_rate=1e-3))
    decayed = last_update(TrainConfig(lr_schedule="linear_warmup",
                                      learning_rate=1e-3))
    assert const > 1e-4          # still stepping at full LR
    assert decayed < 1e-6        # schedule has decayed to zero

    import pytest as _pytest
    with _pytest.raises(ValueError):
        make_optimizer(TrainConfig(lr_schedule="cosine"), total_steps=10)


def test_adam_mu_bf16_training_parity(rng):
    """bf16 first-moment Adam (--adam-mu-dtype bfloat16) is a safe
    throughput lever: on a real small training problem the loss trajectory
    tracks f32-mu closely and both reach the same solution quality
    (BREAKDOWN.json: the f32 mu read-modify-write is part of the
    optimizer-HBM-bound 14 ms/step at bs16)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from mpmc_tpu.config import TrainConfig
    from mpmc_tpu.train.step import make_optimizer

    # 2-class logistic regression on separable-ish features
    n, d = 256, 16
    y = (rng.random(n) > 0.5).astype(np.int32)
    x = (rng.standard_normal((n, d)) + y[:, None] * 1.0).astype(np.float32)

    def losses_for(mu_dtype):
        cfg = TrainConfig(learning_rate=5e-2, adam_mu_dtype=mu_dtype,
                          lr_schedule="constant", grad_clip_norm=1.0)
        tx = make_optimizer(cfg, total_steps=100)
        params = {"w": jnp.zeros((d, 2)), "b": jnp.zeros((2,))}
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                logits = x @ p["w"] + p["b"]
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, opt2 = tx.update(g, opt, params)
            return optax.apply_updates(params, upd), opt2, loss

        out = []
        for _ in range(100):
            params, opt, loss = step(params, opt)
            out.append(float(loss))
        return np.asarray(out)

    f32 = losses_for(None)
    bf16 = losses_for("bfloat16")
    assert f32[-1] < 0.45 and bf16[-1] < 0.45          # both converge
    np.testing.assert_allclose(bf16[-1], f32[-1], atol=0.02)
    # trajectories track closely throughout
    assert np.max(np.abs(bf16 - f32)) < 0.05


def test_factored_embedding_optimizer(rng):
    """embedding_optimizer='factored' puts the [V,H] word-embedding tables
    on momentum-free factored-RMS (the Adafactor accumulator): their
    optimizer state shrinks from two [V,H] f32 arrays to [V]+[H] factors,
    every other parameter keeps Adam, and a small embedding-classification
    problem still converges (the HBM lever behind --embedding-optimizer;
    see BREAKDOWN.json's optimizer-bound roofline)."""
    import jax
    import jax.numpy as jnp
    import optax

    # optax only factors when the second-largest dim is >= 128 (real vocab
    # tables are 64000x768); keep the test table above that threshold.
    V, H = 256, 128
    init = np.random.default_rng(0)
    params = {
        "text_model": {
            "word_embeddings": {"embedding": jnp.asarray(
                init.standard_normal((V, H)) * 0.1, jnp.float32)},
            "layer_0": {"w": jnp.asarray(
                init.standard_normal((H, H)) / np.sqrt(H), jnp.float32)},
        },
        "output_fc": {"kernel": jnp.asarray(
            init.standard_normal((H, 2)) * 0.1, jnp.float32)},
    }

    def table_state_leaves(cfg):
        tx = make_optimizer(cfg, total_steps=100)
        state = tx.init(params)
        return tx, state, [x for x in jax.tree_util.tree_leaves(state)
                           if hasattr(x, "shape") and x.shape == (V, H)]

    # default adam: mu + nu per table -> two [V,H] state arrays
    _, _, dense = table_state_leaves(
        TrainConfig(learning_rate=1e-2, lr_schedule="constant"))
    assert len(dense) == 2
    # factored: no [V,H] state at all
    cfg = TrainConfig(learning_rate=1e-2, lr_schedule="constant",
                      embedding_optimizer="factored", grad_clip_norm=1e9)
    tx, state, fact = table_state_leaves(cfg)
    assert len(fact) == 0

    # updates flow to the table and it still trains: embedding-bag classifier
    n, s = 256, 6
    ids = rng.integers(0, V, (n, s)).astype(np.int32)
    y = (ids.max(axis=1) > V // 2).astype(np.int32)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            emb = p["text_model"]["word_embeddings"]["embedding"][ids]
            feats = jnp.tanh(emb.mean(axis=1) @ p["text_model"]["layer_0"]["w"])
            logits = feats @ p["output_fc"]["kernel"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt2, loss

    opt = state
    losses = []
    for _ in range(120):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5
    assert float(jnp.abs(
        params["text_model"]["word_embeddings"]["embedding"]).sum()) > 0


@pytest.mark.slow
def test_crash_resume_tsv_equivalence(tmp_path, monkeypatch):
    """End-to-end crash+resume equivalence (SURVEY.md §5.4; the reference
    has no checkpointing — a crash costs a full re-run): a 2A driver run
    killed mid-epoch right after its first committed checkpoint, then
    resumed with ``--resume``, must emit byte-identical final TSVs to an
    uninterrupted run.  Exercises step-granular resume (prefix replay
    without training), dropout-key replay, and best-F1 restoration from the
    checkpoint metrics sidecar (a reset best-F1 would rewrite TSVs at a
    lower post-resume score)."""
    import json

    from mpmc_tpu.cli.main import main
    from mpmc_tpu.train.checkpoint import Checkpointer

    rng = np.random.default_rng(7)

    def rows(n, off):
        out = []
        for k in range(n):
            y = k % 2
            stem = "xxqz zpfl" if y else "mmvr wkjd"
            noise = " ".join(f"n{rng.integers(40)}" for _ in range(4))
            out.append({"id": f"d/x{off + k}.jpg",
                        "text": f"{stem} {noise}",
                        "img_path": "",
                        "class_label": "propaganda" if y
                        else "not_propaganda"})
        return out

    (tmp_path / "tr.json").write_text(json.dumps(rows(48, 0)))
    (tmp_path / "dv.json").write_text(json.dumps(rows(16, 100)))

    def args(out, ckpt, resume=False):
        a = ["train", "--subtask", "2a", "--tiny", "--epochs", "3",
             "--num-folds", "2", "--fold", "0", "--batch-size", "8",
             "--lr", "1e-3",
             "-tr", str(tmp_path / "tr.json"),
             "-te", str(tmp_path / "dv.json"),
             "-o", str(tmp_path / out),
             "--checkpoint-dir", str(tmp_path / ckpt)]
        return a + ["--resume"] if resume else a

    # Uninterrupted reference run.
    assert main(args("outA", "ckptA")) == 0

    # Crashed run: die right after the FIRST committed checkpoint (mid-epoch
    # — eval_per_epoch=2 puts the first eval/checkpoint inside epoch 0).
    real_save, calls = Checkpointer.save, []

    def crashing_save(self, state, step, metrics=None):
        real_save(self, state, step, metrics)
        self.wait()  # commit — orbax makes mid-write crashes atomic anyway
        calls.append(step)
        raise KeyboardInterrupt("injected crash after first checkpoint")

    monkeypatch.setattr(Checkpointer, "save", crashing_save)
    with pytest.raises(KeyboardInterrupt):
        main(args("outB", "ckptB"))
    assert len(calls) == 1
    monkeypatch.setattr(Checkpointer, "save", real_save)

    # Resume and run to completion.
    assert main(args("outB", "ckptB", resume=True)) == 0

    out_a, out_b = tmp_path / "outA", tmp_path / "outB"
    tsvs = sorted(p.name for p in out_a.glob("*.tsv"))
    assert tsvs, "uninterrupted run emitted no TSVs"
    assert sorted(p.name for p in out_b.glob("*.tsv")) == tsvs
    for name in tsvs:
        assert (out_a / name).read_bytes() == (out_b / name).read_bytes(), \
            f"{name} differs between uninterrupted and crash+resume runs"
