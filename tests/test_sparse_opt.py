"""Sparse (lazy) row-Adam parity vs dense Adam (train/sparse_opt.py).

Parity contract (see module docstring): exact Adam math on every row a
step's gradient touches; untouched rows frozen (torch SparseAdam
semantics); identical to dense Adam when every row is touched every step.
Also covers the production path: make_optimizer(embedding_optimizer =
'sparse') inside build_train_step_fn on a real TextClassifier.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mpmc_tpu.train.sparse_opt import (SparseRows, apply_updates,
                                       with_sparse_embeddings)

B1, B2, EPS = 0.9, 0.999, 1e-8


def _make_pair(lr, support_rows):
    """(dense reference tx, sparse tx) over {'word_embeddings': [V,H],
    'dense': [H,H]} param trees with identical non-embed handling."""
    sched = optax.constant_schedule(lr)
    dense = optax.adam(sched, b1=B1, b2=B2, eps=EPS)

    def label(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: ("embed" if "word_embeddings" in
                          jax.tree_util.keystr(p) else "rest"), params)

    inner = optax.multi_transform(
        {"rest": optax.adam(sched, b1=B1, b2=B2, eps=EPS),
         "embed": optax.identity()}, label)
    sparse = with_sparse_embeddings(inner, sched, support_rows=support_rows,
                                    b1=B1, b2=B2, eps=EPS)
    return dense, sparse


def _params(v=12, h=8, seed=0):
    k = jax.random.key(seed)
    k1, k2 = jax.random.split(k)
    return {"word_embeddings": jax.random.normal(k1, (v, h), jnp.float32),
            "dense": jax.random.normal(k2, (h, h), jnp.float32)}


def _grad_like(params, touched_rows, seed):
    """Gradient tree whose embedding rows outside ``touched_rows`` are 0."""
    k = jax.random.key(seed)
    k1, k2 = jax.random.split(k)
    v, h = params["word_embeddings"].shape
    g = np.zeros((v, h), np.float32)
    g[touched_rows] = np.asarray(
        jax.random.normal(k1, (len(touched_rows), h)))
    return {"word_embeddings": jnp.asarray(g),
            "dense": jax.random.normal(k2, params["dense"].shape)}


def _run(tx, params, grads_seq, apply=None):
    apply = apply or optax.apply_updates
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update(g, state, params)
        params = apply(params, updates)
    return params


def test_all_rows_touched_equals_dense_adam():
    params = _params()
    v = params["word_embeddings"].shape[0]
    dense, sparse = _make_pair(lr=1e-2, support_rows=v)
    grads = [_grad_like(params, list(range(v)), seed=s) for s in range(4)]
    p_dense = _run(dense, params, grads)
    p_sparse = _run(sparse, params, grads, apply=apply_updates)
    for key in params:
        np.testing.assert_allclose(p_dense[key], p_sparse[key],
                                   rtol=1e-6, atol=1e-7)


def test_touched_rows_match_dense_untouched_frozen():
    params = _params(v=16)
    dense, sparse = _make_pair(lr=5e-3, support_rows=6)
    touched = [1, 4, 5, 9]
    grads = [_grad_like(params, touched, seed=s) for s in range(3)]
    p_dense = _run(dense, params, grads)
    p_sparse = _run(sparse, params, grads, apply=apply_updates)
    e0 = np.asarray(params["word_embeddings"])
    es = np.asarray(p_sparse["word_embeddings"])
    ed = np.asarray(p_dense["word_embeddings"])
    # Touched rows see zero-grad on no step here, so lazy == dense exactly.
    np.testing.assert_allclose(es[touched], ed[touched], rtol=1e-6,
                               atol=1e-7)
    untouched = [i for i in range(16) if i not in touched]
    # Lazy semantics: untouched rows are frozen (dense Adam would move them
    # on decaying momentum after the first step — but every step here has
    # them at zero grad from step one, so dense also leaves them: momentum
    # stays exactly 0).  Assert frozen vs the INITIAL values.
    np.testing.assert_array_equal(es[untouched], e0[untouched])
    # Non-embed leaf always matches dense exactly.
    np.testing.assert_allclose(p_sparse["dense"], p_dense["dense"],
                               rtol=1e-6, atol=1e-7)


def test_lazy_freezes_rows_dense_would_keep_moving():
    """A row touched on step 1 then never again: dense Adam keeps nudging
    it on decaying momentum; lazy freezes it after step 1 — the documented
    divergence."""
    params = _params(v=10)
    dense, sparse = _make_pair(lr=1e-2, support_rows=4)
    grads = [_grad_like(params, [2], seed=0),
             _grad_like(params, [7], seed=1),
             _grad_like(params, [7], seed=2)]
    p_dense = _run(dense, params, grads)
    p_sparse = _run(sparse, params, grads, apply=apply_updates)
    es = np.asarray(p_sparse["word_embeddings"])
    ed = np.asarray(p_dense["word_embeddings"])
    after_step1 = apply_updates(
        params, _first_update(sparse, params, grads[0]))
    # Row 2 froze at its post-step-1 value under lazy…
    np.testing.assert_allclose(
        es[2], np.asarray(after_step1["word_embeddings"])[2], rtol=1e-6)
    # …while dense Adam kept moving it on momentum.
    assert np.abs(ed[2] - es[2]).max() > 1e-6


def _first_update(tx, params, g):
    state = tx.init(params)
    updates, _ = tx.update(g, state, params)
    return updates


def test_support_overflow_drops_smallest_rows_only():
    """With support_rows < touched rows, the K largest-norm rows still get
    the exact update; the overflow rows are skipped that step."""
    params = _params(v=12)
    _, sparse = _make_pair(lr=1e-2, support_rows=2)
    g = _grad_like(params, [3, 6, 8], seed=0)
    ge = np.asarray(g["word_embeddings"])
    norms = np.abs(ge).sum(axis=1)
    keep = set(np.argsort(-norms)[:2])
    updates = _first_update(sparse, params, g)
    p2 = apply_updates(params, updates)
    moved = set(np.nonzero(np.abs(np.asarray(
        p2["word_embeddings"] - params["word_embeddings"])).sum(axis=1)
        > 0)[0].tolist())
    assert moved == keep


def test_updates_are_sparse_rows_and_jittable():
    params = _params()
    _, sparse = _make_pair(lr=1e-2, support_rows=4)

    @jax.jit
    def step(params, state, g):
        updates, state = sparse.update(g, state, params)
        return apply_updates(params, updates), state

    state = sparse.init(params)
    g = _grad_like(params, [0, 5], seed=3)
    updates, _ = sparse.update(g, state, params)
    assert isinstance(updates["word_embeddings"], SparseRows)
    p2, state = step(params, state, g)
    p3, _ = step(p2, state, g)
    assert np.isfinite(np.asarray(p3["word_embeddings"])).all()


def test_make_optimizer_sparse_trains_text_classifier():
    """Production path: embedding_optimizer='sparse' through
    build_train_step_fn on a TextClassifier — loss decreases and the
    word-embedding table only moves on touched rows."""
    from mpmc_tpu.config import LossType, ModelConfig, TrainConfig
    from mpmc_tpu.models.classifier import TextClassifier
    from mpmc_tpu.train.step import (build_train_step_fn, create_train_state,
                                     make_optimizer)

    model_cfg = dataclasses.replace(ModelConfig.small_2a(), max_text_len=16)
    cfg = TrainConfig(model=model_cfg, epochs=1, learning_rate=1e-3,
                      lr_schedule="constant", embedding_optimizer="sparse",
                      embedding_support_rows=64, bf16=False,
                      loss=LossType.CROSS_ENTROPY)
    model = TextClassifier(model_cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, model_cfg.text.vocab_size, (8, 16)).astype(np.int32)
    mask = np.ones((8, 16), np.int32)
    labels = np.arange(8, dtype=np.int32) % 2
    variables = model.init(jax.random.key(0), ids[:2], mask[:2])

    def apply_fn(variables, batch, train, rngs, mutable):
        out = model.apply(variables, batch["text_ids"], batch["text_mask"],
                          train=train, rngs=rngs, mutable=mutable)
        return out if isinstance(out, tuple) else (out, {})

    tx = make_optimizer(cfg, total_steps=8)
    state, _ = create_train_state(variables, tx)
    step = jax.jit(build_train_step_fn(apply_fn, cfg, tx))
    table0 = np.asarray(jax.tree_util.tree_leaves(
        {k: v for k, v in state.params.items()})[0])  # placeholder below
    emb_path = None
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    for path, leaf in flat:
        if "word_embeddings" in jax.tree_util.keystr(path):
            emb_path, table0 = path, np.asarray(leaf)
    assert emb_path is not None
    batch = {"text_ids": jnp.asarray(ids), "text_mask": jnp.asarray(mask),
             "label": jnp.asarray(labels)}
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    table1 = None
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        if "word_embeddings" in jax.tree_util.keystr(path):
            table1 = np.asarray(leaf)
    moved = np.nonzero(np.abs(table1 - table0).sum(axis=1) > 0)[0]
    touched = np.unique(ids)
    assert set(moved.tolist()) <= set(touched.tolist())
    assert len(moved) > 0


@pytest.mark.slow  # heavy parity: covered by the per-round --runslow suite
def test_sparse_state_vmaps_for_fold_parallel():
    """The wrapper must survive vmap over a stacked-fold axis (the
    fold-parallel driver vmaps build_train_step_fn)."""
    params = _params(v=10, h=4)
    _, sparse = _make_pair(lr=1e-2, support_rows=4)
    F = 3
    stacked_p = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * F), params)
    state = jax.vmap(sparse.init)(stacked_p)
    g = _grad_like(params, [1, 2], seed=0)
    stacked_g = jax.tree_util.tree_map(lambda x: jnp.stack([x] * F), g)

    def one(p, s, g):
        u, s = sparse.update(g, s, p)
        return apply_updates(p, u), s

    p2, state = jax.vmap(one)(stacked_p, state, stacked_g)
    ref_u = _first_update(sparse, params, g)
    ref_p = apply_updates(params, ref_u)
    np.testing.assert_allclose(np.asarray(p2["word_embeddings"][0]),
                               np.asarray(ref_p["word_embeddings"]),
                               rtol=1e-6, atol=1e-7)
