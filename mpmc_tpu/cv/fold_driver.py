"""Fold-parallel cross-validation driver: all k folds train at once.

The reference trains folds strictly sequentially (5× the wall-clock,
``Multimodal_example_task2C.py:882-885``) or as manually-launched processes
(``textmodel_example_task2A.py:186-192``).  Here the k per-fold model replicas
are stacked on a leading ``fold`` axis, sharded over the mesh's ``fold``
dimension, and every optimizer step advances all folds in one SPMD program
(``parallel.fold_parallel``); each fold samples batches from its own train
indices, so the stacked batch is [F, B, ...] sharded (fold, data).

Eval runs the vmapped eval step on the shared test split and returns per-fold
probabilities — feeding the same TSV/ensembling surface as the sequential
driver.

With ``DataConfig.device_resident`` (default) the full dataset lives in HBM
(replicated across the mesh) and each dispatch ships only [K, F, B] int32
row indices; with ``cfg.scan_steps > 1`` K steps of all folds fuse into one
launch (parallel.fold_parallel.make_fold_parallel_gather_scan_step).
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, List, Optional

import numpy as np

from mpmc_tpu.config import TrainConfig
from mpmc_tpu.cv.kfold import stratified_kfold
from mpmc_tpu.io.scorer import macro_f1
from mpmc_tpu.io.tsv import write_label_tsv, write_prob_tsv
from mpmc_tpu.train.loop import pad_to
from mpmc_tpu.train.metrics import optimal_threshold_youden

log = logging.getLogger(__name__)


def fit_folds_parallel(cfg: TrainConfig, init_fold_state: Callable,
                       step_fn: Callable, eval_fn: Callable,
                       full_data: Dict[str, np.ndarray],
                       test_data: Dict[str, np.ndarray],
                       test_ids: List[str], mesh,
                       tsv_prefix: Optional[str] = None,
                       run_id: str = "fold-parallel") -> List[Dict]:
    """Train all folds simultaneously.

    init_fold_state(fold) -> TrainState (unstacked);
    step_fn(state, batch, rng) -> (state, metrics)   [single-fold, unjitted];
    eval_fn(state, batch) -> (probs, loss)           [single-fold, unjitted].
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mpmc_tpu.parallel.fold_parallel import (
        make_fold_parallel_eval_step, make_fold_parallel_gather_eval_step,
        make_fold_parallel_gather_scan_step,
        make_fold_parallel_scan_train_step, make_fold_parallel_train_step,
        stack_states)

    F = cfg.data.num_folds
    bs = cfg.data.batch_size
    labels = full_data["label"]
    splits = stratified_kfold(labels, F, cfg.data.fold_seed)

    states = stack_states([init_fold_state(k) for k in range(F)])
    scan_k = max(cfg.scan_steps, 1)
    use_gather = cfg.data.device_resident
    fold_sh = NamedSharding(mesh, P("fold"))
    batch_sh = NamedSharding(mesh, P("fold", "data"))
    scan_batch_sh = NamedSharding(mesh, P(None, "fold", "data"))
    scan_keys_sh = NamedSharding(mesh, P(None, "fold"))
    repl = NamedSharding(mesh, P())
    if use_gather:
        dev_data = jax.device_put(full_data, repl)
        dev_test = jax.device_put(test_data, repl)
        fpg_scan = (make_fold_parallel_gather_scan_step(step_fn, mesh,
                                                        scan_k)
                    if scan_k > 1 else None)
        fpg_one = make_fold_parallel_gather_scan_step(step_fn, mesh, 1)
        fpg_eval = make_fold_parallel_gather_eval_step(eval_fn, mesh)
        fp_step = fp_scan = fp_eval = None
    else:
        fp_step = make_fold_parallel_train_step(step_fn, mesh)
        fp_eval = make_fold_parallel_eval_step(eval_fn, mesh)
        fp_scan = (make_fold_parallel_scan_train_step(step_fn, mesh, scan_k)
                   if scan_k > 1 else None)
    states = jax.device_put(states, fold_sh)

    train_idx = [tr for tr, _ in splits]
    steps_per_epoch = max(max(len(t) for t in train_idx) // bs, 1)
    rngs = [np.random.default_rng(cfg.seed + k) for k in range(F)]
    key = jax.random.key(cfg.seed)

    def fold_rows(perms, step):
        """[F, B] absolute row indices: each fold samples its own train
        indices (wrap-around at the fold's epoch end — all rows real, so
        valid is all-ones, matching the streamed path's semantics)."""
        rows = []
        for k in range(F):
            take = perms[k][(step * bs) % len(perms[k]):][:bs]
            if len(take) < bs:  # wrap around
                take = np.concatenate([take, perms[k][:bs - len(take)]])
            rows.append(take)
        return np.stack(rows).astype(np.int32)

    def host_batch(perms, step):
        rows = fold_rows(perms, step)
        return {name: arr[rows] for name, arr in full_data.items()}

    for epoch in range(cfg.epochs):
        perms = [rng.permutation(idx) for rng, idx in zip(rngs, train_idx)]
        step = 0
        while step < steps_per_epoch:
            g = (scan_k if scan_k > 1
                 and steps_per_epoch - step >= scan_k else 1)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, g * F).reshape(g, F)
            if use_gather:
                # only [g, F, B] int32 rows cross the host link
                idx = np.stack([fold_rows(perms, step + j)
                                for j in range(g)])
                valid = np.ones((g, F, bs), np.float32)
                fn = fpg_scan if g > 1 else fpg_one
                states, metrics = fn(states, dev_data, idx, valid, keys)
                metrics = {k: v[-1] for k, v in metrics.items()}
            elif g > 1:
                group = [host_batch(perms, step + j) for j in range(g)]
                batch = jax.device_put(
                    {name: np.stack([gb[name] for gb in group])
                     for name in group[0]}, scan_batch_sh)
                states, metrics = fp_scan(
                    states, batch, jax.device_put(keys, scan_keys_sh))
                metrics = {k: v[-1] for k, v in metrics.items()}
            else:
                batch = jax.device_put(host_batch(perms, step), batch_sh)
                states, metrics = fp_step(
                    states, batch, jax.device_put(keys[0], fold_sh))
            step += g
        log.info("epoch %d: per-fold losses %s", epoch,
                 [round(float(x), 4) for x in np.asarray(metrics["loss"])])

    # ---- evaluation: all folds over the shared test split ----
    n = len(test_ids)
    probs = np.zeros((F, n), np.float32)
    for s in range(0, n, bs):
        if use_gather:
            idx = pad_to(np.arange(s, min(s + bs, n), dtype=np.int32), bs)
            p, _ = fpg_eval(states, dev_test, idx)
        else:
            chunk = {k: pad_to(v[s:s + bs], bs)
                     for k, v in test_data.items()}
            stacked = {k: np.broadcast_to(v, (F,) + v.shape).copy()
                       for k, v in chunk.items()}
            p, _ = fp_eval(states, jax.device_put(stacked, batch_sh))
        probs[:, s:s + bs] = np.asarray(p)[:, :min(bs, n - s)]

    results = []
    y = test_data.get("label")
    for k in range(F):
        thr = (optimal_threshold_youden(y, probs[k])
               if y is not None else 0.5)
        pred = (probs[k] > thr).astype(int)
        f1 = macro_f1(y, pred) if y is not None else float("nan")
        if tsv_prefix:
            write_prob_tsv(f"{tsv_prefix}_probs_fold_{k}.tsv", test_ids,
                           pred, probs[k], run_id)
            if k == 0:
                write_label_tsv(f"{tsv_prefix}.tsv", test_ids, pred, run_id)
        results.append({"fold": k, "macro_f1": f1, "threshold": thr,
                        "probs": probs[k]})
        log.info("fold %d: macro-F1 %.4f", k, f1)
    return results
