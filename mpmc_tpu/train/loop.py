"""Training loop with in-epoch evaluation and best-F1 TSV emission.

Reproduces the reference loop's *semantics* (``Multimodal_example_task2C.py:
689-776``) on a fundamentally different execution model: batches are slices of
pre-tokenized host arrays (no per-sample re-tokenization each epoch), every
batch is padded to the static batch size so the step compiles exactly once,
eval runs ``eval_per_epoch`` times per epoch plus at epoch end, the optimal
ROC/Youden threshold is recomputed per eval (C18), and when test macro-F1
improves, label + probability TSVs are written (C17/C19 behavior — but with
deterministic, id-sorted row order instead of the reference's shuffled eval
loader order; the scorer sorts by id, so scores are unaffected).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from mpmc_tpu.config import TrainConfig
from mpmc_tpu.io.scorer import accuracy_score, macro_f1
from mpmc_tpu.io.tsv import write_label_tsv, write_prob_tsv
from mpmc_tpu.train.metrics import optimal_threshold_youden

log = logging.getLogger(__name__)


def pad_to(arr: np.ndarray, size: int) -> np.ndarray:
    if arr.shape[0] == size:
        return arr
    pad = [(0, size - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def batch_iter(data: Dict[str, np.ndarray], batch_size: int,
               shuffle: bool = False,
               rng: Optional[np.random.Generator] = None,
               ) -> Iterator[Tuple[Dict[str, np.ndarray], int]]:
    """Yield (batch, n_valid) with every batch padded to ``batch_size``
    (static shapes → one compilation)."""
    n = len(next(iter(data.values())))
    idx = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    for start in range(0, n, batch_size):
        take = idx[start:start + batch_size]
        batch = {k: pad_to(v[take], batch_size) for k, v in data.items()}
        yield batch, len(take)


@dataclasses.dataclass
class EvalResult:
    loss: float
    accuracy: float
    macro_f1: float
    threshold: float
    probs: np.ndarray  # [N] propaganda probability, dataset order


def run_eval(state, eval_step, data: Dict[str, np.ndarray],
             batch_size: int, put: Callable = lambda b: b) -> EvalResult:
    """Full pass → sigmoid probs → ROC/Youden threshold → acc + macro-F1
    (reference ``test()``, :779-834)."""
    probs_parts: List[np.ndarray] = []
    loss_parts: List[np.ndarray] = []
    for batch, n_valid in batch_iter(data, batch_size):
        p, l = eval_step(state, put(batch))
        probs_parts.append(np.asarray(p)[:n_valid])
        loss_parts.append(np.asarray(l)[:n_valid])
    probs = np.concatenate(probs_parts)
    losses = np.concatenate(loss_parts)
    labels = data.get("label")
    if labels is None:
        return EvalResult(float("nan"), float("nan"), float("nan"), 0.5, probs)
    labels = np.asarray(labels)
    thr = optimal_threshold_youden(labels, probs)
    pred = (probs > thr).astype(int)
    return EvalResult(float(losses.mean()), accuracy_score(labels, pred),
                      macro_f1(labels, pred), thr, probs)


@dataclasses.dataclass
class FitResult:
    state: object
    best_macro_f1: float
    best_threshold: float
    best_probs: Optional[np.ndarray]
    history: List[Dict]


def fit(state, train_step, eval_step, cfg: TrainConfig,
        train_data: Dict[str, np.ndarray],
        test_data: Optional[Dict[str, np.ndarray]] = None,
        val_data: Optional[Dict[str, np.ndarray]] = None,
        test_ids: Optional[List[str]] = None,
        val_ids: Optional[List[str]] = None,
        fold: int = 0,
        put: Callable = lambda b: b,
        tsv_prefix: Optional[str] = None,
        log_every: int = 10,
        checkpointer=None) -> FitResult:
    """Epoch loop with the reference's cadence: loss/LR/grad-norm logging
    every ``log_every`` steps, eval ``cfg.eval_per_epoch`` times per epoch,
    best-test-F1-triggered TSV dump."""
    bs = cfg.data.batch_size
    n_train = len(train_data["label"])
    steps_per_epoch = (n_train + bs - 1) // bs
    check_interval = max(steps_per_epoch // max(cfg.eval_per_epoch, 1), 1)
    data_rng = np.random.default_rng(cfg.seed + fold)
    dropout_key = jax.random.key(cfg.seed + fold)

    best_f1, best_thr, best_probs = -1.0, 0.5, None
    history: List[Dict] = []
    run_id = f"{cfg.team_name}_{cfg.run_id}"
    step_count = 0
    from mpmc_tpu.utils.profiling import StepTimer
    timer = StepTimer()

    for epoch in range(cfg.epochs):
        t0 = time.time()
        losses = []
        for bi, (batch, n_valid) in enumerate(
                batch_iter(train_data, bs, shuffle=True, rng=data_rng), 1):
            dropout_key, sub = jax.random.split(dropout_key)
            state, metrics = train_step(state, put(batch), sub)
            step_count += 1
            timer.tick()
            loss_val = float(metrics["loss"])
            if not np.isfinite(loss_val):
                # Failure detection (SURVEY.md §5.2-5.3): the reference's only
                # guard is a try/except tensor dump
                # (textmodel_example_task2A.py:407-413).  Dump the offending
                # batch + step metadata for postmortem and abort cleanly —
                # a checkpointer-equipped run resumes from the last good save.
                dump = f"nonfinite_step{step_count}_fold{fold}.npz"
                np.savez(dump, **{k: np.asarray(v)
                                  for k, v in batch.items()},
                         grad_norm=float(metrics["grad_norm"]))
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch} batch {bi} "
                    f"(grad_norm={float(metrics['grad_norm']):.3e}); "
                    f"batch dumped to {dump}")
            losses.append(loss_val)
            if bi % log_every == 0:
                log.info(
                    "TRAIN | Epoch [%d] | Batch [%d/%d] | Loss: %.4f | "
                    "Grad Norm: %.4f", epoch, bi, steps_per_epoch,
                    np.mean(losses[-log_every:]), float(metrics["grad_norm"]))

            if test_data is not None and (bi % check_interval == 0
                                          or bi == steps_per_epoch):
                t_res = run_eval(state, eval_step, test_data, bs, put)
                history.append({"epoch": epoch, "batch": bi,
                                "test_f1": t_res.macro_f1,
                                "test_loss": t_res.loss})
                log.info(" TEST | Epoch [%d] | Batch [%d/%d] | Loss: %.4f | "
                         "Acc: %.4f | F1: %.4f | thresh: %.4f", epoch, bi,
                         steps_per_epoch, t_res.loss, t_res.accuracy,
                         t_res.macro_f1, t_res.threshold)
                v_res = None
                if val_data is not None:
                    v_res = run_eval(state, eval_step, val_data, bs, put)
                    log.info("  VAL | Epoch [%d] | F1: %.4f", epoch,
                             v_res.macro_f1)
                if t_res.macro_f1 > best_f1:
                    best_f1 = t_res.macro_f1
                    best_thr = (cfg.emit_threshold
                                if cfg.emit_threshold is not None
                                else t_res.threshold)
                    best_probs = t_res.probs
                    if tsv_prefix and test_ids is not None:
                        pred = (t_res.probs > best_thr).astype(int)
                        write_label_tsv(f"{tsv_prefix}.tsv", test_ids, pred,
                                        run_id)
                        write_prob_tsv(f"{tsv_prefix}_probs_fold_{fold}.tsv",
                                       test_ids, pred, t_res.probs, run_id,
                                       prob_header=cfg.prob_header)
                        if (cfg.emit_val_tsv and v_res is not None
                                and val_ids is not None):
                            vthr = (cfg.emit_threshold
                                    if cfg.emit_threshold is not None
                                    else v_res.threshold)
                            vpred = (v_res.probs > vthr).astype(int)
                            write_prob_tsv(
                                f"{tsv_prefix}_val_fold_{fold}.tsv",
                                val_ids, vpred, v_res.probs, run_id,
                                prob_header=cfg.prob_header)
                    if checkpointer is not None:
                        checkpointer.save(state, step=step_count,
                                          metrics={"test_f1": best_f1})
        stats = timer.stats(batch_size=bs)
        log.info("TRAIN | Epoch [%d] done in %.1fs | loss %.4f | "
                 "%.1f items/s (p50 %.0f ms/step)", epoch,
                 time.time() - t0, float(np.mean(losses)),
                 stats.get("items_per_sec", 0.0),
                 stats.get("step_ms_p50", 0.0))

    return FitResult(state, best_f1, best_thr, best_probs, history)
