"""HF-Trainer-style wrapper (reference C24/C25 — the organizer's
``DistilBERT_example_task2A.py`` / ``ResNet_example_task2B.py`` flow).

A thin object API over the functional train/eval steps for users coming from
``transformers.Trainer``: ``train()`` → ``evaluate()`` → ``predict()`` →
``save_model()``, with per-step loss logging like the reference's custom
``TrainerCallback`` (``DistilBERT_example_task2A.py:306-332``).  Unlike the
reference, ``save_model`` actually persists (orbax) and resume restores the
full state (SURVEY.md §5.4).
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional

import numpy as np

from mpmc_tpu.config import TrainConfig
from mpmc_tpu.train.loop import EvalResult, batch_iter, fit, run_eval
from mpmc_tpu.train.step import (create_train_state, make_eval_step,
                                 make_optimizer, make_train_step)

log = logging.getLogger(__name__)


class Trainer:
    def __init__(self, model, apply_fn: Callable, cfg: TrainConfig,
                 train_data: Dict[str, np.ndarray],
                 eval_data: Optional[Dict[str, np.ndarray]] = None,
                 init_variables=None):
        import jax
        self.cfg = cfg
        self.model = model
        self.apply_fn = apply_fn
        self.train_data = train_data
        self.eval_data = eval_data
        if init_variables is None:
            raise ValueError("pass init_variables (model.init output)")
        n = len(train_data["label"])
        bs = cfg.data.batch_size
        total_steps = ((n + bs - 1) // bs) * cfg.epochs
        self.tx = make_optimizer(cfg, total_steps)
        self.state, _ = create_train_state(init_variables, self.tx)
        self._train_step = make_train_step(apply_fn, cfg, self.tx)
        self._eval_step = make_eval_step(apply_fn, cfg)
        self._ckpt = None
        if cfg.checkpoint_dir:
            from mpmc_tpu.train.checkpoint import Checkpointer
            self._ckpt = Checkpointer(cfg.checkpoint_dir)
            if cfg.resume:
                self.state = self._ckpt.restore_latest(self.state)

    def train(self):
        result = fit(self.state, self._train_step, self._eval_step, self.cfg,
                     self.train_data, test_data=self.eval_data,
                     checkpointer=self._ckpt)
        self.state = result.state
        return result

    def evaluate(self) -> EvalResult:
        assert self.eval_data is not None
        return run_eval(self.state, self._eval_step, self.eval_data,
                        self.cfg.data.eval_batch_size)

    def predict(self, data: Dict[str, np.ndarray]) -> np.ndarray:
        """Per-sample propaganda probabilities for an (optionally unlabelled)
        split."""
        probs = []
        for batch, n_valid in batch_iter(data,
                                         self.cfg.data.eval_batch_size):
            p, _ = self._eval_step(self.state, batch)
            probs.append(np.asarray(p)[:n_valid])
        return np.concatenate(probs)

    def save_model(self, step: int = 0,
                   metrics: Optional[Dict] = None) -> None:
        if self._ckpt is None:
            raise ValueError("TrainConfig.checkpoint_dir not set")
        self._ckpt.save(self.state, step=step, metrics=metrics or {})
        self._ckpt.wait()
