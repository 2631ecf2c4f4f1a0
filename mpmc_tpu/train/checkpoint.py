"""Checkpoint / resume (SURVEY.md §5.4 — absent in the reference).

The reference's custom loops never persist weights: a crash means a full
re-run, including BLIP caption recomputation (``Multimodal_example_task2C.py:
766-769`` only dumps prediction TSVs; captions recomputed per run :237-239).
This module adds orbax-backed checkpointing: best-k retention keyed on test
macro-F1, step-addressed saves, and exact-state resume (params, optimizer
moments, batch-norm statistics, step counter).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

log = logging.getLogger(__name__)


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 2):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m.get("test_f1", 0.0),
                best_mode="max",
            ),
        )

    def save(self, state, step: int, metrics: Optional[Dict] = None) -> None:
        self.manager.save(
            step,
            args=self._ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        log.info("checkpoint saved @ step %d (%s)", step, metrics)

    def restore_latest(self, target) -> Any:
        """Restore the newest checkpoint into the structure of ``target``
        (a TrainState template); returns ``target`` unchanged if none exist."""
        step = self.manager.latest_step()
        if step is None:
            return target
        restored = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(target))
        log.info("restored checkpoint @ step %d", step)
        return restored

    def restore_raw_latest(self) -> Optional[Dict]:
        """Restore the newest checkpoint WITHOUT a structure template —
        returns the raw pytree (nested dicts of arrays) or None.

        Inference restores go through this: predict only needs params +
        batch_stats, and pinning the full TrainState structure would
        refuse checkpoints whose optimizer state differs from the predict
        default (``--embedding-optimizer factored/sparse``) or whose param
        layout is stage-split (``--pipeline-stages``, parallel/pp.py)."""
        step = self.manager.latest_step()
        if step is None:
            return None
        restored = self.manager.restore(
            step, args=self._ocp.args.StandardRestore())
        log.info("restored checkpoint @ step %d (raw)", step)
        return restored

    def wait(self) -> None:
        self.manager.wait_until_finished()
