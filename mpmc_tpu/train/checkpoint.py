"""Checkpoint / resume (SURVEY.md §5.4 — absent in the reference).

The reference's custom loops never persist weights: a crash means a full
re-run, including BLIP caption recomputation (``Multimodal_example_task2C.py:
766-769`` only dumps prediction TSVs; captions recomputed per run :237-239).
This module adds orbax-backed checkpointing: best-k retention keyed on test
macro-F1, step-addressed saves, and exact-state resume (params, optimizer
moments, batch-norm statistics, step counter).
"""

from __future__ import annotations

import json
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
        clean = {k: float(v) for k, v in (metrics or {}).items()}
        self.manager.save(
            step,
            args=self._ocp.args.StandardSave(state),
            metrics=clean,
        )
        # Sidecar metrics record: resume restores best-F1 bookkeeping from
        # here (fit seeds its best-TSV threshold off the restored value so a
        # resumed run only rewrites TSVs when it beats the pre-crash best —
        # the exact-equivalence contract of test_crash_resume_equivalence).
        meta_path = os.path.join(self.directory, "ckpt_meta.json")
        meta: Dict[str, Dict] = {}
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as f:
                    meta = json.load(f)
            except (OSError, ValueError):  # pragma: no cover - corrupt meta
                meta = {}
        meta[str(step)] = clean
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        log.info("checkpoint saved @ step %d (%s)", step, metrics)

    def latest_metrics(self) -> Optional[Dict]:
        """Metrics recorded with the newest checkpoint (or None)."""
        step = self.manager.latest_step()
        if step is None:
            return None
        meta_path = os.path.join(self.directory, "ckpt_meta.json")
        if not os.path.exists(meta_path):
            return None
        try:
            with open(meta_path) as f:
                return json.load(f).get(str(step))
        except (OSError, ValueError):  # pragma: no cover - corrupt meta
            return None

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
