"""Multi-process / multi-host initialization (SURVEY.md §5.8).

The reference has no distributed backend at all (its only latent path is HF
Trainer's misconfigured ``local_rank=1``, ``DistilBERT_example_task2A.py:61``
— never launched).  The TPU-native equivalent is ``jax.distributed``: on a
single host this is a no-op; on a multi-host slice it wires the coordination
service so ``jax.devices()`` spans the pod and the same mesh code scales,
with a ("dcn", "ici")-factorable axis layout kept by MeshConfig.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process; returns True if
    a multi-process runtime was set up, False for the single-process case."""
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("MPMC_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        log.info("jax.distributed initialized: process %d/%d",
                 jax.process_index(), jax.process_count())
        return True
    except Exception as e:  # pragma: no cover - env-specific
        log.warning("jax.distributed.initialize failed: %s", e)
        return False


def host_local_batch_slice(global_batch: int) -> slice:
    """The slice of the global batch this process feeds (per-host sharding of
    the input pipeline)."""
    import jax
    per = global_batch // max(jax.process_count(), 1)
    start = jax.process_index() * per
    return slice(start, start + per)
