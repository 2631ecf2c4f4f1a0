"""Profiling + per-step timing hooks (SURVEY.md §5.1).

The reference's only observability is printed loss/LR/grad-norm every 10
batches (``Multimodal_example_task2C.py:744-752``).  Here:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing TPU
  trace files viewable in TensorBoard/XProf;
* ``StepTimer`` — rolling step-time/throughput tracker the train loop can
  report from (memes/sec, p50/p95 step ms), the first-class metrics hook the
  reference lacks.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque, Dict, Optional


@contextlib.contextmanager
def trace(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 100):
        self.times: Deque[float] = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self, n: int = 1) -> None:
        """Record one dispatch covering ``n`` optimizer steps (scan-fused
        groups amortize their wall time over the steps they contain)."""
        now = time.perf_counter()
        if self._last is not None:
            dt = (now - self._last) / max(n, 1)
            self.times.extend([dt] * max(n, 1))
        self._last = now

    def stats(self, batch_size: int = 1) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        mean = sum(ts) / n
        return {
            "step_ms_mean": mean * 1e3,
            "step_ms_p50": ts[n // 2] * 1e3,
            "step_ms_p95": ts[min(int(n * 0.95), n - 1)] * 1e3,
            "items_per_sec": batch_size / mean,
        }
