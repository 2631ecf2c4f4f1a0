"""Prefetching host→device image pipeline.

The reference decodes + transforms every sample synchronously inside the
training loop's ``__getitem__`` with ``num_workers=0`` (SURVEY.md §3.1 "hot
CPU path, re-executed every epoch").  Here:

* the full split is decoded once (multi-threaded, C++/PIL backends) into a
  pinned uint8 host cache — at ArAIEval scale (2143×224²×3 ≈ 308 MB) this
  fits trivially in host RAM;
* batches are sliced from the cache and shipped to device ahead of use by a
  background prefetch thread (double buffering), so the TPU never waits on
  the host ("zero input-pipeline stalls" target, BASELINE.md);
* augmentation happens on device (``mpmc_tpu.image.augment``), so the host
  does no per-epoch work at all after the first pass.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from mpmc_tpu.image.decode import decode_batch


class ImagePipeline:
    def __init__(self, paths: Sequence[str], root: str = ".",
                 size: int = 224, grayscale: bool = False,
                 decode_threads: int = 16, strict: bool = False):
        self.paths = list(paths)
        self.root = root
        self.size = size
        self.grayscale = grayscale
        self.decode_threads = decode_threads
        self.strict = strict
        self._cache: Optional[np.ndarray] = None

    def preload(self) -> np.ndarray:
        """Decode the whole split once → uint8 [N, size, size, C]."""
        if self._cache is None:
            self._cache = decode_batch(self.paths, self.size, self.grayscale,
                                       self.root, self.decode_threads,
                                       strict=self.strict)
        return self._cache

    def __len__(self) -> int:
        return len(self.paths)

    def batches(self, indices: np.ndarray, batch_size: int,
                put: Callable[[np.ndarray], object] = lambda x: x,
                prefetch: int = 2) -> Iterator[object]:
        """Yield device-put uint8 batches with background prefetch.

        ``put`` is typically ``lambda x: jax.device_put(x, sharding)``; it runs
        on the prefetch thread so the H2D copy overlaps the previous step's
        compute (the reference pays this copy synchronously per step,
        ``Multimodal_example_task2C.py:703-708``).  Stall instrumentation
        lives in ``train.loop.prefetch_batches`` (the path the drivers and
        bench actually run) — not duplicated here.
        """
        cache = self.preload()
        starts = range(0, len(indices), batch_size)
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        STOP = object()

        def producer():
            for s in starts:
                take = indices[s:s + batch_size]
                batch = cache[take]
                if len(take) < batch_size:  # pad for static shapes
                    pad = np.zeros((batch_size - len(take),) + batch.shape[1:],
                                   batch.dtype)
                    batch = np.concatenate([batch, pad])
                q.put((put(batch), len(take)))
            q.put(STOP)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is STOP:
                break
            yield item
