"""Unified batch tokenization front-end (host side of the input pipeline).

Wraps the WordPiece / byte-BPE implementations (and, when built, the C++
batch tokenizer from ``native/tokenizer.cpp``) behind one API that emits the
fixed-shape int32 ``[B, L]`` id/mask arrays the jitted model consumes —
replacing the reference's per-sample ``tokenizer.encode_plus`` calls inside
``Dataset.__getitem__`` (``Multimodal_example_task2C.py:273-289``), which
re-tokenize every epoch.  Here tokenization is a one-time pass, cached in
memory, with the arrays sliced per batch.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from typing import Callable, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class TokenizedBatch:
    ids: np.ndarray    # int32 [B, L]
    mask: np.ndarray   # int32 [B, L]


class BatchTokenizer:
    """Tokenize a full split once; serve fixed-shape batches.

    ``backend`` is any object with ``encode_batch(texts, max_length) ->
    (ids, mask)`` — WordPieceTokenizer, ByteLevelBPETokenizer, or the ctypes
    wrapper over the C++ tokenizer (mpmc_tpu.text.native).
    """

    def __init__(self, backend, max_length: int,
                 normalizer: Optional[Callable[[str], str]] = None,
                 cache_dir: Optional[str] = None):
        self.backend = backend
        self.max_length = max_length
        self.normalizer = normalizer
        self.cache_dir = cache_dir

    def _cache_key(self, texts: Sequence[str]) -> str:
        h = hashlib.sha256()
        h.update(str(self.max_length).encode())
        h.update(type(self.backend).__name__.encode())
        if self.normalizer is not None:
            h.update(getattr(self.normalizer, "__name__", "norm").encode())
        for t in texts:
            h.update(t.encode("utf-8", "replace"))
            h.update(b"\x00")
        return h.hexdigest()[:24]

    def __call__(self, texts: Sequence[str]) -> TokenizedBatch:
        if self.cache_dir:
            key = self._cache_key(texts)
            path = os.path.join(self.cache_dir, f"tok_{key}.npz")
            if os.path.exists(path):
                z = np.load(path)
                return TokenizedBatch(z["ids"], z["mask"])
        if self.normalizer is not None:
            texts = [self.normalizer(t) for t in texts]
        ids, mask = self.backend.encode_batch(list(texts), self.max_length)
        batch = TokenizedBatch(ids.astype(np.int32), mask.astype(np.int32))
        if self.cache_dir:
            os.makedirs(self.cache_dir, exist_ok=True)
            np.savez(path, ids=batch.ids, mask=batch.mask)
        return batch
