"""Sequence packing: many short samples per transformer row.

The ArAIEval corpus averages ~15 WordPiece tokens per meme while the
bucketed drivers pad every row to 128 (the reference pads to 512,
``Multimodal_example_task2C.py:276``) — an ~8.6× padding ratio measured
over the train manifest.  Packing lays several samples end-to-end in one
row and keeps them independent with *segment-masked* attention
(``ops.attention.dot_product_attention(segments=...)``: token i attends
token j iff both carry the same non-zero segment id — block-diagonal, and
numerically EXACTLY equivalent to running each sample in its own row,
because the -1e9 additive bias underflows foreign-segment probabilities to
0.0 in f32).  Per-segment position ids restart at 0 so absolute-position
embeddings also match the unpacked forward exactly.

Host side (this module, numpy): a deterministic first-fit-decreasing bin
packer producing fixed-shape packed arrays plus per-sample maps
(row/segment/start) for unpacking pooled features.  Device side:
``packed_sample_view`` re-views packed hidden states per sample so the
existing maskable poolers apply unchanged; CLS pooling is a single gather
at the segment starts.

This is a pure-throughput transform: the packed forward/backward is
numerically identical per sample (parity-tested), only the *batch
composition* changes (samples co-packed into one row share a device
dispatch).  The MXU win is the padding ratio: ~8× fewer wasted rows of
every matmul in the text/caption branches.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class PackedBatch:
    """Fixed-shape packed view of B variable-length samples in R rows."""

    ids: np.ndarray        # [R, P] int32 packed token ids (0-padded)
    segments: np.ndarray   # [R, P] int32 segment ids; 0 = padding
    positions: np.ndarray  # [R, P] int32, restart at 0 per segment
    row_of: np.ndarray     # [B] int32 — packed row of sample b
    slot_of: np.ndarray    # [B] int32 — segment id of sample b in its row
    start_of: np.ndarray   # [B] int32 — offset of sample b's first token

    @property
    def num_rows(self) -> int:
        return self.ids.shape[0]

    @property
    def num_samples(self) -> int:
        return self.row_of.shape[0]

    def asdict(self) -> Dict[str, np.ndarray]:
        return {"ids": self.ids, "segments": self.segments,
                "positions": self.positions, "row_of": self.row_of,
                "slot_of": self.slot_of, "start_of": self.start_of}


def pack_sequences(ids: np.ndarray, mask: np.ndarray, pack_len: int,
                   num_rows: Optional[int] = None,
                   max_segments: Optional[int] = None) -> PackedBatch:
    """First-fit-decreasing packing of ``[B, S]`` padded ids into
    ``[R, pack_len]`` rows.

    Deterministic (stable sort by decreasing length, ties by index).
    Samples longer than ``pack_len`` are truncated to it.  ``num_rows``
    pins R for static-shape pipelines (raises if the packing needs more);
    by default R is whatever first-fit-decreasing uses.  ``max_segments``
    caps the samples per row (bounds the per-batch sample count of
    fixed-shape training pipelines — ``train/packed.py``).
    """
    ids = np.asarray(ids)
    mask = np.asarray(mask)
    B = ids.shape[0]
    raw_lengths = mask.sum(axis=1).astype(np.int64)
    # The packer copies ids[b, :L], which is only the sample's tokens if the
    # mask is a contiguous prefix — reject left-padded / holey masks loudly
    # instead of silently packing padding as content.
    if not np.array_equal(
            mask.astype(bool),
            np.arange(mask.shape[1])[None, :] < raw_lengths[:, None]):
        raise ValueError("pack_sequences requires right-padded prefix masks "
                         "(mask rows must be 1…1 0…0)")
    lengths = np.minimum(raw_lengths, pack_len)
    lengths = np.maximum(lengths, 1)  # degenerate empty rows still get a slot
    order = np.argsort(-lengths, kind="stable")

    used: list[int] = []      # tokens used per open row
    slots: list[int] = []     # segments opened per row
    row_of = np.zeros(B, np.int32)
    slot_of = np.zeros(B, np.int32)
    start_of = np.zeros(B, np.int32)
    cap = max_segments or B
    for b in order:
        L = int(lengths[b])
        for r, u in enumerate(used):
            if u + L <= pack_len and slots[r] < cap:
                break
        else:
            r = len(used)
            used.append(0)
            slots.append(0)
        row_of[b] = r
        start_of[b] = used[r]
        slots[r] += 1
        slot_of[b] = slots[r]
        used[r] += L

    R = len(used)
    if num_rows is not None:
        if R > num_rows:
            raise ValueError(f"packing needs {R} rows of {pack_len} but "
                             f"num_rows={num_rows}")
        R = num_rows
    out_ids = np.zeros((R, pack_len), ids.dtype)
    segments = np.zeros((R, pack_len), np.int32)
    positions = np.zeros((R, pack_len), np.int32)
    for b in range(B):
        L = int(lengths[b])
        r, s0 = int(row_of[b]), int(start_of[b])
        out_ids[r, s0:s0 + L] = ids[b, :L]
        segments[r, s0:s0 + L] = int(slot_of[b])
        positions[r, s0:s0 + L] = np.arange(L)
    return PackedBatch(out_ids, segments, positions, row_of, slot_of,
                       start_of)


def packed_sample_view(hidden, packed: Dict):
    """Per-sample re-view of packed encoder output for maskable poolers.

    ``hidden`` [R, P, H] (device array) → ``([B, P, H], [B, P])``: row b of
    the result is sample b's packed row with a mask selecting exactly its
    own tokens — the existing ``Pooler`` masked modes (mean/attention)
    apply unchanged and match the unpacked forward exactly.
    """
    rows = hidden[packed["row_of"]]
    m = packed["segments"][packed["row_of"]] == packed["slot_of"][:, None]
    return rows, m.astype("int32")


def unpack_cls(hidden, packed: Dict):
    """CLS pooling over a packed batch: gather each sample's first token
    (its own CLS) — ``[R, P, H] -> [B, H]``."""
    return hidden[packed["row_of"], packed["start_of"]]
