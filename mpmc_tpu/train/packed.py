"""Packed fine-tune training plan: whole-epoch sequence packing.

Production consumer of ``ops/packing.py`` for the text drivers: each epoch,
the shuffled sample order is packed once into fixed-shape rows (the corpus
averages ~15 tokens vs the 128-token bucket — an ~8.6× padding ratio), and
training batches are groups of packed ROWS instead of per-sample rows.  The
loss stays per-sample: every batch carries fixed-size per-sample maps
(``row_of``/``slot_of``/``start_of`` localized to the batch) plus
``label``/``valid`` arrays padded to ``rows_per_batch × max_segments``, so
``build_train_step_fn``'s valid-weighted loss applies unchanged.  Eval runs
UNPACKED through the existing eval steps (identical numerics; the packed and
plain models share one parameter tree — ``models/classifier.py``).

Static shapes: first-fit-decreasing consumes samples in sorted-length
order, so its row count depends only on the length MULTISET — identical
for every shuffle of the same corpus.  ``__post_init__`` therefore packs
the unshuffled corpus once and uses that exact row count as the per-epoch
budget: no heuristic slack (a token-total bound underestimates FFD by up
to 11/9 for adversarial length mixes), no wasted all-padding rows, and
``pack_sequences(num_rows=...)`` can never raise mid-epoch.

Semantics note: packing changes BATCH COMPOSITION (a batch is ~G·8.6
co-packed samples instead of ``batch_size`` independent draws) — it is a
throughput mode, benched and quality-validated separately, not a bit-exact
reproduction of the per-sample recipe.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Tuple

import numpy as np

from mpmc_tpu.ops.packing import pack_sequences


@dataclasses.dataclass
class PackedTrainPlan:
    """Per-epoch packed batch factory consumed by ``train.loop.fit``.

    ``data`` must carry ``text_ids``/``text_mask``/``label``; batches are
    dicts with keys ``t_ids``/``t_segments``/``t_positions`` ([G, P]),
    ``t_row_of``/``t_slot_of``/``t_start_of``/``label``/``valid``
    ([G·max_segments]).
    """

    data: Dict[str, np.ndarray]
    pack_len: int
    rows_per_batch: int
    max_segments: int = 16

    def __post_init__(self):
        # FFD's row count is a function of the length multiset only (it
        # sorts by length before placing), so one unshuffled pack gives the
        # EXACT row count every epoch_iter shuffle will need.
        probe = pack_sequences(self.data["text_ids"], self.data["text_mask"],
                               self.pack_len, max_segments=self.max_segments)
        self.row_budget = probe.num_rows
        self.steps_per_epoch = -(-self.row_budget // self.rows_per_batch)
        self.samples_per_batch = self.rows_per_batch * self.max_segments

    def epoch_iter(self, rng: np.random.Generator,
                   ) -> Iterator[Tuple[Dict[str, np.ndarray], int]]:
        """Shuffle → pack the whole epoch → yield fixed-shape row batches.

        Yields ``(batch, n_valid)`` like ``train.loop.batch_iter`` so the
        scan-group stacking and prefetch machinery apply unchanged.
        """
        d = self.data
        n = len(d["label"])
        perm = rng.permutation(n)
        packed = pack_sequences(d["text_ids"][perm], d["text_mask"][perm],
                                self.pack_len, num_rows=self.row_budget,
                                max_segments=self.max_segments)
        labels = np.asarray(d["label"])[perm]
        G, B_cap = self.rows_per_batch, self.samples_per_batch
        for start in range(0, self.row_budget, G):
            rows = slice(start, start + G)
            ids = packed.ids[rows]
            if ids.shape[0] < G:  # pad the final row chunk
                pad = G - ids.shape[0]
                ids = np.pad(ids, ((0, pad), (0, 0)))
                segs = np.pad(packed.segments[rows], ((0, pad), (0, 0)))
                poss = np.pad(packed.positions[rows], ((0, pad), (0, 0)))
            else:
                segs = packed.segments[rows]
                poss = packed.positions[rows]
            members = np.nonzero((packed.row_of >= start)
                                 & (packed.row_of < start + G))[0]
            k = len(members)
            assert k <= B_cap, "max_segments cap violated"
            row_of = np.zeros(B_cap, np.int32)
            slot_of = np.zeros(B_cap, np.int32)
            start_of = np.zeros(B_cap, np.int32)
            label = np.zeros(B_cap, labels.dtype)
            row_of[:k] = packed.row_of[members] - start
            slot_of[:k] = packed.slot_of[members]
            start_of[:k] = packed.start_of[members]
            label[:k] = labels[members]
            valid = (np.arange(B_cap) < k).astype(np.float32)
            yield ({"t_ids": ids, "t_segments": segs, "t_positions": poss,
                    "t_row_of": row_of, "t_slot_of": slot_of,
                    "t_start_of": start_of, "label": label,
                    "valid": valid}, k)


def make_packed_text_apply_fn(packed_model):
    """Adapter from the packed batch layout to ``PackedTextClassifier`` —
    plugs into ``build_train_step_fn``/``make_scan_train_step`` unchanged."""

    def apply_fn(variables, batch, train, rngs, mutable):
        packed = {"ids": batch["t_ids"], "segments": batch["t_segments"],
                  "positions": batch["t_positions"],
                  "row_of": batch["t_row_of"], "slot_of": batch["t_slot_of"],
                  "start_of": batch["t_start_of"]}
        out = packed_model.apply(variables, packed, train=train, rngs=rngs,
                                 mutable=mutable)
        return out if isinstance(out, tuple) else (out, {})

    return apply_fn
