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
from typing import Dict, Iterator, Optional, Tuple

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
        # Distillation soft targets (train/distill.py) are per-sample like
        # labels — thread them through the per-sample map so packed training
        # composes with --distill-lambda instead of silently dropping the
        # teacher signal.  0.5 on pad slots: valid=0 already masks the loss.
        soft_all = (np.asarray(d["soft"], np.float32)[perm]
                    if "soft" in d else None)
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
            batch = {"t_ids": ids, "t_segments": segs, "t_positions": poss,
                     "t_row_of": row_of, "t_slot_of": slot_of,
                     "t_start_of": start_of, "label": label,
                     "valid": valid}
            if soft_all is not None:
                soft = np.full(B_cap, 0.5, np.float32)
                soft[:k] = soft_all[members]
                batch["soft"] = soft
            yield (batch, k)


@dataclasses.dataclass
class PackedMultimodalPlan:
    """Per-batch packing for the 2C multimodal driver (``train --subtask 2c
    --pack-rows``): every training batch keeps the SAME ``batch_size``
    samples as unpacked training (image branch per-sample, loss/valid
    semantics identical — numerics are exactly the plain step's,
    parity-tested on ``PackedMultimodalClassifier``), but the text and
    caption tokens of those samples are packed into ``[R, pack_len]`` rows
    (FFD + segment-masked attention), so both text towers run ~padding-ratio
    fewer transformer rows.

    Static shapes: the row budget is the max FFD row count over the current
    epoch's batches (rounded up to even), kept monotone across epochs — a
    later epoch needing one more row recompiles once; within an epoch every
    batch is padded to the same budget so scan-fused stacking applies.

    With ``resident_images`` the pixel slice never leaves the host: batches
    carry an ``img_idx`` [B] int32 instead of ``image``, and the train step
    gathers the rows HBM→HBM from the device-resident dataset
    (train.step.make_packed_gather_train_step) — the per-dispatch host
    payload drops from ~MB of uint8 pixels to the packed token rows (~KB),
    same as DataConfig.device_resident unpacked training.  ``abs_idx`` maps
    the plan's LOCAL sample positions to rows of that resident store (the
    fold driver uploads the full manifest once; each fold's train split
    indexes into it).
    """

    data: Dict[str, np.ndarray]
    batch_size: int
    abs_idx: Optional[np.ndarray] = None
    resident_images: bool = False
    # Packed-row budgets are rounded up to this multiple.  Under data
    # parallelism the driver sets it to lcm(2, data-axis extent) so the
    # stacked [K, R, L] row axis shards evenly (parallel.mesh
    # stacked_batch_sharding shards axis 1).
    row_multiple: int = 2

    def __post_init__(self):
        n = len(self.data["label"])
        self.steps_per_epoch = -(-n // self.batch_size)
        self.has_caption = "caption_ids" in self.data
        self.text_len = int(self.data["text_ids"].shape[1])
        self.caption_len = (int(self.data["caption_ids"].shape[1])
                            if self.has_caption else 0)
        self._mult = max(int(self.row_multiple), 1)
        self._budget_t = self._mult
        self._budget_c = self._mult

    @staticmethod
    def _ffd_rows(mask_rows, pack_len) -> int:
        lengths = np.maximum(
            np.minimum(mask_rows.sum(axis=1), pack_len), 1)
        packed = pack_sequences(
            np.zeros((len(lengths), pack_len), np.int32),
            (np.arange(pack_len)[None, :] < lengths[:, None]), pack_len)
        return packed.num_rows

    def _pad_rows(self, packed, budget):
        pad = budget - packed.ids.shape[0]
        if pad < 0:
            raise ValueError("packed rows exceed the epoch budget")
        return (np.pad(packed.ids, ((0, pad), (0, 0))),
                np.pad(packed.segments, ((0, pad), (0, 0))),
                np.pad(packed.positions, ((0, pad), (0, 0))))

    def epoch_iter(self, rng: np.random.Generator,
                   ) -> Iterator[Tuple[Dict[str, np.ndarray], int]]:
        d = self.data
        n = len(d["label"])
        bs = self.batch_size
        idx = rng.permutation(n)
        starts = list(range(0, n, bs))
        # Pin this epoch's (even, monotone) row budgets before yielding so
        # every batch shares one static shape.
        takes = []
        for start in starts:
            take = idx[start:start + bs]
            if len(take) < bs:
                take = np.concatenate([take, np.resize(idx, bs - len(take))])
            takes.append((take, min(bs, n - start)))
        m = self._mult
        bt = max(self._ffd_rows(d["text_mask"][t], self.text_len)
                 for t, _ in takes)
        self._budget_t = max(self._budget_t, -(-bt // m) * m)
        if self.has_caption:
            bc = max(self._ffd_rows(d["caption_mask"][t], self.caption_len)
                     for t, _ in takes)
            self._budget_c = max(self._budget_c, -(-bc // m) * m)
        skip = {"text_ids", "text_mask", "caption_ids", "caption_mask"}
        if self.resident_images:
            skip.add("image")
        for take, k in takes:
            batch = {kk: d[kk][take] for kk in d if kk not in skip}
            if self.resident_images:
                src = (self.abs_idx[take] if self.abs_idx is not None
                       else take)
                batch["img_idx"] = np.asarray(src, np.int32)
            tp = pack_sequences(d["text_ids"][take], d["text_mask"][take],
                                self.text_len)
            ids, segs, poss = self._pad_rows(tp, self._budget_t)
            batch.update(t_ids=ids, t_segments=segs, t_positions=poss,
                         t_row_of=tp.row_of, t_slot_of=tp.slot_of,
                         t_start_of=tp.start_of)
            if self.has_caption:
                cp = pack_sequences(d["caption_ids"][take],
                                    d["caption_mask"][take],
                                    self.caption_len)
                cids, csegs, cposs = self._pad_rows(cp, self._budget_c)
                batch.update(c_ids=cids, c_segments=csegs,
                             c_positions=cposs, c_row_of=cp.row_of,
                             c_slot_of=cp.slot_of, c_start_of=cp.start_of)
            batch["valid"] = (np.arange(bs) < k).astype(np.float32)
            yield batch, k


def make_packed_multimodal_apply_fn(packed_model, augment_images: bool = False,
                                    grayscale: bool = False,
                                    eval_transform_only: bool = False):
    """Adapter from the :class:`PackedMultimodalPlan` batch layout to
    ``PackedMultimodalClassifier`` — plugs into ``build_train_step_fn``
    unchanged; mirrors ``cli.experiments.make_apply_fn``'s on-device image
    augmentation for uint8 batches."""

    def apply_fn(variables, batch, train, rngs, mutable):
        img = batch["image"]
        if augment_images:
            import jax as _jax
            import jax.numpy as _jnp
            from mpmc_tpu.image.augment import eval_preprocess, train_augment
            if train and not eval_transform_only:
                img = train_augment(rngs["augment"], img)
            else:
                img = eval_preprocess(img, grayscale=grayscale)
            leaves = _jax.tree_util.tree_leaves(variables["params"])
            if leaves and leaves[0].dtype == _jnp.bfloat16:
                img = img.astype(_jnp.bfloat16)
        text_packed = {"ids": batch["t_ids"],
                       "segments": batch["t_segments"],
                       "positions": batch["t_positions"],
                       "row_of": batch["t_row_of"],
                       "slot_of": batch["t_slot_of"],
                       "start_of": batch["t_start_of"]}
        caption_packed = None
        if "c_ids" in batch:
            caption_packed = {"ids": batch["c_ids"],
                              "segments": batch["c_segments"],
                              "positions": batch["c_positions"],
                              "row_of": batch["c_row_of"],
                              "slot_of": batch["c_slot_of"],
                              "start_of": batch["c_start_of"]}
        out = packed_model.apply(variables, text_packed, img, caption_packed,
                                 train=train, rngs=rngs, mutable=mutable)
        return out if isinstance(out, tuple) else (out, {})

    return apply_fn


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
