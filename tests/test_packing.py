"""Sequence packing (ops/packing.py + segment-masked attention + packed
classifiers): per-sample numerics must EXACTLY match the unpacked forward.

Checks: (a) packer invariants (every sample's tokens laid contiguously,
positions restart, deterministic, num_rows pinning); (b) segment-masked
attention == per-sample attention through the XLA path; (c)
PackedTextClassifier logits == TextClassifier logits for CLS / ATTENTION /
MEAN poolings and RoBERTa-style positions; (d) grads through the packed
forward match the unpacked grads; (e) PackedMultimodalClassifier ==
MultimodalClassifier on the tiny 2C config; (f) unmasked poolings are
rejected.  (The Pallas segment kernel is additionally parity-checked
against the XLA path on real TPU — fwd and bwd — before benching.)"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mpmc_tpu.config import ModelConfig, PoolingType, TextEncoderConfig
from mpmc_tpu.models.classifier import (MultimodalClassifier,
                                        PackedMultimodalClassifier,
                                        PackedTextClassifier, TextClassifier)
from mpmc_tpu.ops.attention import dot_product_attention
from mpmc_tpu.ops.packing import pack_sequences


def _ragged_batch(rng, B=10, S=24, vocab=100, min_len=3, max_len=20):
    ids = rng.integers(5, vocab, (B, S)).astype(np.int32)
    mask = np.zeros((B, S), np.int32)
    for i in range(B):
        L = int(rng.integers(min_len, max_len + 1))
        mask[i, :L] = 1
        ids[i, L:] = 0
    return ids, mask


def test_packer_invariants(rng):
    ids, mask = _ragged_batch(rng)
    packed = pack_sequences(ids, mask, pack_len=32)
    lengths = mask.sum(1)
    assert packed.num_samples == ids.shape[0]
    # tighter than one row per sample
    assert packed.num_rows < ids.shape[0]
    for b in range(ids.shape[0]):
        r, s0, L = packed.row_of[b], packed.start_of[b], int(lengths[b])
        np.testing.assert_array_equal(packed.ids[r, s0:s0 + L], ids[b, :L])
        np.testing.assert_array_equal(packed.segments[r, s0:s0 + L],
                                      packed.slot_of[b])
        np.testing.assert_array_equal(packed.positions[r, s0:s0 + L],
                                      np.arange(L))
    # padding is segment 0 everywhere else
    total = int(lengths.sum())
    assert int((packed.segments > 0).sum()) == total
    # deterministic
    packed2 = pack_sequences(ids, mask, pack_len=32)
    np.testing.assert_array_equal(packed.ids, packed2.ids)
    # num_rows pinning and overflow guard
    padded = pack_sequences(ids, mask, pack_len=32,
                            num_rows=packed.num_rows + 2)
    assert padded.num_rows == packed.num_rows + 2
    with pytest.raises(ValueError, match="rows"):
        pack_sequences(ids, mask, pack_len=32, num_rows=1)


def test_segment_attention_matches_per_sample(rng):
    """One packed row holding 3 samples == 3 independent rows (XLA path)."""
    H, D = 2, 8
    lens = [6, 5, 4]
    S = sum(lens) + 3  # some trailing padding
    q = rng.standard_normal((1, S, H, D)).astype(np.float32)
    k = rng.standard_normal((1, S, H, D)).astype(np.float32)
    v = rng.standard_normal((1, S, H, D)).astype(np.float32)
    seg = np.zeros((1, S), np.int32)
    off = 0
    for i, L in enumerate(lens):
        seg[0, off:off + L] = i + 1
        off += L
    packed_out = dot_product_attention(jnp.asarray(q), jnp.asarray(k),
                                       jnp.asarray(v), impl="xla",
                                       segments=jnp.asarray(seg))
    off = 0
    for i, L in enumerate(lens):
        solo = dot_product_attention(
            jnp.asarray(q[:, off:off + L]), jnp.asarray(k[:, off:off + L]),
            jnp.asarray(v[:, off:off + L]), impl="xla")
        np.testing.assert_allclose(np.asarray(packed_out[:, off:off + L]),
                                   np.asarray(solo), atol=1e-6,
                                   err_msg=f"segment {i}")
        off += L


def _model_pair(pooling=PoolingType.ATTENTION, roberta=False):
    tcfg = TextEncoderConfig(vocab_size=100, hidden_size=32, num_layers=2,
                             num_heads=4, intermediate_size=64,
                             max_position_embeddings=64,
                             roberta_style_positions=roberta,
                             type_vocab_size=0 if roberta else 2)
    mcfg = ModelConfig(text=tcfg, pooling=pooling, num_classes=2)
    return mcfg, TextClassifier(mcfg), PackedTextClassifier(mcfg)


@pytest.mark.parametrize("pooling,roberta", [
    (PoolingType.CLS, False),
    (PoolingType.ATTENTION, False),
    (PoolingType.MEAN, False),
    (PoolingType.CLS, True),
])
@pytest.mark.slow  # heavy parity: covered by the per-round --runslow suite
def test_packed_text_classifier_parity(pooling, roberta, rng):
    mcfg, plain, packed_model = _model_pair(pooling, roberta)
    ids, mask = _ragged_batch(rng)
    params = plain.init(jax.random.key(0), ids[:1], mask[:1])["params"]
    ref = plain.apply({"params": params}, ids, mask, train=False)
    packed = {k: jnp.asarray(v) for k, v in
              pack_sequences(ids, mask, pack_len=32).asdict().items()}
    out = packed_model.apply({"params": params}, packed, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_packed_grad_parity(rng):
    mcfg, plain, packed_model = _model_pair()
    ids, mask = _ragged_batch(rng)
    y = (rng.random(ids.shape[0]) > 0.5).astype(np.int32)
    params = plain.init(jax.random.key(0), ids[:1], mask[:1])["params"]
    packed = {k: jnp.asarray(v) for k, v in
              pack_sequences(ids, mask, pack_len=32).asdict().items()}

    def loss_plain(params):
        logits = plain.apply({"params": params}, ids, mask, train=False)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    def loss_packed(params):
        logits = packed_model.apply({"params": params}, packed, train=False)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    g_a = jax.jit(jax.grad(loss_plain))(params)
    g_b = jax.jit(jax.grad(loss_packed))(params)
    flat_a = dict(jax.tree_util.tree_leaves_with_path(g_a))
    flat_b = jax.tree_util.tree_leaves_with_path(g_b)
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_b:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_a[path]), atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow  # heavy parity: covered by the per-round --runslow suite
def test_packed_multimodal_parity(rng):
    mcfg = ModelConfig.tiny_2c()
    plain = MultimodalClassifier(mcfg)
    packed_model = PackedMultimodalClassifier(mcfg)
    B = 6
    ids, mask = _ragged_batch(rng, B=B, S=mcfg.max_text_len, min_len=3,
                              max_len=mcfg.max_text_len - 2)
    cap_ids, cap_mask = _ragged_batch(rng, B=B, S=mcfg.max_caption_len,
                                      vocab=mcfg.caption.vocab_size,
                                      min_len=2,
                                      max_len=mcfg.max_caption_len - 2)
    img = rng.random((B, mcfg.image.image_size, mcfg.image.image_size, 3)
                     ).astype(np.float32)
    variables = plain.init(jax.random.key(0), ids, mask, img, cap_ids,
                           cap_mask)
    ref = plain.apply(variables, ids, mask, img, cap_ids, cap_mask,
                      train=False)
    tp = {k: jnp.asarray(v) for k, v in
          pack_sequences(ids, mask, mcfg.max_text_len).asdict().items()}
    cp = {k: jnp.asarray(v) for k, v in
          pack_sequences(cap_ids, cap_mask,
                         mcfg.max_caption_len).asdict().items()}
    out = packed_model.apply(variables, tp, img, cp, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # same param tree → checkpoints interchangeable (eval_shape: structure
    # check needs no second full init compile)
    v2 = jax.eval_shape(packed_model.init, jax.random.key(1), tp, img, cp)
    assert (jax.tree_util.tree_structure(v2["params"])
            == jax.tree_util.tree_structure(variables["params"]))


def test_packed_train_plan_covers_epoch(rng):
    """Every sample appears exactly once per epoch with a correct local
    row/slot map; shapes are static across batches and epochs."""
    from mpmc_tpu.train.packed import PackedTrainPlan

    ids, mask = _ragged_batch(rng, B=37, S=24)
    labels = rng.integers(0, 2, 37).astype(np.int32)
    plan = PackedTrainPlan({"text_ids": ids, "text_mask": mask,
                            "label": labels}, pack_len=32, rows_per_batch=2,
                           max_segments=8)
    for _ in range(2):  # two epochs: budget must hold across shuffles
        seen = 0
        shapes = None
        for batch, k in plan.epoch_iter(np.random.default_rng(0)):
            cur = {name: v.shape for name, v in batch.items()}
            assert shapes is None or cur == shapes
            shapes = cur
            seen += k
            # every valid sample's tokens are where its map says
            for j in range(k):
                r, s0 = batch["t_row_of"][j], batch["t_start_of"][j]
                assert batch["t_segments"][r, s0] == batch["t_slot_of"][j]
            assert batch["valid"].sum() == k
        assert seen == 37


@pytest.mark.slow
def test_cli_train_2a_packed(tmp_path):
    """End-to-end 2A driver with --pack-rows: packed train steps + unpacked
    eval emit the standard fold TSVs (production integration of
    ops/packing.py, not a shelf feature)."""
    import os

    from mpmc_tpu.cli.main import main

    DEV = "/root/reference/data/arabic_memes_propaganda_araieval_24_dev.json"
    TRAIN = ("/root/reference/data/"
             "arabic_memes_propaganda_araieval_24_train.json")
    assert main(["train", "--subtask", "2a", "--small", "--epochs", "1",
                 "--num-folds", "5", "--fold", "0", "--batch-size", "8",
                 "--scan-steps", "2", "--pack-rows", "4",
                 "-tr", TRAIN, "-te", DEV, "-o", str(tmp_path)]) == 0
    tsvs = [f for f in os.listdir(tmp_path) if f.endswith(".tsv")]
    assert any("probs_fold_0" in f for f in tsvs)


def test_packed_rejects_unmasked_pooling(rng):
    mcfg, plain, packed_model = _model_pair(PoolingType.MAX)
    ids, mask = _ragged_batch(rng)
    packed = {k: jnp.asarray(v) for k, v in
              pack_sequences(ids, mask, pack_len=32).asdict().items()}
    with pytest.raises(ValueError, match="unmasked"):
        packed_model.init(jax.random.key(0), packed)


def test_packed_multimodal_plan_batches(rng):
    """PackedMultimodalPlan (2C --pack-rows): every batch carries exactly
    batch_size samples (identical composition to unpacked), the packed
    text/caption maps reconstruct those samples, and shapes are static
    within an epoch."""
    from mpmc_tpu.train.packed import (PackedMultimodalPlan,
                                       make_packed_multimodal_apply_fn)

    mcfg = ModelConfig.tiny_2c()
    B, n = 6, 21
    ids, mask = _ragged_batch(rng, B=n, S=mcfg.max_text_len, min_len=3,
                              max_len=mcfg.max_text_len - 2)
    cap_ids, cap_mask = _ragged_batch(rng, B=n, S=mcfg.max_caption_len,
                                      vocab=mcfg.caption.vocab_size,
                                      min_len=2,
                                      max_len=mcfg.max_caption_len - 2)
    img = rng.random((n, mcfg.image.image_size, mcfg.image.image_size, 3)
                     ).astype(np.float32)
    labels = rng.integers(0, 2, n).astype(np.int32)
    data = {"text_ids": ids, "text_mask": mask, "caption_ids": cap_ids,
            "caption_mask": cap_mask, "image": img, "label": labels}
    plan = PackedMultimodalPlan(data, batch_size=B)
    assert plan.steps_per_epoch == -(-n // B)

    plain = MultimodalClassifier(mcfg)
    variables = plain.init(jax.random.key(0), ids[:2], mask[:2], img[:2],
                           cap_ids[:2], cap_mask[:2])
    apply_fn = make_packed_multimodal_apply_fn(
        PackedMultimodalClassifier(mcfg))
    seen, shapes = 0, None
    for batch, k in plan.epoch_iter(np.random.default_rng(1)):
        cur = {name: v.shape for name, v in batch.items()}
        assert shapes is None or cur == shapes
        shapes = cur
        assert batch["image"].shape[0] == B and batch["label"].shape == (B,)
        seen += k
        # exact per-sample numerics vs the plain model on the same batch
        out, _ = apply_fn(variables, batch, train=False, rngs=None,
                          mutable=[])
        # rebuild the unpacked rows of this batch from the packed maps
        un_ids = np.zeros((B, mcfg.max_text_len), np.int32)
        un_mask = np.zeros((B, mcfg.max_text_len), np.int32)
        for j in range(B):
            r, s0 = batch["t_row_of"][j], batch["t_start_of"][j]
            seg = batch["t_slot_of"][j]
            sel = batch["t_segments"][r] == seg
            L = int(sel.sum())
            tok = batch["t_ids"][r][sel]
            un_ids[j, :L] = tok
            un_mask[j, :L] = 1
        un_cids = np.zeros((B, mcfg.max_caption_len), np.int32)
        un_cmask = np.zeros((B, mcfg.max_caption_len), np.int32)
        for j in range(B):
            r = batch["c_row_of"][j]
            sel = batch["c_segments"][r] == batch["c_slot_of"][j]
            L = int(sel.sum())
            un_cids[j, :L] = batch["c_ids"][r][sel]
            un_cmask[j, :L] = 1
        ref = plain.apply(variables, un_ids, un_mask, batch["image"],
                          un_cids, un_cmask, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
    assert seen == n


@pytest.mark.slow
def test_cli_train_2c_packed(tmp_path):
    """End-to-end 2C driver with --pack-rows: packed text+caption train
    steps + unpacked eval emit the standard fold TSVs."""
    import os

    from mpmc_tpu.cli.main import main

    DEV = "/root/reference/data/arabic_memes_propaganda_araieval_24_dev.json"
    TRAIN = ("/root/reference/data/"
             "arabic_memes_propaganda_araieval_24_train.json")
    assert main(["train", "--subtask", "2c", "--small", "--epochs", "1",
                 "--num-folds", "5", "--fold", "0", "--batch-size", "8",
                 "--pack-rows", "1",
                 "-tr", TRAIN, "-te", DEV, "-o", str(tmp_path)]) == 0
    tsvs = [f for f in os.listdir(tmp_path) if f.endswith(".tsv")]
    assert any("probs_fold_0" in f for f in tsvs)


def test_pack_rows_warns_for_unsupported_kind(tmp_path, caplog):
    """--pack-rows with a driver that can't pack (2B image) warns instead
    of silently ignoring the flag (ADVICE r3 #4)."""
    import dataclasses as _dc
    import logging

    from mpmc_tpu.cli.experiments import _run_folds
    from mpmc_tpu.config import (DataConfig, LossType, ModelConfig,
                                 TrainConfig)
    from mpmc_tpu.models import ImageClassifier

    mcfg = ModelConfig.tiny_2c()
    n = 16
    r = np.random.default_rng(0)
    data = {"image": r.random((n, mcfg.image.image_size,
                               mcfg.image.image_size, 3)).astype(np.float32),
            "label": r.integers(0, 2, n).astype(np.int32)}
    cfg = TrainConfig(model=mcfg,
                      data=DataConfig(batch_size=8, num_folds=2,
                                      pack_rows=4),
                      epochs=1, loss=LossType.CROSS_ENTROPY)
    with caplog.at_level(logging.WARNING):
        # folds=[5] (out of range) skips training — the warning fires in
        # the driver preamble, which is what's under test.
        _run_folds(cfg, lambda: ImageClassifier(mcfg), "image", data,
                   [f"d/x_{i}.jpg" for i in range(n)], None, None,
                   str(tmp_path), "task2B", folds=[5])
    assert any("pack-rows is not supported" in m for m in caplog.messages)


def test_packed_plan_threads_soft_targets(rng):
    """--pack-rows composes with --distill-lambda: PackedTrainPlan must
    carry the per-sample teacher probabilities through its shuffle + pack
    sample map, aligned with the labels, with 0.5 on pad slots (valid=0
    masks those from the loss).  Before round 5 packed training silently
    dropped the teacher signal."""
    from mpmc_tpu.train.packed import PackedMultimodalPlan, PackedTrainPlan

    n, seq = 37, 24
    lens = rng.integers(3, seq, n)
    ids = rng.integers(5, 100, (n, seq)).astype(np.int32)
    mask = (np.arange(seq)[None, :] < lens[:, None]).astype(np.int32)
    label = rng.integers(0, 2, n).astype(np.int32)
    soft = np.where(label == 1, 0.9, 0.1).astype(np.float32)
    soft += rng.random(n).astype(np.float32) * 1e-3  # unique per sample

    plan = PackedTrainPlan({"text_ids": ids, "text_mask": mask,
                            "label": label, "soft": soft},
                           pack_len=seq, rows_per_batch=4)
    seen = 0
    for batch, k in plan.epoch_iter(np.random.default_rng(0)):
        assert batch["soft"].shape == batch["label"].shape
        # teacher prob must stay aligned with its sample's label
        got = batch["soft"][:k]
        want = np.where(batch["label"][:k] == 1, 0.9, 0.1)
        np.testing.assert_allclose(got, want, atol=2e-3)
        np.testing.assert_array_equal(batch["soft"][k:], 0.5)
        seen += k
    assert seen == n

    # The multimodal plan copies every per-sample field generically.
    mm = PackedMultimodalPlan(
        {"text_ids": ids, "text_mask": mask, "label": label, "soft": soft,
         "image": rng.random((n, 8, 8, 3)).astype(np.float32)},
        batch_size=8)
    batch, k = next(iter(mm.epoch_iter(np.random.default_rng(0))))
    np.testing.assert_allclose(
        batch["soft"][:k],
        np.where(batch["label"][:k] == 1, 0.9, 0.1), atol=2e-3)


def _mm_data(rng, mcfg, n):
    ids, mask = _ragged_batch(rng, B=n, S=mcfg.max_text_len, min_len=3,
                              max_len=mcfg.max_text_len - 2)
    cap_ids, cap_mask = _ragged_batch(rng, B=n, S=mcfg.max_caption_len,
                                      vocab=mcfg.caption.vocab_size,
                                      min_len=2,
                                      max_len=mcfg.max_caption_len - 2)
    img = rng.integers(0, 255, (n, mcfg.image.image_size,
                                mcfg.image.image_size, 3)).astype(np.uint8)
    labels = rng.integers(0, 2, n).astype(np.int32)
    return {"text_ids": ids, "text_mask": mask, "caption_ids": cap_ids,
            "caption_mask": cap_mask, "image": img, "label": labels}


def test_packed_resident_plan_and_steps_match_hostfed(rng):
    """The device-resident packed 2C path (PackedMultimodalPlan with
    resident_images + make_packed_gather_train_step) trains EXACTLY like
    the host-fed packed path: identical batches (img_idx resolves to the
    same pixel rows via abs_idx) and identical params after each step —
    the fast recipe keeps DataConfig.device_resident without approximation."""
    from mpmc_tpu.config import DataConfig, TrainConfig
    from mpmc_tpu.train.packed import (PackedMultimodalPlan,
                                       make_packed_multimodal_apply_fn)
    from mpmc_tpu.train.step import (build_train_step_fn, create_train_state,
                                     make_optimizer,
                                     make_packed_gather_scan_train_step,
                                     make_packed_gather_train_step,
                                     make_scan_train_step)

    mcfg = ModelConfig.tiny_2c()
    B, n_full = 4, 19
    full = _mm_data(rng, mcfg, n_full)
    tr_idx = np.sort(rng.permutation(n_full)[:13])  # a fold's train split
    local = {k: v[tr_idx] for k, v in full.items()}

    host_plan = PackedMultimodalPlan(local, batch_size=B)
    res_plan = PackedMultimodalPlan(local, batch_size=B, abs_idx=tr_idx,
                                    resident_images=True)
    host_batches = [b for b, _ in host_plan.epoch_iter(
        np.random.default_rng(7))]
    res_batches = [b for b, _ in res_plan.epoch_iter(
        np.random.default_rng(7))]
    assert len(host_batches) == len(res_batches)
    for hb, rb in zip(host_batches, res_batches):
        assert "image" not in rb and "img_idx" in rb
        np.testing.assert_array_equal(full["image"][rb["img_idx"]],
                                      hb["image"])
        for k in hb:
            if k != "image":
                np.testing.assert_array_equal(rb[k], hb[k])

    cfg = TrainConfig(model=mcfg, data=DataConfig(batch_size=B), bf16=False,
                      learning_rate=1e-3)
    tx = make_optimizer(cfg, total_steps=10)
    packed_model = PackedMultimodalClassifier(mcfg)
    apply_fn = make_packed_multimodal_apply_fn(packed_model,
                                               augment_images=True)
    ex = host_batches[0]
    tp = {k[2:]: ex[k] for k in ("t_ids", "t_segments", "t_positions",
                                 "t_row_of", "t_slot_of", "t_start_of")}
    cp = {k[2:]: ex[k] for k in ("c_ids", "c_segments", "c_positions",
                                 "c_row_of", "c_slot_of", "c_start_of")}
    variables = packed_model.init(jax.random.key(0), tp,
                                  ex["image"].astype(np.float32) / 255.0, cp)
    state0, _ = create_train_state(variables, tx)
    dev_store = jax.device_put(full)

    # per-step parity
    step_fn = build_train_step_fn(apply_fn, cfg, tx)
    g_step = make_packed_gather_train_step(apply_fn, cfg, tx, donate=False)
    key = jax.random.key(3)
    s_ref, m_ref = step_fn(state0, host_batches[0], key)
    s_got, m_got = g_step(state0, dev_store, res_batches[0], key)
    np.testing.assert_allclose(float(m_got["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-6),
        s_got.params, s_ref.params)

    # scan-fused parity: stacked groups, same dropout-key split
    K = 2
    cfg_k = TrainConfig(model=mcfg, data=DataConfig(batch_size=B),
                        bf16=False, learning_rate=1e-3, scan_steps=K)
    host_stack = {k: np.stack([b[k] for b in host_batches[:K]])
                  for k in host_batches[0]}
    res_stack = {k: np.stack([b[k] for b in res_batches[:K]])
                 for k in res_batches[0]}
    scan_ref = make_scan_train_step(apply_fn, cfg_k, tx, donate=False)
    scan_got = make_packed_gather_scan_train_step(apply_fn, cfg_k, tx,
                                                  donate=False)
    s_ref, m_ref = scan_ref(state0, host_stack, key)
    s_got, m_got = scan_got(state0, dev_store, res_stack, key)
    np.testing.assert_allclose(np.asarray(m_got["loss"]),
                               np.asarray(m_ref["loss"]), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-6),
        s_got.params, s_ref.params)


def test_cli_2c_packed_resident_driver(tmp_path, rng):
    """End-to-end 2C packed training through _run_folds with the DEFAULT
    device_resident=True: the plan emits img_idx, fit dispatches the
    packed-gather steps, eval rides the resident gather path, and the
    standard fold TSVs come out."""
    import os

    from mpmc_tpu.cli.experiments import _run_folds
    from mpmc_tpu.config import DataConfig, ModelConfig, TrainConfig
    from mpmc_tpu.models import MultimodalClassifier as MM

    mcfg = ModelConfig.tiny_2c()
    n = 20
    data = _mm_data(rng, mcfg, n)
    cfg = TrainConfig(model=mcfg,
                      data=DataConfig(batch_size=4, num_folds=2,
                                      pack_rows=2),
                      epochs=1, scan_steps=2, eval_per_epoch=1)
    assert cfg.data.device_resident  # the production default under test
    res = _run_folds(cfg, lambda: MM(mcfg), "multimodal", data,
                     [f"d/x_{i}.jpg" for i in range(n)], None, None,
                     str(tmp_path), "task2C", folds=[0], augment=True)
    assert np.isfinite(res.fold_results[0].best_macro_f1)
    tsvs = [f for f in os.listdir(tmp_path) if "probs_fold_0" in f]
    assert tsvs


@pytest.mark.slow
def test_packed_resident_dp_shard_invariant(tmp_path, rng):
    """Packed device-resident 2C training composes with data parallelism at
    any shard count: the plan's row budgets align to the data-axis extent
    (PackedMultimodalPlan.row_multiple), and 1/2/4-way DP runs of the same
    fold produce the same best F1."""
    from mpmc_tpu.cli.experiments import _run_folds
    from mpmc_tpu.config import DataConfig, MeshConfig, TrainConfig
    from mpmc_tpu.models import MultimodalClassifier as MM

    mcfg = ModelConfig.tiny_2c()
    n = 24
    data = _mm_data(rng, mcfg, n)
    f1s = []
    for shards in (1, 2, 4):
        cfg = TrainConfig(
            model=mcfg,
            data=DataConfig(batch_size=8, num_folds=2, pack_rows=2),
            mesh=MeshConfig(num_data_shards=shards),
            epochs=1, scan_steps=2, eval_per_epoch=1)
        res = _run_folds(cfg, lambda: MM(mcfg), "multimodal", data,
                         [f"d/x_{i}.jpg" for i in range(n)], None, None,
                         str(tmp_path / f"dp{shards}"), "task2C",
                         folds=[0], augment=True)
        f1s.append(res.fold_results[0].best_macro_f1)
    assert f1s[1] == pytest.approx(f1s[0], rel=1e-4)
    assert f1s[2] == pytest.approx(f1s[0], rel=1e-4)
