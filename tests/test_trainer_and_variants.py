"""Trainer wrapper, optional-modality classifier variants, augmentation path,
captioner generate, analysis utilities."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpmc_tpu.config import (DataConfig, ImageEncoderConfig, ModelConfig,
                             TextEncoderConfig, TrainConfig)
from mpmc_tpu.models import MultimodalClassifier


def _tiny_no_text():
    return ModelConfig(
        text=None,
        caption=TextEncoderConfig.tiny(),
        image=ImageEncoderConfig.tiny(),
        proj_dim=64, max_caption_len=16)


def test_multimodal_without_text_branch(rng):
    """C23 fixed: image+caption fusion with no Arabic-text branch."""
    cfg = _tiny_no_text()
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    cap = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)
    capm = jnp.ones_like(cap)
    model = MultimodalClassifier(cfg)
    variables = model.init(jax.random.key(0), None, None, img, cap, capm)
    out = model.apply(variables, None, None, img, cap, capm)
    assert out.shape == (2,)
    assert "text_model" not in variables["params"]


def test_clip_style_config(rng):
    cfg = ModelConfig.clip_style_2c()
    assert cfg.caption is None
    assert cfg.image.arch == "vit_base_32"


def test_trainer_wrapper(rng, tmp_path):
    from mpmc_tpu.cli.experiments import make_apply_fn
    from mpmc_tpu.models import TextClassifier
    from mpmc_tpu.config import PoolingType

    mcfg = dataclasses.replace(ModelConfig.tiny_2c(), num_classes=2,
                               pooling=PoolingType.ATTENTION)
    cfg = TrainConfig(model=mcfg, data=DataConfig(batch_size=8), epochs=2,
                      learning_rate=1e-3,
                      checkpoint_dir=str(tmp_path / "ckpt"))
    from mpmc_tpu.config import LossType
    cfg = dataclasses.replace(cfg, loss=LossType.CROSS_ENTROPY)

    n = 48
    y = (rng.random(n) > 0.5).astype(np.int32)
    ids = rng.integers(5, mcfg.text.vocab_size, (n, 16)).astype(np.int32)
    ids[:, 0] = y * 3 + 1  # learnable from first token
    data = {"text_ids": ids, "text_mask": np.ones_like(ids), "label": y}

    from mpmc_tpu.train.trainer import Trainer
    model = TextClassifier(mcfg)
    variables = model.init(jax.random.key(0), data["text_ids"][:2],
                           data["text_mask"][:2])
    trainer = Trainer(model, make_apply_fn(model, "text"), cfg,
                      data, eval_data=data, init_variables=variables)
    result = trainer.train()
    ev = trainer.evaluate()
    assert ev.macro_f1 > 0.8  # trivially learnable
    probs = trainer.predict({k: v for k, v in data.items() if k != "label"})
    assert probs.shape == (n,)
    trainer.save_model(step=1, metrics={"test_f1": ev.macro_f1})

    # resume path restores state
    cfg2 = dataclasses.replace(cfg, resume=True)
    trainer2 = Trainer(model, make_apply_fn(model, "text"), cfg2, data,
                       eval_data=data, init_variables=variables)
    ev2 = trainer2.evaluate()
    assert ev2.macro_f1 == pytest.approx(ev.macro_f1, abs=1e-6)


def test_augmented_apply_fn(rng):
    """uint8 images flow through train_augment (train) / eval_preprocess
    (eval) inside the apply wrapper."""
    from mpmc_tpu.cli.experiments import make_apply_fn
    from mpmc_tpu.models.classifier import ImageClassifier

    mcfg = ModelConfig(image=ImageEncoderConfig.tiny(), num_classes=2)
    model = ImageClassifier(mcfg)
    img_u8 = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    variables = model.init(jax.random.key(0),
                           jnp.asarray(img_u8, jnp.float32) / 255.0)
    apply_fn = make_apply_fn(model, "image", augment_images=True)
    out_train, _ = apply_fn(variables, {"image": jnp.asarray(img_u8)},
                            train=True,
                            rngs={"dropout": jax.random.key(1),
                                  "augment": jax.random.key(2)},
                            mutable=["batch_stats"])
    out_eval, _ = apply_fn(variables, {"image": jnp.asarray(img_u8)},
                           train=False, rngs=None, mutable=[])
    assert out_train.shape == out_eval.shape == (2, 2)
    # train path is stochastic vs eval path deterministic
    out_eval2, _ = apply_fn(variables, {"image": jnp.asarray(img_u8)},
                            train=False, rngs=None, mutable=[])
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_eval2))


def test_train_augment_shapes(rng):
    from mpmc_tpu.image.augment import eval_preprocess, train_augment
    u8 = jnp.asarray(rng.integers(0, 256, (4, 32, 32, 3)), jnp.uint8)
    out = train_augment(jax.random.key(0), u8)
    assert out.shape == (4, 32, 32, 3) and out.dtype == jnp.float32
    ev = eval_preprocess(u8)
    # normalize inverts to the original u8/255 values
    from mpmc_tpu.image.augment import IMAGENET_MEAN, IMAGENET_STD
    rec = (np.asarray(ev) * np.asarray(IMAGENET_STD)
           + np.asarray(IMAGENET_MEAN)) * 255
    np.testing.assert_allclose(rec, np.asarray(u8, np.float32), atol=1e-3)
    # center crop variant
    cropped = eval_preprocess(u8, crop=16)
    assert cropped.shape == (4, 16, 16, 3)


@pytest.mark.slow  # heavy parity: covered by the per-round --runslow suite
def test_rotate_shear_matches_bilinear_gather(rng):
    """The gather-free Paeth 3-shear rotation (TPU-friendly: weighted rolls)
    agrees with the direct bilinear-gather oracle in the image interior
    (borders differ by design: 3 zero-fill resamples vs one)."""
    from mpmc_tpu.image.augment import _rotate_bilinear, _rotate_shear
    H = W = 64
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([np.sin(yy / 9) + np.cos(xx / 7), (yy + xx) / (H + W),
                    np.cos(yy / 5) * np.sin(xx / 6)], -1).astype(np.float32)
    batch = np.stack([img] * 4)
    angles = np.array([0.0, 0.1, -0.2, 0.26], np.float32)
    ref = jax.vmap(_rotate_bilinear)(jnp.asarray(batch), jnp.asarray(angles))
    got = _rotate_shear(jnp.asarray(batch), jnp.asarray(angles), 15.0)
    m = 12
    d = np.abs(np.asarray(ref)[:, m:-m, m:-m]
               - np.asarray(got)[:, m:-m, m:-m])
    assert d.mean() < 5e-3 and d.max() < 5e-2  # bf16 shear resampling


@pytest.mark.slow
def test_captioner_generate(rng):
    from mpmc_tpu.models.captioner import ImageCaptioner
    cap = ImageCaptioner(vocab_size=64, image_size=32, patch_size=8,
                         enc_hidden=32, enc_layers=1, enc_heads=2,
                         dec_hidden=32, dec_layers=1, max_len=8)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    prompt = jnp.asarray([[5, 6]] * 2, jnp.int32)
    variables = cap.init(jax.random.key(0), img, prompt)
    tokens = cap.apply(variables, img, prompt, eos_id=3,
                       method=ImageCaptioner.generate)
    assert tokens.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(tokens[:, :2]),
                                  np.asarray(prompt))


def test_precompute_captions_cache(tmp_path):
    from mpmc_tpu.models.captioner import precompute_captions
    paths = ["a.jpg", "b.jpg"]
    imgs = np.zeros((2, 8, 8, 3), np.uint8)
    c1 = precompute_captions(paths, imgs, cache_dir=str(tmp_path))
    c2 = precompute_captions(paths, imgs, cache_dir=str(tmp_path))
    assert c1 == c2 and len(c1) == 2
    assert all(c.startswith("a meme of") for c in c1)


def test_analysis_utilities(tmp_path):
    import mpmc_tpu.analysis as ana
    from mpmc_tpu.io import read_manifest
    from mpmc_tpu.io.tsv import write_label_tsv

    gold = "/root/reference/data/arabic_memes_propaganda_araieval_24_dev.json"
    m = read_manifest(gold)
    pred = np.zeros(len(m), int)
    path = str(tmp_path / "p.tsv")
    write_label_tsv(path, m.ids, pred, "r")
    rows = ana.merge_predictions(path, gold)
    assert len(rows) == 312
    mis = ana.misclassified(path, gold)
    assert len(mis) == int(np.sum(m.labels))  # all propaganda rows missed
    freqs = ana.word_frequencies(mis, top_k=10)
    assert len(freqs) == 10 and all(isinstance(c, int) for _, c in freqs)
    rep = ana.per_class_report(path, gold)
    assert rep["confusion"]["tp"] == 0
    assert rep["macro_f1"] == pytest.approx(0.41791, abs=1e-4)


@pytest.mark.slow
def test_simple_2c_organizer_baseline(rng):
    """C28 (Multimodal_example_task2C.txt:152-197): last-token pooling (the
    reference's `[:, -1, :]` bug — NOT the CLS token), resnet50-logits
    branch, plain linear fusion, 2-class output."""
    from mpmc_tpu.models import SimpleMultimodalClassifier
    from mpmc_tpu.config import ModelConfig

    full = ModelConfig.simple_2c()
    assert full.caption is None and full.num_classes == 2
    assert full.image.arch == "resnet50"

    mcfg = dataclasses.replace(
        ModelConfig.tiny_2c(), caption=None, num_classes=2)
    model = SimpleMultimodalClassifier(mcfg, image_logits_dim=10)
    ids = jnp.asarray(rng.integers(5, mcfg.text.vocab_size, (2, 8)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), ids, mask, img)
    out = model.apply(variables, ids, mask, img)
    assert out.shape == (2, 2)
    # image branch consumes raw backbone *logits* (classifier head present)
    assert "classifier" in variables["params"]["backbone"]
    assert (variables["params"]["backbone"]["classifier"]["bias"].shape
            == (10,))

    # the last-token bug: changing the final token changes the text branch;
    # with last_token_pooling=False (fixed variant) it does not
    ids2 = ids.at[:, -1].set((ids[:, -1] + 1) % mcfg.text.vocab_size)
    out2 = model.apply(variables, ids2, mask, img)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    fixed = SimpleMultimodalClassifier(mcfg, last_token_pooling=False,
                                       image_logits_dim=10)
    vfix = fixed.init(jax.random.key(0), ids, mask, img)
    a = fixed.apply(vfix, ids, mask, img)
    b = fixed.apply(vfix, ids2, mask, img)
    # CLS pooling: only position 0 feeds the text branch — but attention
    # mixes tokens, so outputs may still differ; check the *pooling* input
    # instead by masking: with a single-token sequence both agree
    one = jnp.ones((2, 1), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(fixed.apply(vfix, one, jnp.ones_like(one), img)),
        np.asarray(SimpleMultimodalClassifier(
            mcfg, last_token_pooling=True, image_logits_dim=10
        ).apply(vfix, one, jnp.ones_like(one), img)), rtol=1e-6)
