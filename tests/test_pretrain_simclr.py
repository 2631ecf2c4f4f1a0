"""SimCLR image-SSL stage (train/pretrain_image.py): NT-Xent properties,
learning on structured synthetic pixels, npz round-trip, and the
PretrainedSpec.image splice into 2B/2C classifiers."""

import dataclasses

import numpy as np
import pytest

from mpmc_tpu.config import ImageEncoderConfig, ModelConfig, Subtask
from mpmc_tpu.train.pretrain_image import (SimCLRConfig, nt_xent_loss,
                                           save_image_encoder_params,
                                           simclr_pretrain)


def _synthetic_images(rng, n=48, size=32):
    """Structured uint8 images: each sample is a distinct smooth gradient
    + color cast, so views of the same image are mutually closer than
    views of different images (something for contrastive learning to do)."""
    ys, xs = np.mgrid[0:size, 0:size] / size
    imgs = np.zeros((n, size, size, 3), np.uint8)
    for i in range(n):
        a, b = rng.random(2)
        base = (a * ys + (1 - a) * xs)[..., None]
        cast = rng.random(3)
        img = 255 * (0.3 + 0.6 * base * cast + 0.1 * b)
        imgs[i] = np.clip(img, 0, 255).astype(np.uint8)
    return imgs


def test_nt_xent_alignment():
    """Aligned (identical) view pairs with distinct negatives score a much
    lower loss than shuffled pairs."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    z = rng.standard_normal((16, 8)).astype(np.float32) * 3
    aligned = float(nt_xent_loss(jnp.asarray(z), jnp.asarray(z), 0.5))
    shuffled = float(nt_xent_loss(jnp.asarray(z),
                                  jnp.asarray(np.roll(z, 1, axis=0)), 0.5))
    assert aligned < shuffled - 1.0


def test_nt_xent_permutation_invariant_targets():
    """The positive for row i in view-1 is row i in view-2 (index i+B in
    the stacked batch), and a perfect-alignment batch beats temperature-1
    chance level log(2B-1)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    b = 8
    z = rng.standard_normal((b, 4)).astype(np.float32) * 5
    loss = float(nt_xent_loss(jnp.asarray(z), jnp.asarray(z), 1.0))
    assert loss < np.log(2 * b - 1)


@pytest.mark.slow
def test_simclr_learns_and_splices(tmp_path):
    rng = np.random.default_rng(0)
    imgs = _synthetic_images(rng)
    icfg = ImageEncoderConfig.tiny()
    icfg = dataclasses.replace(icfg, image_size=32)
    params, bstats, losses = simclr_pretrain(
        icfg, imgs, SimCLRConfig(epochs=8, batch_size=16,
                                 learning_rate=3e-3, scan_steps=2,
                                 max_rotate_deg=5.0, seed=0))
    assert losses[-1] < losses[0] * 0.9        # actually learns
    assert params, "empty backbone params"

    # npz round-trip is exact
    from mpmc_tpu.train.pretrain import flatten_params
    path = str(tmp_path / "simclr.npz")
    save_image_encoder_params(params, bstats, path)
    from mpmc_tpu.models.pretrained import _convert_image
    conv = _convert_image(path, icfg.arch)
    flat_a = flatten_params(params)
    flat_b = flatten_params(conv["params"])
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])

    # splices into the 2B classifier via the standard pretrained path
    import jax
    from mpmc_tpu.models import ImageClassifier
    from mpmc_tpu.models.pretrained import PretrainedSpec, apply_pretrained
    mcfg = dataclasses.replace(ModelConfig.tiny_2c(), subtask=Subtask.B,
                               num_classes=2, image=icfg)
    model = ImageClassifier(mcfg)
    variables = model.init(jax.random.key(0),
                           imgs[:2].astype(np.float32) / 255.0)
    spliced = apply_pretrained(variables, mcfg, "image",
                               PretrainedSpec(image=path))
    got = flatten_params(spliced["params"]["backbone"])
    for k in flat_a:
        np.testing.assert_array_equal(got[k], flat_a[k])
    # batch_stats came along too
    if bstats:
        got_bs = flatten_params(spliced["batch_stats"]["backbone"])
        for k, v in flatten_params(bstats).items():
            np.testing.assert_array_equal(got_bs[k], v)

    # and into the 2C multimodal image branch
    from mpmc_tpu.models import MultimodalClassifier
    mm_cfg = dataclasses.replace(ModelConfig.tiny_2c(), image=icfg)
    mm = MultimodalClassifier(mm_cfg)
    ex_ids = np.zeros((2, mm_cfg.max_text_len), np.int32)
    ex_mask = np.ones((2, mm_cfg.max_text_len), np.int32)
    cap_ids = np.zeros((2, mm_cfg.max_caption_len), np.int32)
    cap_mask = np.ones((2, mm_cfg.max_caption_len), np.int32)
    mm_vars = mm.init(jax.random.key(0), ex_ids, ex_mask,
                      imgs[:2].astype(np.float32) / 255.0, cap_ids, cap_mask)
    mm_spliced = apply_pretrained(mm_vars, mm_cfg, "multimodal",
                                  PretrainedSpec(image=path))
    got_mm = flatten_params(mm_spliced["params"]["image_model"]["backbone"])
    for k in flat_a:
        np.testing.assert_array_equal(got_mm[k], flat_a[k])


def test_simclr_driver_wiring(tmp_path):
    """run_subtask_2b with cfg.simclr_epochs runs the SSL stage and leaves
    the backbone npz next to the outputs (placeholder pixels — the wiring
    is what's under test)."""
    import json

    from mpmc_tpu.cli.experiments import run_subtask_2b
    from mpmc_tpu.config import DataConfig, TrainConfig

    def make_manifest(path, n, start=0):
        rows = [{"id": f"d/img_{start+i}.png",
                 "img_path": f"d/img_{start+i}.png",
                 "text": f"نص {i}",
                 "class_label": "propaganda" if (start + i) % 3 == 0
                 else "not_propaganda"} for i in range(n)]
        with open(path, "w") as f:
            json.dump(rows, f)

    train_m, dev_m = tmp_path / "tr.json", tmp_path / "de.json"
    make_manifest(train_m, 24)
    make_manifest(dev_m, 12, start=100)
    mcfg = dataclasses.replace(
        ModelConfig.tiny_2c(), subtask=Subtask.B, num_classes=2,
        image=dataclasses.replace(ImageEncoderConfig.tiny(), image_size=32))
    cfg = TrainConfig(
        model=mcfg,
        data=DataConfig(train_manifest=str(train_m), dev_manifest=str(dev_m),
                        batch_size=8, num_folds=2),
        epochs=1, learning_rate=1e-3, simclr_epochs=2)
    out = str(tmp_path / "out")
    res = run_subtask_2b(cfg, out_dir=out, folds=[0])
    assert (tmp_path / "out" / "simclr_backbone.npz").exists()
    assert len(res.fold_results) == 1
