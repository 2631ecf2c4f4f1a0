"""Corpus MLM pretraining (train/pretrain.py): the no-external-weights
quality lever (VERDICT r2 #2).  Pins: loss decreases, the saved encoder
npz splices through the standard PretrainedSpec.text path, and char-noise
augmentation preserves/extends the corpus."""

import json

import numpy as np
import pytest

from mpmc_tpu.config import TextEncoderConfig
from mpmc_tpu.train.pretrain import (MLMConfig, char_noise, flatten_params,
                                     mlm_pretrain, pretrain_and_save,
                                     save_encoder_params, unflatten_params)


def _tiny_cfg(vocab_size):
    return TextEncoderConfig(vocab_size=vocab_size, hidden_size=32,
                             num_layers=2, num_heads=2,
                             intermediate_size=64,
                             max_position_embeddings=32)


@pytest.fixture()
def corpus_tok():
    from mpmc_tpu.cli.experiments import corpus_wordpiece_vocab
    from mpmc_tpu.text.wordpiece import WordPieceTokenizer
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(words, size=rng.integers(4, 10)))
             for _ in range(64)]
    tok = WordPieceTokenizer(corpus_wordpiece_vocab(texts))
    return texts, tok


def test_char_noise_extends_corpus():
    rng = np.random.default_rng(0)
    texts = ["كلمة نص دعاية", "hello world"]
    out = char_noise(texts, rng, copies=3, word_prob=1.0)
    assert len(out) == len(texts) * 4
    assert out[: len(texts)] == texts          # originals first, unchanged
    # noisy copies keep the word count (ops are intra-word)
    for t in out[len(texts):]:
        assert len(t.split()) in (2, 3)


@pytest.mark.slow
def test_mlm_loss_decreases_and_splices(corpus_tok, tmp_path):
    texts, tok = corpus_tok
    vocab_size = max(tok.vocab.values()) + 1
    cfg = _tiny_cfg(vocab_size)
    ids, mask = tok.encode_batch(texts, 24)
    enc, losses = mlm_pretrain(
        cfg, ids, mask, tok,
        MLMConfig(epochs=30, batch_size=16, learning_rate=2e-3,
                  scan_steps=2, char_noise_copies=0))
    # actually learns (ratio ~0.74 on TPU; margin for CPU-backend numerics,
    # where the 12-epoch/1e-3 recipe landed at 0.925 and flaked)
    assert losses[-1] < losses[0] * 0.85
    assert "word_embeddings" in enc and "layer_0" in enc

    # npz round-trip is exact
    p = str(tmp_path / "enc.npz")
    save_encoder_params(enc, p)
    flat = dict(np.load(p))
    rt = unflatten_params(flat)
    for k, v in flatten_params(enc).items():
        np.testing.assert_array_equal(flatten_params(rt)[k], v)

    # splices through the standard text path into TextClassifier variables
    import dataclasses

    import jax

    from mpmc_tpu.config import ModelConfig, Subtask
    from mpmc_tpu.models import TextClassifier
    from mpmc_tpu.models.pretrained import PretrainedSpec, apply_pretrained

    mcfg = ModelConfig(subtask=Subtask.A, text=cfg, caption=None, image=None,
                       num_classes=2, max_text_len=24)
    model = TextClassifier(mcfg)
    variables = model.init(jax.random.key(0), ids[:2], mask[:2])
    before = np.asarray(
        variables["params"]["encoder"]["word_embeddings"]["embedding"])
    spliced = apply_pretrained(variables, mcfg, "text",
                               PretrainedSpec(text=p))
    after = np.asarray(
        spliced["params"]["encoder"]["word_embeddings"]["embedding"])
    assert not np.array_equal(before, after)
    np.testing.assert_array_equal(
        after, flatten_params(enc)["word_embeddings/embedding"])
    # and the spliced model still runs
    out = model.apply(spliced, ids[:4], mask[:4])
    assert np.asarray(out).shape == (4, 2)


@pytest.mark.slow
def test_mlm_packed_learns_and_shrinks_rows(corpus_tok):
    """MLMConfig.pack: sequence-packed corpus (ops/packing.py) — same
    objective (co-packed texts never attend each other), ~3-4x fewer rows,
    still learns, and the encoder subtree is intact."""
    texts, tok = corpus_tok
    vocab_size = max(tok.vocab.values()) + 1
    cfg = _tiny_cfg(vocab_size)
    ids, mask = tok.encode_batch(texts, 24)
    enc, losses = mlm_pretrain(
        cfg, ids, mask, tok,
        MLMConfig(epochs=40, batch_size=8, learning_rate=2e-3,
                  scan_steps=2, char_noise_copies=0, pack=True))
    assert losses[-1] < losses[0] * 0.85
    assert "word_embeddings" in enc and "layer_0" in enc


@pytest.mark.slow
def test_pretrain_and_save_end_to_end(corpus_tok, tmp_path):
    texts, tok = corpus_tok
    cfg = _tiny_cfg(max(tok.vocab.values()) + 1)
    p = pretrain_and_save(cfg, texts, tok, str(tmp_path / "e.npz"),
                          MLMConfig(epochs=2, batch_size=16,
                                    scan_steps=2, char_noise_copies=1),
                          max_len=24)
    z = dict(np.load(p))
    assert "__flax_encoder__" in z


# ---------------------------------------------------------------------------
# Caption decode (VERDICT r2 #9) — colocated here to avoid re-importing the
# heavy captioner test module.
# ---------------------------------------------------------------------------

def test_make_decode_fn_roundtrip():
    """decode(tokenize(text)) == text for in-vocab words, including ``##``
    continuation merging and special-token skipping."""
    from mpmc_tpu.cli.experiments import corpus_wordpiece_vocab
    from mpmc_tpu.models.captioner import make_decode_fn
    from mpmc_tpu.text.wordpiece import WordPieceTokenizer

    texts = ["a meme of a cat", "propaganda poster art", "كلمة نص"]
    vocab = corpus_wordpiece_vocab(texts)
    tok = WordPieceTokenizer(vocab)
    decode = make_decode_fn(vocab)
    for t in texts:
        ids, _ = tok.encode(t, 16)   # [CLS] ... [SEP] [PAD]*
        assert decode(ids) == t
    # out-of-vocab words fall through wordpiece to char pieces and merge back
    ids, _ = tok.encode("cat art", 16)
    assert decode(ids) == "cat art"


@pytest.mark.slow
def test_scratch_captioner_generates_words(tmp_path):
    """The from-scratch ImageCaptioner path produces real-word captions
    (decoded through the caption vocab), cached to disk as text."""
    import json

    from mpmc_tpu.models.captioner import (make_scratch_caption_fn,
                                           precompute_captions)

    texts = ["a meme of something", "funny cat poster", "news clip art"]
    gen_fn, tok = make_scratch_caption_fn(texts, image_size=32, max_len=8)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (3, 32, 32, 3)).astype(np.uint8)
    paths = [f"d/im_{i}.png" for i in range(3)]
    caps = precompute_captions(paths, imgs, cache_dir=str(tmp_path),
                               generate_fn=gen_fn)
    assert len(caps) == 3
    vocab_words = set(tok.vocab)
    for c in caps:
        # decoded words, not integer-id strings
        assert not any(w.isdigit() for w in c.split())
    # cache file holds the decoded text
    import glob
    cache = glob.glob(str(tmp_path / "captions_*.json"))[0]
    cached = json.load(open(cache))
    assert cached[paths[0]] == caps[0]
    # deterministic: regenerating from cache returns identical captions
    again = precompute_captions(paths, imgs, cache_dir=str(tmp_path),
                                generate_fn=gen_fn)
    assert again == caps


def test_caption_cache_keys_on_generator(tmp_path):
    """A placeholder run and a generate_fn run over the SAME image paths
    must not share caption-cache entries (generator identity is part of
    the cache key)."""
    from mpmc_tpu.models.captioner import precompute_captions

    imgs = np.zeros((2, 8, 8, 3), np.uint8)
    paths = ["d/a.png", "d/b.png"]
    placeholder = precompute_captions(paths, imgs, cache_dir=str(tmp_path))

    def gen(images_u8):
        return ["real words here"] * len(images_u8)

    gen.cache_tag = "test-gen"
    real = precompute_captions(paths, imgs, cache_dir=str(tmp_path),
                               generate_fn=gen)
    assert real == ["real words here"] * 2
    assert placeholder != real
    # and each path reloads from its own entry
    again = precompute_captions(paths, imgs, cache_dir=str(tmp_path))
    assert again == placeholder


def _mlm_npz_fixture(corpus_tok, tmp_path):
    """Random-init tiny encoder saved as an MLM npz + matching vocab +
    4-row manifest — enough to pin the extract-features npz plumbing."""
    import jax

    from mpmc_tpu.models.bert import TextEncoder

    texts, tok = corpus_tok
    cfg = _tiny_cfg(max(tok.vocab.values()) + 1)
    enc_path = str(tmp_path / "mlm.npz")
    enc = TextEncoder(cfg)
    ids, mask = tok.encode_batch(texts[:2], 16)
    variables = enc.init(jax.random.key(0), ids, mask)
    save_encoder_params(variables["params"], enc_path)
    vocab_path = str(tmp_path / "vocab.txt")
    tok.save(vocab_path)

    rows = [{"id": f"m_{i}.png", "img_path": f"m_{i}.png",
             "text": texts[i], "class_label": "propaganda"}
            for i in range(4)]
    with open(tmp_path / "m.json", "w") as f:
        json.dump(rows, f)
    return cfg, enc_path, vocab_path


def test_extract_features_mlm_npz_validation(corpus_tok, tmp_path):
    """Config inference from a corpus-MLM npz tree + the fail-fast
    validation paths (vocab required, vocab/encoder size match) — these
    raise before any image work (extract_feat.py:90-92 is the reference's
    downloaded-AraBERTv2 equivalent)."""
    from mpmc_tpu.baselines.extract_features import extract_features
    from mpmc_tpu.models.pretrained import infer_text_config_from_tree

    cfg, enc_path, vocab_path = _mlm_npz_fixture(corpus_tok, tmp_path)

    # shape-inference round-trip
    tree = unflatten_params(
        {k: v for k, v in np.load(enc_path).items()})
    inferred = infer_text_config_from_tree(tree)
    assert (inferred.vocab_size, inferred.hidden_size,
            inferred.num_layers, inferred.num_heads,
            inferred.intermediate_size) == (
        cfg.vocab_size, cfg.hidden_size, cfg.num_layers, cfg.num_heads,
        cfg.intermediate_size)

    # vocab file is mandatory with an npz encoder
    with pytest.raises(ValueError, match="vocab"):
        extract_features(str(tmp_path), "m.json", "f.json",
                         text_params_path=enc_path,
                         features_dir=str(tmp_path / "feats"))

    # wrong vocab (different size) fails loudly
    bad_vocab = str(tmp_path / "bad_vocab.txt")
    with open(vocab_path) as f, open(bad_vocab, "w") as g:
        g.write("".join(f.readlines()[:-2]))
    with pytest.raises(ValueError, match="vocab"):
        extract_features(str(tmp_path), "m.json", "f.json",
                         text_vocab_path=bad_vocab,
                         text_params_path=enc_path,
                         features_dir=str(tmp_path / "feats"))


@pytest.mark.slow
def test_extract_features_accepts_mlm_npz(corpus_tok, tmp_path):
    """Full C4 extraction with a corpus-MLM npz encoder: features come out
    at the npz tree's hidden size (inferred arch, not arabertv2's 768)."""
    from mpmc_tpu.baselines.extract_features import extract_features

    cfg, enc_path, vocab_path = _mlm_npz_fixture(corpus_tok, tmp_path)
    out = extract_features(str(tmp_path), "m.json", "f.json",
                           text_vocab_path=vocab_path,
                           text_params_path=enc_path,
                           features_dir=str(tmp_path / "feats"))
    feats = json.load(open(out))
    v = next(iter(feats["textfeats"].values()))
    assert len(v) == cfg.hidden_size
