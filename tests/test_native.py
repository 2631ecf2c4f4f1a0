"""C++ host runtime: parity with the pure-Python oracles.

Skipped wholesale if the native library can't build (toolchain missing).
"""

import numpy as np
import pytest

from mpmc_tpu import native_lib

pytestmark = pytest.mark.skipif(native_lib.load() is None,
                                reason="native toolchain unavailable")

DEV = "/root/reference/data/arabic_memes_propaganda_araieval_24_dev.json"


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    from mpmc_tpu.io import read_manifest
    from mpmc_tpu.cli.experiments import corpus_wordpiece_vocab
    from mpmc_tpu.text.normalize import preprocess_arabic_tweet
    m = read_manifest(DEV)
    texts = [preprocess_arabic_tweet(t) for t in m.texts]
    vocab = corpus_wordpiece_vocab(texts, max_words=2000)
    p = tmp_path_factory.mktemp("nat") / "vocab.txt"
    ordered = sorted(vocab, key=vocab.get)
    p.write_text("\n".join(ordered) + "\n", encoding="utf-8")
    return str(p), texts


def test_native_tokenizer_matches_python(vocab_file):
    from mpmc_tpu.text.native import NativeWordPieceTokenizer
    from mpmc_tpu.text.wordpiece import WordPieceTokenizer
    path, texts = vocab_file
    nat = NativeWordPieceTokenizer(path)
    py = WordPieceTokenizer.from_file(path)
    n_ids, n_mask = nat.encode_batch(texts, 64)
    p_ids, p_mask = py.encode_batch(texts, 64)
    mismatch = (n_ids != p_ids).any(axis=1)
    assert mismatch.sum() == 0, \
        f"{mismatch.sum()}/{len(texts)} rows differ, e.g. {texts[int(np.argmax(mismatch))][:60]!r}"
    np.testing.assert_array_equal(n_mask, p_mask)


def test_native_tokenizer_edge_cases(vocab_file):
    from mpmc_tpu.text.native import NativeWordPieceTokenizer
    from mpmc_tpu.text.wordpiece import WordPieceTokenizer
    path, _ = vocab_file
    nat = NativeWordPieceTokenizer(path)
    py = WordPieceTokenizer.from_file(path)
    cases = ["", "   ", "a" * 200, "x!y?z", "مرحبا، بكم.",
             "tab\there\nnewline", "emoji 😀 inside", "١٢٣ أرقام"]
    for s in cases:
        n_ids, n_mask = nat.encode(s, 32)
        p_ids, p_mask = py.encode(s, 32)
        assert n_ids.tolist() == p_ids.tolist(), repr(s)


def test_native_tokenizer_threads(vocab_file):
    from mpmc_tpu.text.native import NativeWordPieceTokenizer
    path, texts = vocab_file
    nat1 = NativeWordPieceTokenizer(path, num_threads=1)
    nat8 = NativeWordPieceTokenizer(path, num_threads=8)
    a, _ = nat1.encode_batch(texts, 48)
    b, _ = nat8.encode_batch(texts, 48)
    np.testing.assert_array_equal(a, b)


def test_native_image_decode_parity(tmp_path):
    from PIL import Image
    from mpmc_tpu.image import native as inat
    from mpmc_tpu.image.decode import _resize_bilinear_u8
    rng = np.random.default_rng(1)
    img = (rng.random((150, 200, 3)) * 255).astype(np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(img).save(p)
    nat = inat.decode_resize(str(p), 96)
    ref = _resize_bilinear_u8(img, 96)
    assert np.abs(nat.astype(int) - ref.astype(int)).max() <= 1


def test_native_image_decode_jpeg_and_gray(tmp_path):
    from PIL import Image
    from mpmc_tpu.image import native as inat
    rng = np.random.default_rng(2)
    img = (rng.random((600, 800, 3)) * 255).astype(np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(img).save(p, quality=90)
    out = inat.decode_resize(str(p), 224)
    assert out is not None and out.shape == (224, 224, 3)
    g = inat.decode_resize(str(p), 224, grayscale=True)
    assert g is not None and g.shape == (224, 224, 1)
    assert inat.decode_resize(str(tmp_path / "missing.jpg"), 224) is None


def test_native_image_rejects_garbage(tmp_path):
    from mpmc_tpu.image import native as inat
    p = tmp_path / "garbage.jpg"
    p.write_bytes(b"\xff\xd8not really a jpeg at all")
    assert inat.decode_resize(str(p), 64) is None


def test_native_tokenizer_lowercase_parity(tmp_path):
    """do_lower_case=True with non-ASCII + accented text: the native wrapper
    applies full-Unicode lower + NFD accent strip (ADVICE r1: the C++
    ASCII-only path silently diverged on uncased vocabs)."""
    from mpmc_tpu.text.native import NativeWordPieceTokenizer
    from mpmc_tpu.text.wordpiece import WordPieceTokenizer

    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "uber", "cafe", "strasse",
              "istanbul", "##s", "u", "c", "s", "i", "a", "e", "f", "b", "r",
              "t", "l", "n"]
    p = tmp_path / "lower_vocab.txt"
    p.write_text("\n".join(tokens) + "\n", encoding="utf-8")
    texts = ["Über CAFÉ straße", "İstanbul écafé",
             "UBER cafe", "naïve façade"]
    nat = NativeWordPieceTokenizer(str(p), do_lower_case=True)
    py = WordPieceTokenizer.from_file(str(p), do_lower_case=True)
    n_ids, n_mask = nat.encode_batch(texts, 16)
    p_ids, p_mask = py.encode_batch(texts, 16)
    np.testing.assert_array_equal(n_ids, p_ids)
    np.testing.assert_array_equal(n_mask, p_mask)
    # sanity: lowering actually maps Ü→u etc. (not UNK floods)
    assert (n_ids == 1).mean() < 0.2


def test_build_tokenizer_selects_native_backend(tmp_path):
    """Driver-level wiring (VERDICT r2 #6): ``build_tokenizer`` returns the
    C++ backend (through the npz-cached HybridWordPieceTokenizer) whenever
    the lib is built — for corpus vocabs too — and its token ids over the
    real dev corpus pin to the pure-Python oracle exactly."""
    from mpmc_tpu.cli.experiments import build_tokenizer
    from mpmc_tpu.io import read_manifest
    from mpmc_tpu.text.normalize import preprocess_arabic_tweet
    from mpmc_tpu.text.tokenizer import HybridWordPieceTokenizer
    from mpmc_tpu.text.wordpiece import WordPieceTokenizer

    texts = [preprocess_arabic_tweet(t)
             for t in read_manifest(DEV).texts]
    tok = build_tokenizer(texts, None, cache_dir=str(tmp_path))
    assert isinstance(tok, HybridWordPieceTokenizer)
    assert tok.backend_name == "native-c++"

    py = WordPieceTokenizer(tok.vocab)
    n_ids, n_mask = tok.encode_batch(texts, 64)
    p_ids, p_mask = py.encode_batch(texts, 64)
    np.testing.assert_array_equal(n_ids, p_ids)
    np.testing.assert_array_equal(n_mask, p_mask)

    # second call hits the npz cache (same result)
    c_ids, c_mask = tok.encode_batch(texts, 64)
    np.testing.assert_array_equal(c_ids, n_ids)

    # vocab round-trips through save (predict-time persistence surface)
    out = tmp_path / "v.txt"
    tok.save(str(out))
    reloaded = build_tokenizer(texts, str(out), cache_dir=str(tmp_path))
    assert isinstance(reloaded, HybridWordPieceTokenizer)
    r_ids, _ = reloaded.encode_batch(texts, 64)
    np.testing.assert_array_equal(r_ids, n_ids)


def test_tokenizer_cache_is_vocab_keyed(tmp_path):
    """Regression: the npz tokenization cache must key on the VOCAB, not
    just the texts — the same corpus tokenized under two different vocabs
    yields different ids, and serving one vocab's cache entry to the other
    produces out-of-range ids that silently NaN the downstream model."""
    from mpmc_tpu.cli.experiments import build_tokenizer

    texts_a = ["alpha beta gamma", "delta epsilon"]
    texts_b = ["zeta eta theta iota", "kappa lambda mu nu", "alpha beta"]
    shared = ["alpha beta zeta kappa"] * 3
    cache = str(tmp_path)
    tok_a = build_tokenizer(texts_a, None, cache_dir=cache)
    tok_b = build_tokenizer(texts_b, None, cache_dir=cache)
    assert tok_a.vocab != tok_b.vocab
    ids_a, _ = tok_a.encode_batch(shared, 8)   # populates the cache
    ids_b, _ = tok_b.encode_batch(shared, 8)   # MUST NOT hit tok_a's entry
    ref_b, _ = __import__("mpmc_tpu.text.wordpiece", fromlist=["x"]) \
        .WordPieceTokenizer(tok_b.vocab).encode_batch(shared, 8)
    np.testing.assert_array_equal(ids_b, ref_b)
    assert not np.array_equal(ids_a, ids_b)
