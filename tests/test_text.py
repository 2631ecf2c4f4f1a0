"""text layer: normalization behavior + tokenizer parity with HF slow tokenizers."""

import json

import numpy as np
import pytest

from mpmc_tpu.text import (
    ByteLevelBPETokenizer,
    BatchTokenizer,
    WordPieceTokenizer,
    normalize_tweet,
    preprocess_arabic_tweet,
    remove_non_arabic_words,
)
from mpmc_tpu.text import normalize as norm


def test_normalize_tweet_user_url():
    out = normalize_tweet("check @someone and https://x.co/abc … now")
    assert "@USER" in out
    assert "HTTPURL" in out
    assert "…" not in out


def test_normalize_tweet_contractions():
    assert normalize_tweet("I can't believe it's here") == \
        "I ca n't believe it 's here".replace("ca n't", "can't")
    # BERTweet output form: "can't" kept, "'s" split
    assert "'s" in normalize_tweet("it's")


def test_arabic_hamza_lamalef():
    assert norm.normalize_hamza("أإآا") == "اااا"
    assert norm.normalize_hamza("ؤئ") == "ءء"
    assert norm.normalize_lamalef("ﻻ") == "لا"


def test_arabic_strip_tashkeel():
    assert norm.strip_tashkeel("مُحَمَّد") == "محمد"


def test_remove_non_arabic():
    assert remove_non_arabic_words("hello مرحبا world بكم") == "مرحبا بكم"


def test_preprocess_arabic_tweet_full():
    t = "صباح الخير #propaganda https://t.co/xyz hello 😀"
    out = preprocess_arabic_tweet(t)
    assert out == "صباح الخير"


def test_demojize():
    out = norm.demojize("hi 😀")
    assert "😀" not in out and out.startswith("hi :")


# ---------------------------------------------------------------------------
# WordPiece parity vs transformers.BertTokenizer (pure-Python slow tokenizer,
# instantiated from a local vocab file — no network).
# ---------------------------------------------------------------------------

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "quick", "brown", "fox", "jump", "##s", "##ed", "over",
         "lazy", "dog", "un", "##aff", "##able", "run", "##ning", ",", ".",
         "!", "?", "'", "مرحبا", "##بكم", "ال", "##سلام"]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return str(p)


SAMPLES = [
    "the quick brown fox jumps over the lazy dog",
    "unaffable, running!",
    "THE QUICK fox.",
    "مرحبابكم السلام",
    "completely-unknown tokens?? here",
    "",
]


@pytest.mark.parametrize("lower", [False, True])
def test_wordpiece_matches_hf(vocab_file, lower):
    from transformers import BertTokenizer
    hf = BertTokenizer(vocab_file, do_lower_case=lower)
    ours = WordPieceTokenizer.from_file(vocab_file, do_lower_case=lower)
    for s in SAMPLES:
        enc = hf.encode_plus(s, max_length=16, padding="max_length",
                             truncation=True)
        ids, mask = ours.encode(s, 16)
        assert ids.tolist() == enc["input_ids"], s
        assert mask.tolist() == enc["attention_mask"], s


def test_wordpiece_truncation(vocab_file):
    ours = WordPieceTokenizer.from_file(vocab_file)
    ids, mask = ours.encode("the quick brown fox " * 50, 8)
    assert ids.shape == (8,)
    assert mask.sum() == 8
    assert ids[0] == ours.cls_id and ids[-1] == ours.sep_id


# ---------------------------------------------------------------------------
# Byte-level BPE parity vs transformers.RobertaTokenizer.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bpe_files(tmp_path_factory):
    from mpmc_tpu.text.bpe import bytes_to_unicode
    d = tmp_path_factory.mktemp("bpe")
    alphabet = sorted(set(bytes_to_unicode().values()))
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
              ("Ġ", "w"), ("o", "r"), ("Ġw", "or"), ("Ġwor", "ld"),
              ("l", "d"), ("Ġ", "t"), ("Ġt", "he")]
    tokens = (["<s>", "<pad>", "</s>", "<unk>", "<mask>"] + alphabet
              + ["".join(m) for m in merges])
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
        encoding="utf-8")
    return str(d / "vocab.json"), str(d / "merges.txt")


def test_bpe_matches_hf_roberta(bpe_files):
    from transformers import RobertaTokenizer
    vocab_path, merges_path = bpe_files
    hf = RobertaTokenizer(vocab_path, merges_path)
    ours = ByteLevelBPETokenizer.from_files(vocab_path, merges_path)
    for s in ["hello world", "the world!", "a meme of hello",
              "unicode ✓ bytes", ""]:
        enc = hf.encode_plus(s, max_length=16, padding="max_length",
                             truncation=True)
        ids, mask = ours.encode(s, 16)
        assert ids.tolist() == enc["input_ids"], s
        assert mask.tolist() == enc["attention_mask"], s


def test_batch_tokenizer_cache(vocab_file, tmp_path):
    wp = WordPieceTokenizer.from_file(vocab_file)
    bt = BatchTokenizer(wp, max_length=12, cache_dir=str(tmp_path))
    texts = SAMPLES[:3]
    b1 = bt(texts)
    b2 = bt(texts)  # served from cache
    np.testing.assert_array_equal(b1.ids, b2.ids)
    assert b1.ids.shape == (3, 12)
    assert b1.ids.dtype == np.int32
