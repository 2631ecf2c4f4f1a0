"""BPE-learned WordPiece vocab (text/wordpiece_learn.py) + driver wiring."""

import numpy as np

from mpmc_tpu.text.wordpiece import WordPieceTokenizer
from mpmc_tpu.text.wordpiece_learn import SPECIALS, learn_wordpiece_vocab


CORPUS = ["الدعاية السياسية في الصور",
          "صورة دعاية سياسية واضحة",
          "نص عادي بدون دعاية",
          "الدعاية تنتشر في كل مكان"] * 10


def test_learner_vocab_structure_and_determinism():
    v1 = learn_wordpiece_vocab(CORPUS, vocab_size=200)
    v2 = learn_wordpiece_vocab(CORPUS, vocab_size=200)
    assert v1 == v2  # deterministic merges (ties broken lexically)
    assert list(v1)[:5] == SPECIALS
    assert len(v1) <= 200
    # merges happened: some multi-char piece exists
    assert any(len(t.lstrip("#")) > 1 for t in v1 if t not in SPECIALS)


def test_learned_vocab_encodes_without_unk_and_compresses():
    vocab = learn_wordpiece_vocab(CORPUS, vocab_size=300)
    tok = WordPieceTokenizer(vocab)
    unk = vocab["[UNK]"]
    ids, mask = tok.encode_batch(CORPUS[:4], 32)
    assert ids.shape == (4, 32)
    assert not np.any(ids == unk)  # base chars cover the corpus
    # a frequent word tokenizes to fewer pieces than its character count
    word = "الدعاية"
    n_pieces = len(tok.tokenize_to_ids(word))
    assert 1 <= n_pieces < len(word)


def test_build_tokenizer_subword_mode(tmp_path):
    from mpmc_tpu.cli.experiments import build_tokenizer

    tok = build_tokenizer(CORPUS, None, cache_dir=str(tmp_path),
                          corpus_vocab_mode="subword",
                          corpus_vocab_size=300)
    ids, mask = tok.encode_batch(CORPUS[:4], 16)
    assert ids.shape == (4, 16) and mask.sum() > 0
    # budget respected and smaller than the whole-word default would be
    assert max(tok.vocab.values()) + 1 <= 300
