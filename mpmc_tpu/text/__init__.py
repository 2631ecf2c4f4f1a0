from mpmc_tpu.text.normalize import (  # noqa: F401
    demojize,
    normalize_tweet,
    preprocess_arabic_tweet,
    remove_non_arabic_words,
)
from mpmc_tpu.text.wordpiece import WordPieceTokenizer  # noqa: F401
from mpmc_tpu.text.bpe import ByteLevelBPETokenizer  # noqa: F401
from mpmc_tpu.text.tokenizer import BatchTokenizer, TokenizedBatch  # noqa: F401
