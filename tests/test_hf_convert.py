"""HF torch checkpoint → flax conversion: logits parity with transformers.

Builds a random tiny HF BertModel in memory, converts its state_dict through
mpmc_tpu.models.hf_convert, and checks last_hidden_state + pooler parity —
the exact path real AraBERT/QARiB/RoBERTa checkpoints take (SURVEY.md §7
hard-part #1)."""

import numpy as np
import pytest
import torch

from mpmc_tpu.config import TextEncoderConfig
from mpmc_tpu.models.bert import TextEncoder
from mpmc_tpu.models.hf_convert import convert_bert_state_dict


@pytest.fixture(scope="module")
def hf_bert():
    from transformers import BertConfig, BertModel
    cfg = BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, type_vocab_size=2,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    return BertModel(cfg).eval(), cfg


def test_bert_conversion_logits_parity(hf_bert, rng):
    model, hcfg = hf_bert
    cfg = TextEncoderConfig(
        vocab_size=hcfg.vocab_size, hidden_size=hcfg.hidden_size,
        num_layers=hcfg.num_hidden_layers, num_heads=hcfg.num_attention_heads,
        intermediate_size=hcfg.intermediate_size,
        max_position_embeddings=hcfg.max_position_embeddings,
        hidden_dropout=0.0, attention_dropout=0.0)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_bert_state_dict(sd, cfg)

    B, S = 3, 16
    ids = rng.integers(0, 128, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[0, 10:] = 0

    enc = TextEncoder(cfg)
    ours, pooled = enc.apply({"params": params}, ids, mask,
                             return_pooled=True)

    with torch.no_grad():
        ref = model(torch.tensor(ids, dtype=torch.long),
                    attention_mask=torch.tensor(mask, dtype=torch.long))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.last_hidden_state.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooler_output.numpy(), atol=2e-4)


def test_roberta_conversion_positions(rng):
    """RoBERTa-style position offsetting matches transformers."""
    from transformers import RobertaConfig, RobertaModel
    hcfg = RobertaConfig(vocab_size=100, hidden_size=32, num_hidden_layers=1,
                         num_attention_heads=4, intermediate_size=64,
                         max_position_embeddings=40, type_vocab_size=1,
                         hidden_dropout_prob=0.0,
                         attention_probs_dropout_prob=0.0, pad_token_id=1)
    torch.manual_seed(1)
    model = RobertaModel(hcfg).eval()
    cfg = TextEncoderConfig(
        vocab_size=100, hidden_size=32, num_layers=1, num_heads=4,
        intermediate_size=64, max_position_embeddings=40, type_vocab_size=1,
        pad_token_id=1, roberta_style_positions=True, layer_norm_eps=1e-5,
        hidden_dropout=0.0, attention_dropout=0.0)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_bert_state_dict(sd, cfg)
    # RoBERTa has token_type vocab 1; our encoder adds the (zero-indexed)
    # type embedding — keep it in the tree.
    B, S = 2, 10
    ids = rng.integers(2, 100, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, 6:] = 0
    ids[1, 6:] = 1  # pad tokens
    enc = TextEncoder(cfg)
    ours = enc.apply({"params": params}, ids, mask)
    with torch.no_grad():
        ref = model(torch.tensor(ids, dtype=torch.long),
                    attention_mask=torch.tensor(mask, dtype=torch.long))
    # compare unmasked positions only (HF computes padded positions with
    # pos-id pad_token_id; ours uses the same rule)
    np.testing.assert_allclose(np.asarray(ours)[mask == 1],
                               ref.last_hidden_state.numpy()[mask == 1],
                               atol=2e-4)
