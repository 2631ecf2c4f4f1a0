"""HF torch checkpoint → mpmc_tpu flax param-tree conversion.

The reference loads pretrained encoders straight from the HF hub
(``AutoModel.from_pretrained``, e.g. ``Multimodal_example_task2C.py:317``).
This environment has no network, so conversion is offline: given a local HF
checkpoint directory (``pytorch_model.bin`` / ``model.safetensors`` +
``config.json``), produce the param pytree for ``mpmc_tpu.models.bert.
TextEncoder``.  Tests validate the mapping end-to-end by building a *random*
HF ``BertModel``/``RobertaModel`` in memory and checking logits parity —
the same path works for real AraBERT/QARiB/RoBERTa checkpoints when present.

Mapping (HF BERT → ours):
  embeddings.{word,position,token_type}_embeddings.weight → embedding tables
  embeddings.LayerNorm → embeddings_ln
  encoder.layer.N.attention.self.{query,key,value}    → layer_N/attention/{query,key,value}
  encoder.layer.N.attention.output.dense              → layer_N/attention/out
  encoder.layer.N.attention.output.LayerNorm          → layer_N/attention_ln
  encoder.layer.N.intermediate.dense                  → layer_N/intermediate
  encoder.layer.N.output.dense                        → layer_N/output
  encoder.layer.N.output.LayerNorm                    → layer_N/output_ln
  pooler.dense                                        → pooler
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from mpmc_tpu.config import TextEncoderConfig


def _split_heads(w: np.ndarray, num_heads: int) -> np.ndarray:
    """HF [out, in] torch linear → flax DenseGeneral kernel [in, heads, head_dim]."""
    out_dim, in_dim = w.shape
    return np.ascontiguousarray(
        w.T.reshape(in_dim, num_heads, out_dim // num_heads))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def convert_bert_state_dict(sd: Dict[str, np.ndarray],
                            cfg: TextEncoderConfig) -> Dict:
    """Convert an HF BERT/RoBERTa state_dict (numpy values) to our tree."""
    sd = {k.removeprefix("bert.").removeprefix("roberta."): v
          for k, v in sd.items()}
    H = cfg.num_heads
    head_dim = cfg.hidden_size // H
    p: Dict = {}
    p["word_embeddings"] = {"embedding": sd["embeddings.word_embeddings.weight"]}
    p["position_embeddings"] = {
        "embedding": sd["embeddings.position_embeddings.weight"]}
    if cfg.type_vocab_size > 0 and "embeddings.token_type_embeddings.weight" in sd:
        p["token_type_embeddings"] = {
            "embedding": sd["embeddings.token_type_embeddings.weight"]}
    p["embeddings_ln"] = {"scale": sd["embeddings.LayerNorm.weight"],
                          "bias": sd["embeddings.LayerNorm.bias"]}
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}."
        attn = {}
        for name in ("query", "key", "value"):
            attn[name] = {
                "kernel": _split_heads(sd[pre + f"attention.self.{name}.weight"], H),
                "bias": sd[pre + f"attention.self.{name}.bias"].reshape(H, head_dim),
            }
        attn["out"] = {
            "kernel": np.ascontiguousarray(
                sd[pre + "attention.output.dense.weight"].T.reshape(
                    H, head_dim, cfg.hidden_size)),
            "bias": sd[pre + "attention.output.dense.bias"],
        }
        p[f"layer_{i}"] = {
            "attention": attn,
            "attention_ln": {
                "scale": sd[pre + "attention.output.LayerNorm.weight"],
                "bias": sd[pre + "attention.output.LayerNorm.bias"]},
            "intermediate": {
                "kernel": _linear(sd[pre + "intermediate.dense.weight"]),
                "bias": sd[pre + "intermediate.dense.bias"]},
            "output": {
                "kernel": _linear(sd[pre + "output.dense.weight"]),
                "bias": sd[pre + "output.dense.bias"]},
            "output_ln": {
                "scale": sd[pre + "output.LayerNorm.weight"],
                "bias": sd[pre + "output.LayerNorm.bias"]},
        }
    if "pooler.dense.weight" in sd:
        p["pooler"] = {"kernel": _linear(sd["pooler.dense.weight"]),
                       "bias": sd["pooler.dense.bias"]}
    return p


def load_hf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a local HF checkpoint dir's tensors as numpy (torch or safetensors)."""
    st_path = os.path.join(path, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file
        return load_file(st_path)
    bin_path = os.path.join(path, "pytorch_model.bin")
    import torch
    sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def convert_checkpoint_dir(path: str, cfg: TextEncoderConfig) -> Dict:
    return convert_bert_state_dict(load_hf_checkpoint(path), cfg)
