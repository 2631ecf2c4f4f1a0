"""BLIP captioner with HF architecture parity (reference C14).

The reference's third modality is ``Salesforce/blip-image-captioning-large``
(``Multimodal_example_task2C.py:195-206``).  This is a faithful flax
implementation of HF's ``BlipForConditionalGeneration`` graph so real BLIP
checkpoints convert 1:1 (``convert_blip_state_dict``), validated in tests by
logits + greedy-generate parity against a randomly-initialized HF BLIP:

* vision: ViT with fused-qkv attention, pre-LN blocks, class token, learned
  positions, final post-layernorm (BlipVisionModel);
* text decoder: BERT-style post-LN layers with causal self-attention and
  cross-attention over the full vision sequence (BlipTextLMHeadModel),
  prediction head = dense→gelu→LN→vocab projection;
* generation: greedy, conditioned on a prompt ("a meme of"), one jitted
  ``lax.scan`` with static shapes.

The lightweight generic captioner (``mpmc_tpu.models.captioner``) remains for
from-scratch training; this module is the drop-in for converted BLIP weights.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BlipConfig:
    # vision
    v_hidden: int = 1024
    v_layers: int = 24
    v_heads: int = 16
    v_mlp: int = 4096
    image_size: int = 384
    patch_size: int = 16
    v_eps: float = 1e-5
    # text decoder
    vocab_size: int = 30524
    t_hidden: int = 768
    t_layers: int = 12
    t_heads: int = 12
    t_mlp: int = 3072
    max_positions: int = 512
    t_eps: float = 1e-12
    bos_token_id: int = 30522
    eos_token_id: int = 102
    pad_token_id: int = 0

    @staticmethod
    def tiny() -> "BlipConfig":
        return BlipConfig(v_hidden=24, v_layers=2, v_heads=4, v_mlp=48,
                          image_size=32, patch_size=8, vocab_size=64,
                          t_hidden=32, t_layers=2, t_heads=4, t_mlp=64,
                          max_positions=32, bos_token_id=1, eos_token_id=2)


class _VisionLayer(nn.Module):
    cfg: BlipConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        D = c.v_hidden // c.v_heads
        h = nn.LayerNorm(epsilon=c.v_eps, name="layer_norm1")(x)
        qkv = nn.Dense(3 * c.v_hidden, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, S, _ = q.shape
        q = q.reshape(B, S, c.v_heads, D)
        k = k.reshape(B, S, c.v_heads, D)
        v = v.reshape(B, S, c.v_heads, D)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / jnp.sqrt(D)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S, c.v_hidden)
        x = x + nn.Dense(c.v_hidden, name="projection")(ctx)
        h = nn.LayerNorm(epsilon=c.v_eps, name="layer_norm2")(x)
        h = nn.Dense(c.v_mlp, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(c.v_hidden, name="fc2")(h)


class BlipVisionModel(nn.Module):
    cfg: BlipConfig

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: NHWC float → [B, 1+P, v_hidden]."""
        c = self.cfg
        B = pixel_values.shape[0]
        p = c.patch_size
        x = nn.Conv(c.v_hidden, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embedding")(pixel_values)
        x = x.reshape(B, -1, c.v_hidden)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (1, 1, c.v_hidden))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, c.v_hidden)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1, (c.image_size // p) ** 2 + 1, c.v_hidden))
        x = x + pos[:, : x.shape[1]]
        for i in range(c.v_layers):
            x = _VisionLayer(c, name=f"layer_{i}")(x)
        return nn.LayerNorm(epsilon=c.v_eps, name="post_layernorm")(x)


class _TextLayer(nn.Module):
    cfg: BlipConfig

    @nn.compact
    def __call__(self, x, enc, causal_bias):
        c = self.cfg
        D = c.t_hidden // c.t_heads
        B, S, _ = x.shape

        def mha(prefix, q_in, kv_in, bias):
            q = nn.Dense(c.t_hidden, name=f"{prefix}_query")(q_in)
            k = nn.Dense(c.t_hidden, name=f"{prefix}_key")(kv_in)
            v = nn.Dense(c.t_hidden, name=f"{prefix}_value")(kv_in)
            Sk = k.shape[1]
            q = q.reshape(B, S, c.t_heads, D)
            k = k.reshape(B, Sk, c.t_heads, D)
            v = v.reshape(B, Sk, c.t_heads, D)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32) / jnp.sqrt(D)
            if bias is not None:
                s = s + bias
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S,
                                                               c.t_hidden)

        h = mha("self", x, x, causal_bias)
        h = nn.Dense(c.t_hidden, name="self_out")(h)
        x = nn.LayerNorm(epsilon=c.t_eps, name="self_ln")(x + h)
        h = mha("cross", x, enc, None)
        h = nn.Dense(c.t_hidden, name="cross_out")(h)
        x = nn.LayerNorm(epsilon=c.t_eps, name="cross_ln")(x + h)
        h = nn.Dense(c.t_mlp, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.t_hidden, name="output")(h)
        return nn.LayerNorm(epsilon=c.t_eps, name="output_ln")(x + h)


class BlipTextDecoder(nn.Module):
    cfg: BlipConfig

    @nn.compact
    def __call__(self, input_ids, encoder_states):
        c = self.cfg
        B, S = input_ids.shape
        x = nn.Embed(c.vocab_size, c.t_hidden, name="word_embeddings")(
            input_ids)
        pos = nn.Embed(c.max_positions, c.t_hidden,
                       name="position_embeddings")(
            jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S)))
        x = nn.LayerNorm(epsilon=c.t_eps, name="embeddings_ln")(x + pos)
        causal = jnp.where(jnp.tril(jnp.ones((S, S), bool)), 0.0,
                           -1e10)[None, None]
        for i in range(c.t_layers):
            x = _TextLayer(c, name=f"layer_{i}")(x, encoder_states, causal)
        # prediction head (cls.predictions.*)
        h = nn.Dense(c.t_hidden, name="transform")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=c.t_eps, name="transform_ln")(h)
        return nn.Dense(c.vocab_size, name="decoder")(h)


class BlipCaptioner(nn.Module):
    cfg: BlipConfig

    def setup(self):
        self.vision_model = BlipVisionModel(self.cfg)
        self.text_decoder = BlipTextDecoder(self.cfg)

    def __call__(self, pixel_values, input_ids):
        enc = self.vision_model(pixel_values)
        return self.text_decoder(input_ids, enc)

    def generate(self, pixel_values, prompt_ids, max_len: int = 32):
        """Greedy decode: prompt (incl. BOS) → caption token ids [B, max_len];
        after EOS the sequence is padded with pad_token_id."""
        c = self.cfg
        enc = self.vision_model(pixel_values)
        B, P = prompt_ids.shape
        tokens = jnp.full((B, max_len), c.pad_token_id, jnp.int32)
        tokens = tokens.at[:, :P].set(prompt_ids)
        finished = jnp.zeros((B,), bool)

        def step(carry, pos):
            toks, fin = carry
            logits = self.text_decoder(toks, enc)
            nxt = jnp.argmax(logits[:, pos - 1], axis=-1).astype(jnp.int32)
            write = (pos >= P) & (~fin)
            toks = toks.at[:, pos].set(jnp.where(write, nxt, toks[:, pos]))
            fin = fin | (write & (nxt == c.eos_token_id))
            return (toks, fin), None

        (tokens, _), _ = jax.lax.scan(step, (tokens, finished),
                                      jnp.arange(1, max_len))
        return tokens


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------

def _lin(sd, key):
    return {"kernel": np.ascontiguousarray(sd[key + ".weight"].T),
            "bias": sd[key + ".bias"]}


def _ln(sd, key):
    return {"scale": sd[key + ".weight"], "bias": sd[key + ".bias"]}


def convert_blip_state_dict(sd: Dict[str, np.ndarray], cfg: BlipConfig
                            ) -> Dict:
    """HF BlipForConditionalGeneration state_dict (numpy) → our param tree."""
    p: Dict = {"vision_model": {}, "text_decoder": {}}
    v = p["vision_model"]
    v["class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    v["position_embedding"] = sd["vision_model.embeddings.position_embedding"]
    w = sd["vision_model.embeddings.patch_embedding.weight"]  # [C,3,p,p]
    v["patch_embedding"] = {
        "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
        "bias": sd["vision_model.embeddings.patch_embedding.bias"]}
    for i in range(cfg.v_layers):
        pre = f"vision_model.encoder.layers.{i}."
        v[f"layer_{i}"] = {
            "layer_norm1": _ln(sd, pre + "layer_norm1"),
            "layer_norm2": _ln(sd, pre + "layer_norm2"),
            "qkv": _lin(sd, pre + "self_attn.qkv"),
            "projection": _lin(sd, pre + "self_attn.projection"),
            "fc1": _lin(sd, pre + "mlp.fc1"),
            "fc2": _lin(sd, pre + "mlp.fc2"),
        }
    v["post_layernorm"] = _ln(sd, "vision_model.post_layernorm")

    t = p["text_decoder"]
    te = "text_decoder.bert.embeddings."
    t["word_embeddings"] = {"embedding": sd[te + "word_embeddings.weight"]}
    t["position_embeddings"] = {
        "embedding": sd[te + "position_embeddings.weight"]}
    t["embeddings_ln"] = _ln(sd, te + "LayerNorm")
    for i in range(cfg.t_layers):
        pre = f"text_decoder.bert.encoder.layer.{i}."
        t[f"layer_{i}"] = {
            "self_query": _lin(sd, pre + "attention.self.query"),
            "self_key": _lin(sd, pre + "attention.self.key"),
            "self_value": _lin(sd, pre + "attention.self.value"),
            "self_out": _lin(sd, pre + "attention.output.dense"),
            "self_ln": _ln(sd, pre + "attention.output.LayerNorm"),
            "cross_query": _lin(sd, pre + "crossattention.self.query"),
            "cross_key": _lin(sd, pre + "crossattention.self.key"),
            "cross_value": _lin(sd, pre + "crossattention.self.value"),
            "cross_out": _lin(sd, pre + "crossattention.output.dense"),
            "cross_ln": _ln(sd, pre + "crossattention.output.LayerNorm"),
            "intermediate": _lin(sd, pre + "intermediate.dense"),
            "output": _lin(sd, pre + "output.dense"),
            "output_ln": _ln(sd, pre + "output.LayerNorm"),
        }
    t["transform"] = _lin(sd, "text_decoder.cls.predictions.transform.dense")
    t["transform_ln"] = _ln(sd,
                            "text_decoder.cls.predictions.transform.LayerNorm")
    t["decoder"] = {
        "kernel": np.ascontiguousarray(
            sd["text_decoder.cls.predictions.decoder.weight"].T),
        "bias": sd["text_decoder.cls.predictions.bias"]}
    return p
