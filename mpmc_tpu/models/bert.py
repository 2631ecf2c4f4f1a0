"""BERT-family text encoder in flax.linen — AraBERT/QARiB/RoBERTa compatible.

TPU-first re-design of the reference's HF ``AutoModel`` backbones
(``Multimodal_example_task2C.py:317``): post-LayerNorm transformer encoder
with learned absolute positions, attention running through the Pallas kernel
(``mpmc_tpu.ops.attention``), weights convertible 1:1 from HF torch
checkpoints (``mpmc_tpu.models.hf_convert``).  All shapes are static; the
whole forward jits into a single XLA program with bf16 matmuls under the
train step's precision policy.

Covers the reference's text-model zoo (``textmodel_example_task2A.py:41-44``):
any BERT-architecture checkpoint (AraBERT v2/v02, QARiB, MARBERT, CAMeLBERT,
mBERT, bert-mini) via TextEncoderConfig dims; RoBERTa via
``roberta_style_positions``; DistilBERT via ``num_layers=6`` (DistilBERT's
missing token-type/pooler are handled in conversion).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mpmc_tpu.config import TextEncoderConfig
from mpmc_tpu.ops.attention import dot_product_attention


class MultiHeadSelfAttention(nn.Module):
    cfg: TextEncoderConfig
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool, segments=None):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            features=(c.num_heads, head_dim), axis=-1, name=name)
        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)
        ctx = dot_product_attention(q, k, v, mask, impl=self.attn_impl,
                                    segments=segments)
        out = nn.DenseGeneral(features=c.hidden_size, axis=(-2, -1),
                              name="out")(ctx)
        out = nn.Dropout(c.attention_dropout)(out, deterministic=deterministic)
        return out


class EncoderLayer(nn.Module):
    cfg: TextEncoderConfig
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool, segments=None):
        c = self.cfg
        # Post-LN (BERT-style): sublayer → residual → LayerNorm.
        attn = MultiHeadSelfAttention(c, self.attn_impl, name="attention")(
            x, mask, deterministic, segments)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_ln")(x + attn)
        h = nn.Dense(c.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=c.gelu_approx)
        h = nn.Dense(c.hidden_size, name="output")(h)
        h = nn.Dropout(c.hidden_dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_ln")(x + h)


class TextEncoder(nn.Module):
    """Returns last_hidden_state [B,S,H] (and pooler output on request).

    ``remat=True`` rematerializes each encoder layer in the backward pass
    (jax.checkpoint): activation memory drops from O(layers) to O(1) layers
    at ~1/3 extra FLOPs — the HBM-for-FLOPs trade for large-batch/long-seq
    fine-tuning.

    Setup-style (not ``@nn.compact``) so the embedding stage and the layer
    stack are separately callable — ``apply(..., method='embed')`` — which
    the pipeline-parallel harness (``parallel/pp.py``) uses to run the
    embeddings replicated while the ``layer_i`` stack is stage-sharded.
    The parameter tree is identical to the original compact layout
    (``word_embeddings``, ``position_embeddings``, ``token_type_embeddings``,
    ``embeddings_ln``, ``layer_0..layer_{L-1}``, ``pooler``).
    """

    cfg: TextEncoderConfig
    attn_impl: str = "auto"
    remat: bool = False

    def setup(self):
        c = self.cfg
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size)
        self.position_embeddings = nn.Embed(c.max_position_embeddings,
                                            c.hidden_size)
        if c.type_vocab_size > 0:
            self.token_type_embeddings = nn.Embed(c.type_vocab_size,
                                                  c.hidden_size)
        self.embeddings_ln = nn.LayerNorm(epsilon=c.layer_norm_eps)
        self.embed_dropout = nn.Dropout(c.hidden_dropout)
        layer_cls = (nn.remat(EncoderLayer, static_argnums=(3,))
                     if self.remat else EncoderLayer)
        for i in range(c.num_layers):
            setattr(self, f"layer_{i}", layer_cls(c, self.attn_impl))
        self.pooler = nn.Dense(c.hidden_size)

    def embed(self, input_ids, attention_mask,
              token_type_ids: Optional[jax.Array] = None,
              deterministic: bool = True,
              positions: Optional[jax.Array] = None):
        """Embedding stage: word + position (+ type) → LayerNorm → dropout.

        ``positions`` overrides the position ids with 0-based per-sample
        offsets (sequence packing, ``ops/packing.py``) — they restart at
        each packed segment so absolute-position embeddings match the
        unpacked forward exactly; the RoBERTa convention's offset is
        applied on top."""
        c = self.cfg
        B, S = input_ids.shape
        word = self.word_embeddings(input_ids)
        if positions is not None:
            if c.roberta_style_positions:
                # RoBERTa maps the i-th valid token to (i+1) + pad_id.
                positions = positions + (c.pad_token_id + 1)
            positions = positions.astype(jnp.int32)
        elif c.roberta_style_positions:
            # RoBERTa: positions count non-pad tokens, offset by pad_id+1.
            positions = (jnp.cumsum(attention_mask, axis=1) * attention_mask
                         + c.pad_token_id).astype(jnp.int32)
        else:
            positions = jnp.broadcast_to(
                jnp.arange(S, dtype=jnp.int32)[None, :], (B, S))
        x = word + self.position_embeddings(positions)
        if c.type_vocab_size > 0:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(input_ids)
            x = x + self.token_type_embeddings(token_type_ids)
        x = self.embeddings_ln(x)
        return self.embed_dropout(x, deterministic=deterministic)

    def run_layers(self, x, mask, deterministic: bool = True, segments=None):
        """The transformer stack over an f32 attention mask [B,S] (or packed
        segment ids — ``ops/packing.py``)."""
        for i in range(self.cfg.num_layers):
            x = getattr(self, f"layer_{i}")(x, mask, deterministic, segments)
        return x

    def __call__(self, input_ids, attention_mask,
                 token_type_ids: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 return_pooled: bool = False,
                 segments: Optional[jax.Array] = None,
                 positions: Optional[jax.Array] = None):
        x = self.embed(input_ids, attention_mask, token_type_ids,
                       deterministic, positions=positions)
        x = self.run_layers(x, attention_mask.astype(jnp.float32),
                            deterministic, segments=segments)
        # Pooler params always exist (HF checkpoints ship them); the tanh
        # dense on [B, H] is negligible next to the encoder stack.
        pooled = nn.tanh(self.pooler(x[:, 0]))
        if return_pooled:
            return x, pooled
        return x
