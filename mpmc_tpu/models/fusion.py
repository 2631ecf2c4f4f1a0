"""Fusion mechanisms (reference component C12) — four families × 2/3 arities.

Formula parity with ``Multimodal_example_task2C.py``:

* ``MCA`` / ``MCA3`` (:395-449) — additive (Bahdanau-style) attention:
  score = tanh(W1·text + W2·image[:,None] (+ W3·caption)), weights =
  softmax(V·score, axis=1), context = Σ weights·features; MCA3 concatenates
  text+caption contexts and reduces 2U→U.
* ``ConcatAttention`` / ``ConcatAttention3`` (:451-499) — feature concat →
  Linear+BN+ReLU+Softmax gate (over features) → elementwise gate → reduce
  Linear+BN+ReLU.  This is the flagship default ("concatenation").
* ``CrossModalAttention`` (:502-538) — bidirectional single-token MHA
  (text↔image) averaged, then BatchNorm.
* ``SelfAttentionFusion`` (:541-559) — modality features stacked as tokens,
  self-MHA, token-sum, BatchNorm.

BatchNorm uses flax ``nn.BatchNorm``; under pjit the batch axis is global, so
batch statistics are computed over the full logical batch (the reference's
single-device BN semantics carry over to the sharded setting for free —
SURVEY.md §7 hard-parts list).

Deviation noted: the reference's 3-modality classifier would crash if
configured with cross_modal/self_attention fusion (their ``forward`` takes
only 2 inputs, ``:678`` passes 3).  Here both accept an optional caption
input: CrossModalAttention averages all ordered cross-pairs;
SelfAttentionFusion just stacks a third token.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from mpmc_tpu.config import FusionMethod
from mpmc_tpu.ops.attention import dot_product_attention


class MCA(nn.Module):
    units: int

    @nn.compact
    def __call__(self, text, image, train: bool = False):
        score = jnp.tanh(nn.Dense(self.units, name="W1")(text)
                         + nn.Dense(self.units, name="W2")(image)[:, None])
        weights = nn.softmax(nn.Dense(1, name="V")(score), axis=1)
        return jnp.sum(weights * text, axis=1)


class MCA3(nn.Module):
    units: int

    @nn.compact
    def __call__(self, text, image, caption, train: bool = False):
        score = jnp.tanh(nn.Dense(self.units, name="W1")(text)
                         + nn.Dense(self.units, name="W2")(image)[:, None]
                         + nn.Dense(self.units, name="W3")(caption))
        weights = nn.softmax(nn.Dense(1, name="V")(score), axis=1)
        ctx1 = jnp.sum(weights * text, axis=1)
        ctx2 = jnp.sum(weights * caption, axis=1)
        return nn.Dense(self.units, name="reduce")(
            jnp.concatenate([ctx1, ctx2], axis=-1))


class _GatedConcat(nn.Module):
    """Shared body of ConcatAttention / ConcatAttention3."""

    input_dim: int
    attention_dim: int

    @nn.compact
    def __call__(self, concat, train: bool):
        g = nn.Dense(self.input_dim, name="gate_fc")(concat)
        g = nn.BatchNorm(use_running_average=not train, name="gate_bn")(g)
        g = nn.softmax(nn.relu(g), axis=1)
        attended = g * concat
        h = nn.Dense(self.attention_dim, name="reduce_fc")(attended)
        h = nn.BatchNorm(use_running_average=not train, name="reduce_bn")(h)
        return nn.relu(h)


class ConcatAttention(nn.Module):
    input_dim: int
    attention_dim: int

    @nn.compact
    def __call__(self, text, image, train: bool = False):
        return _GatedConcat(self.input_dim, self.attention_dim, name="gated")(
            jnp.concatenate([text, image], axis=1), train)


class ConcatAttention3(nn.Module):
    input_dim: int
    attention_dim: int

    @nn.compact
    def __call__(self, text, image, caption, train: bool = False):
        return _GatedConcat(self.input_dim, self.attention_dim, name="gated")(
            jnp.concatenate([text, image, caption], axis=1), train)


class _SingleTokenMHA(nn.Module):
    """One-token-query MHA block (q/k/v/out projections kept for HF-style
    parameter shape parity with torch nn.MultiheadAttention)."""

    feature_dim: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, query, key_value):
        head_dim = self.feature_dim // self.num_heads
        shape = (self.num_heads, head_dim)
        q = nn.DenseGeneral(shape, axis=-1, name="q")(query)[:, None]
        k = nn.DenseGeneral(shape, axis=-1, name="k")(key_value)[:, None]
        v = nn.DenseGeneral(shape, axis=-1, name="v")(key_value)[:, None]
        ctx = dot_product_attention(q, k, v, impl="xla")  # Sq=Sk=1: trivial
        return nn.DenseGeneral(self.feature_dim, axis=(-2, -1), name="out")(
            ctx[:, 0])


class CrossModalAttention(nn.Module):
    feature_dim: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, text, image, caption: Optional[jnp.ndarray] = None,
                 train: bool = False):
        att_img = _SingleTokenMHA(self.feature_dim, self.num_heads,
                                  name="text_to_image")(text, image)
        att_txt = _SingleTokenMHA(self.feature_dim, self.num_heads,
                                  name="image_to_text")(image, text)
        if caption is None:
            combined = (att_txt + att_img) / 2
        else:
            att_cap = _SingleTokenMHA(self.feature_dim, self.num_heads,
                                      name="text_to_caption")(text, caption)
            combined = (att_txt + att_img + att_cap) / 3
        return nn.BatchNorm(use_running_average=not train, name="bn")(combined)


class SelfAttentionFusion(nn.Module):
    feature_dim: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, text, image, caption: Optional[jnp.ndarray] = None,
                 train: bool = False):
        feats = [text, image] + ([caption] if caption is not None else [])
        tokens = jnp.stack(feats, axis=1)  # [B, T, F]
        head_dim = self.feature_dim // self.num_heads
        shape = (self.num_heads, head_dim)
        q = nn.DenseGeneral(shape, axis=-1, name="q")(tokens)
        k = nn.DenseGeneral(shape, axis=-1, name="k")(tokens)
        v = nn.DenseGeneral(shape, axis=-1, name="v")(tokens)
        ctx = dot_product_attention(q, k, v, impl="xla")
        att = nn.DenseGeneral(self.feature_dim, axis=(-2, -1), name="out")(ctx)
        combined = jnp.sum(att, axis=1)
        return nn.BatchNorm(use_running_average=not train, name="bn")(combined)


def make_fusion(method: FusionMethod, proj_dim: int, n_modalities: int,
                feat_dims=None) -> nn.Module:
    """Mirror of the reference's fusion selection
    (``Multimodal_example_task2C.py:617-630``).

    ``feat_dims`` (actual per-modality widths) lets the concat gate handle a
    non-uniform image-branch width (``ImageEncoderConfig.finetune_dim`` ≠
    ``proj_dim``); the attention-style fusions require uniform widths.
    """
    method = FusionMethod(method)
    dims = list(feat_dims) if feat_dims else [proj_dim] * n_modalities
    if method == FusionMethod.CONCATENATION:
        if n_modalities == 3:
            return ConcatAttention3(sum(dims), proj_dim)
        return ConcatAttention(sum(dims), proj_dim)
    if len(set(dims)) > 1:
        raise ValueError(
            f"{method.value} fusion requires equal modality widths, got "
            f"{dims} — set ImageEncoderConfig.finetune_dim == proj_dim")
    if method == FusionMethod.MCA:
        return MCA3(proj_dim) if n_modalities == 3 else MCA(proj_dim)
    if method == FusionMethod.CROSS_MODAL:
        return CrossModalAttention(proj_dim)
    if method == FusionMethod.SELF_ATTENTION:
        return SelfAttentionFusion(proj_dim)
    raise ValueError(f"Unsupported fusion method: {method}")
