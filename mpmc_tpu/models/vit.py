"""Vision Transformer encoders (reference 2B zoo: ``Untitled-2.py:183-253``).

``ViTBase16``/``ViTLarge16`` at 224² or 384² (the zoo's
``vit_base_patch16_384`` etc.), built TPU-first: patchify as a strided conv,
encoder layers reuse the same Pallas attention as the text stack, class-token
pooling.  ``BinaryHead`` is the zoo's margin-style head
(``Untitled-2.py:164-179``): l2-normalize features then a scaled linear layer.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mpmc_tpu.ops.attention import dot_product_attention


class ViTEncoderLayer(nn.Module):
    hidden_size: int
    num_heads: int
    mlp_dim: int
    dropout: float = 0.0
    ln_eps: float = 1e-6  # timm default; HF ViTModel uses 1e-12

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # Pre-LN transformer block (ViT convention).
        h = nn.LayerNorm(epsilon=self.ln_eps, name="ln1")(x)
        head_dim = self.hidden_size // self.num_heads
        shape = (self.num_heads, head_dim)
        q = nn.DenseGeneral(shape, axis=-1, name="q")(h)
        k = nn.DenseGeneral(shape, axis=-1, name="k")(h)
        v = nn.DenseGeneral(shape, axis=-1, name="v")(h)
        ctx = dot_product_attention(q, k, v)
        h = nn.DenseGeneral(self.hidden_size, axis=(-2, -1), name="out")(ctx)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=self.ln_eps, name="ln2")(x)
        h = nn.Dense(self.mlp_dim, name="mlp1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_size, name="mlp2")(h)
        return x + nn.Dropout(self.dropout)(h, deterministic=deterministic)


class ViT(nn.Module):
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    num_classes: int = 0      # 0 → return CLS features
    dropout: float = 0.0
    ln_eps: float = 1e-6

    @property
    def feature_dim(self) -> int:
        return self.hidden_size

    @nn.compact
    def __call__(self, x, train: bool = False, return_tokens: bool = False):
        """``return_tokens=True`` returns the full normalized token sequence
        [B, 1+N, H] (CLS + patches) — e.g. as cross-attention memory for the
        caption decoder; default returns CLS features [B, H]."""
        B = x.shape[0]
        p = self.patch_size
        y = nn.Conv(self.hidden_size, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed")(x)                 # [B, H/p, W/p, C]
        y = y.reshape(B, -1, self.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.hidden_size))
        y = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.hidden_size)),
                             y], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, y.shape[1], self.hidden_size))
        y = y + pos
        for i in range(self.num_layers):
            y = ViTEncoderLayer(self.hidden_size, self.num_heads, self.mlp_dim,
                                self.dropout, self.ln_eps,
                                name=f"layer_{i}")(
                y, deterministic=not train)
        y = nn.LayerNorm(epsilon=self.ln_eps, name="ln_final")(y)
        if return_tokens:
            return y
        feats = y[:, 0]
        if self.num_classes:
            return nn.Dense(self.num_classes, name="classifier")(feats)
        return feats


def vit_base_16(num_classes: int = 0) -> ViT:
    return ViT(num_classes=num_classes)


def vit_large_16(num_classes: int = 0) -> ViT:
    return ViT(hidden_size=1024, num_layers=24, num_heads=16, mlp_dim=4096,
               num_classes=num_classes)


class BinaryHead(nn.Module):
    """l2-normalize → scaled linear (reference ``Untitled-2.py:164-179``)."""

    num_classes: int = 2
    scale: float = 1.0

    @nn.compact
    def __call__(self, feats):
        norm = jnp.sqrt(jnp.sum(feats ** 2, axis=-1, keepdims=True) + 1e-12)
        return self.scale * nn.Dense(self.num_classes, name="fc")(feats / norm)
