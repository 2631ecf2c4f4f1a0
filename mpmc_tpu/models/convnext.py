"""ConvNeXt-Tiny (reference C4 frozen feature extractor).

The organizer baselines extract 768-d image features with torchvision
``convnext_tiny``: ``avgpool(features(img))`` (``baselines/extract_feat.py:
84-87, 57-60``).  This is the flax/NHWC equivalent: stages [3,3,9,3], dims
[96,192,384,768], depthwise 7×7 + LayerNorm + pointwise MLP blocks with
layer-scale; ``num_classes=0`` returns the 768-d pooled features.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, name="norm")(y)
        y = nn.Dense(4 * self.dim, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="pwconv2")(y)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return x + gamma * y


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 0

    @property
    def feature_dim(self) -> int:
        return self.dims[-1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    name="stem_conv")(x)
        y = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(y)
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si > 0:
                y = nn.LayerNorm(epsilon=1e-6, name=f"down{si}_norm")(y)
                y = nn.Conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                            name=f"down{si}_conv")(y)
            for bi in range(depth):
                y = ConvNeXtBlock(dim, name=f"stage{si}_block{bi}")(y)
        feats = jnp.mean(y, axis=(1, 2))
        feats = nn.LayerNorm(epsilon=1e-6, name="final_norm")(feats)
        if self.num_classes:
            return nn.Dense(self.num_classes, name="classifier")(feats)
        return feats


def convnext_tiny(num_classes: int = 0) -> ConvNeXt:
    return ConvNeXt(num_classes=num_classes)
