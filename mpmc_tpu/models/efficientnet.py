"""EfficientNet-B0..B4 (reference 2B zoo ``EfficientNetB3/B4/Bb``,
``Untitled-2.py:255-344``).

Standard compound-scaled MBConv architecture in flax/NHWC.  The reference
wraps timm backbones and swaps the classifier; here ``num_classes=0`` returns
pooled features for the same wrapper pattern.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn

# (expand_ratio, channels, repeats, stride, kernel)
_BASE_BLOCKS: List[Tuple[int, int, int, int, int]] = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]

# width_mult, depth_mult per variant
_SCALES = {"b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2),
           "b3": (1.2, 1.4), "b4": (1.4, 1.8)}


def _round_channels(ch: float, divisor: int = 8) -> int:
    new = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new < 0.9 * ch:
        new += divisor
    return new


class MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand: int
    stride: int
    kernel: int
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                       momentum=0.9, name=name)
        mid = self.in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, name="expand_conv")(y)
            y = nn.silu(bn("expand_bn")(y))
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=self.kernel // 2, feature_group_count=mid,
                    use_bias=False, name="dw_conv")(y)
        y = nn.silu(bn("dw_bn")(y))
        # squeeze-excite on pre-expansion channel count
        se_ch = max(1, int(self.in_ch * self.se_ratio))
        s = jnp.mean(y, axis=(1, 2))
        s = nn.silu(nn.Dense(se_ch, name="se_reduce")(s))
        s = nn.sigmoid(nn.Dense(mid, name="se_expand")(s))
        y = y * s[:, None, None, :]
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="project_conv")(y)
        y = bn("project_bn")(y)
        if self.stride == 1 and self.in_ch == self.out_ch:
            y = y + x
        return y


class EfficientNet(nn.Module):
    variant: str = "b3"
    num_classes: int = 0

    @property
    def feature_dim(self) -> int:
        w, _ = _SCALES[self.variant]
        return _round_channels(1280 * w)

    @nn.compact
    def __call__(self, x, train: bool = False):
        w_mult, d_mult = _SCALES[self.variant]
        bn = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                       momentum=0.9, name=name)
        stem = _round_channels(32 * w_mult)
        y = nn.Conv(stem, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    name="stem_conv")(x)
        y = nn.silu(bn("stem_bn")(y))
        in_ch = stem
        for bi, (expand, ch, reps, stride, kernel) in enumerate(_BASE_BLOCKS):
            out_ch = _round_channels(ch * w_mult)
            for r in range(int(math.ceil(reps * d_mult))):
                y = MBConv(in_ch, out_ch, expand, stride if r == 0 else 1,
                           kernel, name=f"block{bi}_{r}")(y, train)
                in_ch = out_ch
        head = self.feature_dim
        y = nn.Conv(head, (1, 1), use_bias=False, name="head_conv")(y)
        y = nn.silu(bn("head_bn")(y))
        feats = jnp.mean(y, axis=(1, 2))
        if self.num_classes:
            return nn.Dense(self.num_classes, name="classifier")(feats)
        return feats


def efficientnet_b3(num_classes: int = 0) -> EfficientNet:
    return EfficientNet("b3", num_classes=num_classes)


def efficientnet_b4(num_classes: int = 0) -> EfficientNet:
    return EfficientNet("b4", num_classes=num_classes)
