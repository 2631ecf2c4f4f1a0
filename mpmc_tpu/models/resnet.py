"""ResNet family in flax (NHWC, TPU-native layouts).

Rebuilds the reference's image backbones: timm ``resnet18`` (the flagship 2C
default, ``Multimodal_example_task2C.py:83``), ``resnet50`` (the shipped-folds
run and the organizer 2C baseline, ``Multimodal_example_task2C.txt:169``), the
SE/ResNeXt variants of the 2B zoo (``Untitled-2.py:362-371``, via ``groups``/
``se_ratio``), and the from-scratch grayscale TinyResNet of the HF-Trainer 2B
example (``ResNet_example_task2B.py:146-152``: basic blocks, depths [2,2],
widths [32,64], 1 input channel).

Convs run in NHWC with f32 accumulation on the MXU; BatchNorm statistics are
computed over the global (sharded) batch under pjit.  ``num_classes=0``
returns pooled features (timm's ``reset_classifier(0)`` behavior used by the
reference's ``CustomDenseNet161`` wrapper, ``:569-570``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class SEModule(nn.Module):
    """Squeeze-and-excitation (for seresnext50_32x4d parity)."""

    channels: int
    ratio: float = 1 / 16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))
        hidden = max(int(self.channels * self.ratio), 8)
        s = nn.relu(nn.Dense(hidden, name="fc1")(s))
        s = nn.sigmoid(nn.Dense(self.channels, name="fc2")(s))
        return x * s[:, None, None, :]


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                       name=name)
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = bn("bn2")(y)
        if self.use_se:
            y = SEModule(self.filters, name="se")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    filters: int  # bottleneck width; output is 4*filters
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                       name=name)
        width = int(self.filters * (self.base_width / 64.0)) * self.groups
        out_ch = self.filters * 4
        residual = x
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                    padding=1, feature_group_count=self.groups,
                    use_bias=False, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = bn("bn3")(y)
        if self.use_se:
            y = SEModule(out_ch, name="se")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    depths: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    block: str = "basic"          # basic | bottleneck
    groups: int = 1
    base_width: int = 64
    use_se: bool = False
    num_classes: int = 0          # 0 → return pooled features
    stem_width: int = 64
    in_grayscale: bool = False

    @property
    def feature_dim(self) -> int:
        mult = 4 if self.block == "bottleneck" else 1
        return self.widths[-1] * mult

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, H, W, C] float
        y = nn.Conv(self.stem_width, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, name="stem_conv")(x)
        y = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 name="stem_bn")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for si, (depth, width) in enumerate(zip(self.depths, self.widths)):
            for bi in range(depth):
                stride = 2 if (bi == 0 and si > 0) else 1
                if self.block == "bottleneck":
                    y = BottleneckBlock(width, stride, self.groups,
                                        self.base_width, self.use_se,
                                        name=f"stage{si}_block{bi}")(y, train)
                else:
                    y = BasicBlock(width, stride, self.use_se,
                                   name=f"stage{si}_block{bi}")(y, train)
        feats = jnp.mean(y, axis=(1, 2))  # global average pool
        if self.num_classes:
            return nn.Dense(self.num_classes, name="classifier")(feats)
        return feats


def resnet18(num_classes: int = 0) -> ResNet:
    return ResNet((2, 2, 2, 2), (64, 128, 256, 512), "basic",
                  num_classes=num_classes)


def resnet50(num_classes: int = 0) -> ResNet:
    return ResNet((3, 4, 6, 3), (64, 128, 256, 512), "bottleneck",
                  num_classes=num_classes)


def resnext50_32x4d(num_classes: int = 0) -> ResNet:
    # Untitled-2.py ResNeXt50_32x4d_BH backbone
    return ResNet((3, 4, 6, 3), (64, 128, 256, 512), "bottleneck",
                  groups=32, base_width=4, num_classes=num_classes)


def seresnext50_32x4d(num_classes: int = 0) -> ResNet:
    # Untitled-2.py SEResNeXt50_32x4d_BH backbone
    return ResNet((3, 4, 6, 3), (64, 128, 256, 512), "bottleneck",
                  groups=32, base_width=4, use_se=True,
                  num_classes=num_classes)


class TinyResNet(nn.Module):
    """From-scratch tiny ResNet of the HF-Trainer 2B example
    (``ResNet_example_task2B.py:146-152``): grayscale input, embedding 64,
    basic blocks depths [2,2] widths [32,64]."""

    num_classes: int = 0
    depths: Tuple[int, int] = (2, 2)
    widths: Tuple[int, int] = (32, 64)

    @property
    def feature_dim(self) -> int:
        return self.widths[-1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="stem_conv")(x)
        y = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 name="stem_bn")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for si, (depth, width) in enumerate(zip(self.depths, self.widths)):
            for bi in range(depth):
                stride = 2 if (bi == 0 and si > 0) else 1
                y = BasicBlock(width, stride,
                               name=f"stage{si}_block{bi}")(y, train)
        feats = jnp.mean(y, axis=(1, 2))
        if self.num_classes:
            return nn.Dense(self.num_classes, name="classifier")(feats)
        return feats
