"""Pre-activation ResNet-v2 in NHWC flax linen.

TPU-native replacement for gluoncv's ``resnet18_v2`` (the reference's default
``--backbone``, train.py:31-32). Global average pooling head → constant feature dim
(512 for 18/34, 2048 for 50/101/152) regardless of input size.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ResNetSpec:
    layers: Sequence[int]
    bottleneck: bool

    @property
    def final_channels(self) -> int:
        return 512 * (4 if self.bottleneck else 1)


RESNET_SPECS = {
    18: ResNetSpec((2, 2, 2, 2), bottleneck=False),
    34: ResNetSpec((3, 4, 6, 3), bottleneck=False),
    50: ResNetSpec((3, 4, 6, 3), bottleneck=True),
    101: ResNetSpec((3, 4, 23, 3), bottleneck=True),
    152: ResNetSpec((3, 8, 36, 3), bottleneck=True),
}


class _BasicBlockV2(nn.Module):
    channels: int
    strides: int
    downsample: bool
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        h = nn.relu(h)
        residual = x
        if self.downsample:
            residual = nn.Conv(self.channels, (1, 1), strides=(self.strides,) * 2,
                               use_bias=False, dtype=self.dtype, name="ds")(h)
        h = nn.Conv(self.channels, (3, 3), strides=(self.strides,) * 2, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        return h + residual


class _BottleneckV2(nn.Module):
    channels: int  # output channels (4× the bottleneck width)
    strides: int
    downsample: bool
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        width = self.channels // 4
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        h = nn.relu(h)
        residual = x
        if self.downsample:
            residual = nn.Conv(self.channels, (1, 1), strides=(self.strides,) * 2,
                               use_bias=False, dtype=self.dtype, name="ds")(h)
        h = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(width, (3, 3), strides=(self.strides,) * 2, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn3")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        return h + residual


class ResNetV2(nn.Module):
    """Feature extractor: (B, H, W, C) → (B, final_channels) global-pooled features."""

    spec: ResNetSpec
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block = _BottleneckV2 if self.spec.bottleneck else _BasicBlockV2
        mult = 4 if self.spec.bottleneck else 1
        in_c = 64
        for i, num_blocks in enumerate(self.spec.layers):
            channels = 64 * (2**i) * mult
            for j in range(num_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = block(channels, strides, downsample=(j == 0 and in_c != channels)
                          or strides != 1, dtype=self.dtype,
                          name=f"stage{i}_block{j}")(x, train)
            in_c = channels

        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn_final")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return x
