"""DenseNet-BC in NHWC flax linen.

TPU-native replacement for the gluoncv DenseNet121 backbone the reference uses for
its flagship models 0006/0042/0102 (reference train.py:204 via
``get_model('DenseNet121').features``; train_gnmt.py:150).

Design notes (TPU-first):
- NHWC layout with channel counts that are multiples of 32/128 — dense-block concats
  stay lane-aligned, and every conv lowers onto the MXU as an implicit GEMM.
- compute dtype is configurable (bf16 by default at call sites); parameters and batch
  norm statistics stay float32.
- the feature head reproduces gluon's fixed ``AvgPool2D(7)`` + flatten (not global
  pooling), which at 512² inputs yields the 4096-d per-frame feature vectors that the
  whole downstream pipeline (CNN-RNN, GNMT src_embed) consumes.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class DenseNetSpec:
    block_config: Sequence[int]
    growth_rate: int = 32
    num_init_features: int = 64
    bn_size: int = 4  # bottleneck width multiplier

    @property
    def final_channels(self) -> int:
        c = self.num_init_features
        for i, n in enumerate(self.block_config):
            c += n * self.growth_rate
            if i != len(self.block_config) - 1:
                c //= 2
        return c


DENSENET_SPECS = {
    121: DenseNetSpec((6, 12, 24, 16)),
    161: DenseNetSpec((6, 12, 36, 24), growth_rate=48, num_init_features=96),
    169: DenseNetSpec((6, 12, 32, 32)),
    201: DenseNetSpec((6, 12, 48, 32)),
}


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class _Transition(nn.Module):
    out_channels: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    """Feature extractor: (B, H, W, C) uint8/float → (B, F) flattened features."""

    spec: DenseNetSpec
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(self.spec.num_init_features, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        channels = self.spec.num_init_features
        for i, num_layers in enumerate(self.spec.block_config):
            for j in range(num_layers):
                x = _DenseLayer(self.spec.growth_rate, self.spec.bn_size,
                                self.dtype, name=f"block{i}_layer{j}")(x, train)
            channels += num_layers * self.spec.growth_rate
            if i != len(self.spec.block_config) - 1:
                channels //= 2
                x = _Transition(channels, self.dtype, name=f"transition{i}")(x, train)

        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn_final")(x)
        x = nn.relu(x)
        # gluon parity: fixed 7×7 average pool, stride 7 (NOT global pooling) then
        # flatten — 512² input → 16×16 map → (2, 2, 1024) → 4096-d features.
        # Maps smaller than 7 (inputs < 224²) pool globally instead of erroring.
        k = min(7, x.shape[1])
        x = nn.avg_pool(x, (k, k), strides=(k, k))
        return x.reshape(x.shape[0], -1)
