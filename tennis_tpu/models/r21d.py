"""R(2+1)D spatiotemporal ResNet in NDHWC flax linen.

Rebuild of the reference's factorized 3D CNN (reference
models/vision/rdnet/r21d.py:35-253): every 3D conv factors into a spatial
(1, k, k) conv → BN → ReLU → temporal (k, 1, 1) conv, with the paper's
mid-channel formula (r21d.py:40-41). 34-layer basic-block and 152-layer
bottleneck variants; the stem uses mid_channels=45 and a frozen-stats BN
(r21d.py:182-184 ``use_global_stats=True``).

Layout: clips are (B, T, H, W, C) — NDHWC maps each factor conv straight onto
the MXU (the reference swaps to channel-first NCTHW, r21d.py:203; no swap needed
here). ``__call__`` returns globally-pooled features (B, C_final); ``logits``
adds the Dense+softmax head (r21d.py:195-208 returns (x, avg, sm)).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


def _mid_channels(kernel, in_channels: int, out_channels: int) -> int:
    kt, kh, kw = kernel
    return int(math.floor(
        (kt * kh * kw * in_channels * out_channels)
        / (kh * kw * in_channels + kt * out_channels)
    ))


class Conv21D(nn.Module):
    """(1,k,k) spatial conv → BN → relu → (k,1,1) temporal conv."""

    out_channels: int
    kernel: Sequence[int] = (3, 3, 3)
    strides: Sequence[int] = (1, 1, 1)
    mid_channels: int | None = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        kt, kh, kw = self.kernel
        st, sh, sw = self.strides
        in_c = x.shape[-1]
        mid = self.mid_channels or _mid_channels(self.kernel, in_c,
                                                 self.out_channels)
        x = nn.Conv(mid, (1, kh, kw), strides=(1, sh, sw),
                    padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
                    use_bias=False, dtype=self.dtype, name="spatial")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.9, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (kt, 1, 1), strides=(st, 1, 1),
                    padding=((kt // 2, kt // 2), (0, 0), (0, 0)),
                    use_bias=False, dtype=self.dtype, name="temporal")(x)
        return x


class BasicBlock21D(nn.Module):
    channels: int
    stride: int
    downsample: bool
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        h = Conv21D(self.channels, strides=(self.stride,) * 3, dtype=self.dtype,
                    name="conv1")(x, train)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.9, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = Conv21D(self.channels, dtype=self.dtype, name="conv2")(h, train)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.9, dtype=self.dtype, name="bn2")(h)
        if self.downsample:
            residual = nn.Conv(self.channels, (1, 1, 1),
                               strides=(self.stride,) * 3, use_bias=False,
                               dtype=self.dtype, name="down")(x)
            residual = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                                    momentum=0.9, dtype=self.dtype,
                                    name="down_bn")(residual)
        return nn.relu(h + residual)


class Bottleneck21D(nn.Module):
    channels: int
    stride: int
    downsample: bool
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        width = self.channels // 4
        h = nn.Conv(width, (1, 1, 1), strides=(self.stride,) * 3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.9, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = Conv21D(width, dtype=self.dtype, name="conv2")(h, train)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.9, dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (1, 1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.9, dtype=self.dtype, name="bn3")(h)
        if self.downsample:
            residual = nn.Conv(self.channels, (1, 1, 1),
                               strides=(self.stride,) * 3, use_bias=False,
                               dtype=self.dtype, name="down")(x)
            residual = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                                    momentum=0.9, dtype=self.dtype,
                                    name="down_bn")(residual)
        return nn.relu(h + residual)


R21D_SPECS = {
    34: ("basic", (3, 4, 6, 3), (64, 64, 128, 256, 512)),
    152: ("bottleneck", (3, 8, 36, 3), (64, 256, 512, 1024, 2048)),
}


class R21D(nn.Module):
    """(B, T, H, W, C) clips → pooled features (B, C_final)."""

    num_layers: int = 34
    num_classes: int = 400
    dtype: Any = jnp.bfloat16
    # rematerialize each residual block in backward (jax.checkpoint): stores
    # only block INPUTS, letting window-32 clips train at batches that
    # otherwise exceed HBM (the DenseNet analogue is backbones.py --remat
    # block). Param trees are identical with/without.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_type, layers, channels = R21D_SPECS[self.num_layers]
        block = BasicBlock21D if block_type == "basic" else Bottleneck21D
        if self.remat:
            block = nn.remat(block, static_argnums=(2,))  # (self, x, train)

        x = x.astype(self.dtype)
        x = Conv21D(channels[0], (3, 7, 7), (1, 2, 2), mid_channels=45,
                    dtype=self.dtype, name="init")(x, train)
        # stem BN uses frozen running stats even in training
        # (reference r21d.py:183 use_global_stats=True)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, momentum=0.9,
                         dtype=self.dtype, name="init_bn")(x)
        x = nn.relu(x)

        in_c = channels[0]
        for i, num_blocks in enumerate(layers):
            stride = 1 if i == 0 else 2
            c = channels[i + 1]
            x = block(c, stride, downsample=(c != in_c or stride != 1),
                      dtype=self.dtype, name=f"stage{i + 1}_block1")(x, train)
            for j in range(num_blocks - 1):
                x = block(c, 1, False, dtype=self.dtype,
                          name=f"stage{i + 1}_block{j + 2}")(x, train)
            in_c = c

        return jnp.mean(x, axis=(1, 2, 3)).astype(jnp.float32)  # global pool


class R21DClassifier(nn.Module):
    """R21D backbone + Dense + softmax head (the reference's full forward
    returns (features, avg, softmax); r21d.py:195-208)."""

    backbone: R21D
    num_classes: int = 400
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        avg = self.backbone(x, train=train)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="dense")(
            avg.astype(self.dtype)
        )
        return avg, nn.softmax(logits.astype(jnp.float32), axis=-1)


def get_r21d(num_layers: int = 34, n_classes: int = 400, t: int = 8,
             dtype=jnp.bfloat16, remat: bool = False):
    """Constructor mirroring reference r21d.py:212-253 (weights load separately
    via models/convert.py when a converted checkpoint is available)."""
    assert num_layers in R21D_SPECS, f"layers must be one of {list(R21D_SPECS)}"
    assert t in (8, 32), "reference supports t in {8, 32} (r21d.py:221)"
    return R21D(num_layers=num_layers, num_classes=n_classes, dtype=dtype,
                remat=remat)
