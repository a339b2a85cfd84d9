"""Backbone registry, keyed by the reference's gluoncv model names
(``--backbone`` flag values: 'resnet18_v2', 'DenseNet121', ...; reference
train.py:31-32,204, train_gnmt.py:106-107,150)."""
from __future__ import annotations

import jax.numpy as jnp

from tennis_tpu.models.backbones.densenet import DenseNet, DENSENET_SPECS
from tennis_tpu.models.backbones.resnet import ResNetV2, RESNET_SPECS

__all__ = ["get_backbone", "backbone_feature_dim", "DenseNet", "ResNetV2"]


def _normalize(name: str) -> str:
    return name.lower().replace("-", "").replace("_", "")


def get_backbone(name: str, in_channels: int = 3, dtype=jnp.bfloat16,
                 remat: str | None = None):
    """Build a feature-extractor backbone module by gluoncv-style name.

    ``remat`` (DenseNet only): "block" checkpoints each dense block — see
    DenseNet.remat. Cuts training activation memory to fit larger batches.
    """
    key = _normalize(name)
    if key.startswith("densenet"):
        depth = int(key[len("densenet"):])
        return DenseNet(spec=DENSENET_SPECS[depth], dtype=dtype, remat=remat)
    if remat is not None:
        raise ValueError(f"remat is only supported for DenseNet, got {name!r}")
    if key.startswith("resnet") and key.endswith("v2"):
        depth = int(key[len("resnet"):-2])
        return ResNetV2(spec=RESNET_SPECS[depth], dtype=dtype)
    raise ValueError(
        f"unknown backbone {name!r}; supported: densenet121/161/169/201, "
        f"resnet18_v2/34_v2/50_v2/101_v2/152_v2"
    )


def backbone_feature_dim(name: str, data_shape: int = 512) -> int:
    """Flattened feature dimension for a square input of side ``data_shape``.

    DenseNet mirrors gluon's fixed AvgPool2D(7) head, so the dim grows with input size
    (512² → 4096 for DenseNet121 — the reference's feature-dump width); ResNet-v2 uses
    global pooling, so the dim is constant.
    """
    key = _normalize(name)
    if key.startswith("densenet"):
        spec = DENSENET_SPECS[int(key[len("densenet"):])]
        final_c = spec.final_channels
        side = data_shape // 32 // 7
        return final_c * max(side, 1) ** 2
    if key.startswith("resnet") and key.endswith("v2"):
        return RESNET_SPECS[int(key[len("resnet"):-2])].final_channels
    if key == "rdnet":  # R(2+1)D-34 pooled features
        return 512
    raise ValueError(f"unknown backbone {name!r}")
