"""Model zoo: backbones, frame/temporal event classifiers, captioner, embeddings."""

from tennis_tpu.models.backbones import get_backbone, backbone_feature_dim
from tennis_tpu.models.frame import (
    FrameModel,
    TemporalPooling,
    CNNRNN,
    TwoStreamModel,
    TimeDistributed,
    Debug,
)

__all__ = [
    "get_backbone",
    "backbone_feature_dim",
    "FrameModel",
    "TemporalPooling",
    "CNNRNN",
    "TwoStreamModel",
    "TimeDistributed",
    "Debug",
]
