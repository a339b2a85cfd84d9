"""Pallas TPU kernels for the framework's hot ops."""

from tennis_tpu.ops.pallas.dense_block import (
    densenet_features_pallas,
    frame_model_apply_pallas,
)
from tennis_tpu.ops.pallas.gru import gru_sequence_pallas

__all__ = [
    "densenet_features_pallas",
    "frame_model_apply_pallas",
    "gru_sequence_pallas",
]
